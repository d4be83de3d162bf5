"""Similarity search over the ``embeddings`` table (vec_id, embedding, label).

All four operators are distributed — NOTHING materialises the embeddings
table on the driver:

* ``ann_topk`` — brute-force cosine top-k for a deterministic query set
  (the Q lowest vec_ids, fetched via a distributed ``sort + limit``):
  the tiny query matrix is broadcast once with ``ray.put`` and every
  batch does one numpy matmul against it; batches pre-select their
  local top-k (combiner) before the per-query ``groupby`` final
  ranking. Oracle: DuckDB ``list_cosine_similarity``.
* ``ann_neardup`` — all pairs above a cosine threshold. Exact all-pairs
  is inherently quadratic; it runs as a BLOCKED cross product: the
  matrix is chunked into the object store (one ``ray.put`` per chunk,
  streamed — the driver holds one batch + the ref list, never the
  table), and every batch task scans the chunks (node-cached by the
  object store). The sub-quadratic scale path is the LSH bucketing of
  ``ann_lsh_topk``. Oracle: cross-join SQL.
* ``ann_knn_label`` — majority label of the 10 nearest neighbours
  (excluding self), ties -> smaller label; same blocked-chunk scan with
  a per-chunk top-k combiner (vectorised, no per-row Python loop).
  Oracle: SQL window over the cross join.
* ``ann_lsh_topk`` — the scale path, now real stages: a signature
  ``map_batches`` tags every vector with its random-hyperplane bucket,
  vectors sharing a bucket with a query are ``groupby(bucket)``-ed and
  brute-forced per group. Approximate (rows-only; pytest checks recall).
* ``ann_ivf_topk`` — the second scale path: deterministic k-means
  coarse centroids (driver-side over a distributed mod-sample), probe
  the ``nprobe`` nearest lists per query. Probe-all mode (the default
  under the gate) is exactly brute force and shares ``ann_topk``'s
  oracle; ``ivf_build`` persists a list-partitioned parquet index so
  non-probed lists are never read (file-level pruning at scale).

Similarities are computed in float64 and ROUNDED to 6 digits BEFORE
ranking on both sides, so tie-breaks (`vec_id` asc) are identical.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset

N_QUERIES = 5
TOP_K = 10
NEARDUP_TAU = 0.4
LSH_BITS = 8
CHUNK_ROWS = 8192  # blocked-scan chunk size (bounded object-store slabs)
# dual-plan gate (the triangle_count pattern): at or below this row count
# the EXACT blocked-scan plans run (they are the correctness oracle and
# O(N^2) — fine at sf scale); beyond it neardup/knn route through the
# multi-table LSH bucket stages below, which shuffle each vector R times
# and brute-force only within buckets. test_round2-style plan-equality
# pytest covers a threshold-crossing margin-constructed set.
EXACT_SCAN_MAX_ROWS = 50_000
LSH_TABLES = 4  # independent hyperplane tables (recall booster)
VOTE_SHUFFLE_BUCKETS = 64  # bounded groups for the vectorised kNN vote


def _read_emb(sf_dir: str) -> Dataset:
    from ..util import read_parquet_clean

    return read_parquet_clean(os.path.join(sf_dir, "embeddings.parquet"))


def _norm_rows(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """Batch -> (int64 vec_ids, L2-normalised float64 matrix). Vectorised:
    the list column is flattened once and reshaped (fixed embedding dim)."""
    vid = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    col = t["embedding"].combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    m = flat.reshape(len(vid), -1)
    return vid, m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)


def _query_set(sf_dir: str):
    """(q_ids, q_mat): the N_QUERIES lowest vec_ids, via distributed
    sort+limit — only Q rows ever reach the driver."""
    rows = _read_emb(sf_dir).sort("vec_id").limit(N_QUERIES).take_all()
    q_ids = np.array([int(r["vec_id"]) for r in rows], dtype=np.int64)
    m = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    return q_ids, m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)


def _chunk_refs(sf_dir: str) -> list:
    """Normalised-matrix chunks pinned in the object store.

    Built by STREAMING batches through the driver (`iter_batches`):
    driver memory is bounded by one chunk; the full matrix lives only as
    object-store slabs that worker tasks read zero-copy (and the store
    caches per node / spills under pressure).
    """
    import ray

    refs = []
    ds = _read_emb(sf_dir)
    for t in ds.iter_batches(batch_size=CHUNK_ROWS, batch_format="pyarrow"):
        vid, m = _norm_rows(t)
        lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        refs.append(ray.put((vid, m, lab)))
    return refs


_EMPTY_SIMS = pa.schema(
    [("query_id", pa.int64()), ("vec_id", pa.int64()), ("sim", pa.float64())]
)


def q_ann_topk(sf_dir: str) -> pa.Table:
    import ray

    q_ids, q_mat = _query_set(sf_dir)
    ref = ray.put((q_ids, q_mat))

    def sims(t: pa.Table) -> pa.Table:
        qi, qm = ray.get(ref)
        vid, m = _norm_rows(t)
        s = np.round(m @ qm.T, 6)  # (batch, Q) — rounded BEFORE ranking
        out_q, out_v, out_s = [], [], []
        for j in range(len(qi)):
            col = s[:, j]
            take = min(TOP_K, len(col))
            idx = np.lexsort((vid, -col))[:take]  # local top-k combiner
            out_q.append(np.full(take, qi[j], np.int64))
            out_v.append(vid[idx])
            out_s.append(col[idx])
        if not out_q:
            return _EMPTY_SIMS.empty_table()
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "vec_id": pa.array(np.concatenate(out_v)),
                "sim": pa.array(np.concatenate(out_s)),
            }
        )

    partial = _read_emb(sf_dir).map_batches(sims, batch_format="pyarrow")

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True]).head(TOP_K)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "vec_id", "rank", "sim"]]

    out = partial.groupby("query_id").map_groups(
        final_topk, batch_format="pandas"
    ).to_pandas()
    return pa.Table.from_pandas(
        out.astype({"query_id": "int64", "vec_id": "int64", "rank": "int64"}),
        preserve_index=False,
    )


SQL_ANN_TOPK = f"""
WITH q AS MATERIALIZED (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings ORDER BY vec_id LIMIT {N_QUERIES}),
sims AS MATERIALIZED (
  SELECT q.query_id, e.vec_id,
         ROUND(list_cosine_similarity(q.qv, CAST(e.embedding AS DOUBLE[])), 6) AS sim
  FROM q CROSS JOIN embeddings e),
ranked AS (
  SELECT query_id, vec_id, sim,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id ASC) AS rank
  FROM sims)
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(vec_id AS BIGINT) AS vec_id,
       CAST(rank AS BIGINT) AS rank, sim
FROM ranked WHERE rank <= {TOP_K}
"""


def q_ann_neardup(sf_dir: str, plan: str | None = None) -> pa.Table:
    """Near-duplicate pairs above NEARDUP_TAU.

    Dual plan (gated on row count, ``plan`` forces one for tests): the
    EXACT blocked chunk scan below — O(N²) work, every batch scans all
    chunks — is the small-scale/oracle mode; beyond EXACT_SCAN_MAX_ROWS
    the LSH-bucketed plan (_neardup_lsh) is the default, turning the
    cross product into per-bucket brute force."""
    import ray

    if plan is None:
        plan = ("exact" if _read_emb(sf_dir).count() <= EXACT_SCAN_MAX_ROWS
                else "lsh")
    if plan == "lsh":
        return _neardup_lsh(sf_dir)

    refs = _chunk_refs(sf_dir)

    def pairs(t: pa.Table) -> pa.Table:
        vid, m = _norm_rows(t)
        rows_a, rows_b, rows_s = [], [], []
        for ref in refs:
            aid, am, _ = ray.get(ref)
            s = np.round(m @ am.T, 6)
            mask = (s >= NEARDUP_TAU) & (aid[None, :] > vid[:, None])
            i, j = np.nonzero(mask)
            rows_a.append(vid[i])
            rows_b.append(aid[j])
            rows_s.append(s[i, j])
        a = np.concatenate(rows_a) if rows_a else np.empty(0, np.int64)
        return pa.table(
            {
                "vec_a": pa.array(a, pa.int64()),
                "vec_b": pa.array(
                    np.concatenate(rows_b) if rows_b else np.empty(0, np.int64),
                    pa.int64()),
                "sim": pa.array(
                    np.concatenate(rows_s) if rows_s else np.empty(0, np.float64),
                    pa.float64()),
            }
        )

    out = _read_emb(sf_dir).map_batches(pairs, batch_format="pyarrow").to_pandas()
    out = out.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


SQL_ANN_NEARDUP = f"""
SELECT CAST(a.vec_id AS BIGINT) AS vec_a, CAST(b.vec_id AS BIGINT) AS vec_b,
       ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])), 6) AS sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                   CAST(b.embedding AS DOUBLE[])), 6) >= {NEARDUP_TAU}
"""


def q_ann_knn_label(sf_dir: str, plan: str | None = None) -> pa.Table:
    """10-NN majority label. Dual plan like q_ann_neardup: the exact
    blocked chunk scan (per-chunk top-k combiner, fully vectorised merge
    + vote) under the gate; the LSH candidate plan (_knn_label_lsh)
    beyond it."""
    import ray

    if plan is None:
        plan = ("exact" if _read_emb(sf_dir).count() <= EXACT_SCAN_MAX_ROWS
                else "lsh")
    if plan == "lsh":
        return _knn_label_lsh(sf_dir)

    refs = _chunk_refs(sf_dir)

    def vote(t: pa.Table) -> pa.Table:
        vid, m = _norm_rows(t)
        b = len(vid)
        cs, ci, cl = [], [], []
        for ref in refs:
            aid, am, lab = ray.get(ref)
            # exact per-chunk (sim desc, vec_id asc) top-k: sims are
            # rounded to 6 digits so k-th-place TIES are common, and
            # argpartition keeps an arbitrary tied subset — a tied
            # smaller-id candidate dropped here could never be recovered
            # by the exact merge below. Sort candidates by id once
            # (1-D), then a stable row-wise argsort on -sim yields the
            # exact order; take the first k columns.
            o_id = np.argsort(aid, kind="stable")
            aid_s, lab_s = aid[o_id], lab[o_id]
            s = np.round(m @ am[o_id].T, 6)
            s[aid_s[None, :] == vid[:, None]] = -np.inf  # exclude self
            k = min(TOP_K, s.shape[1])
            order = np.argsort(-s, axis=1, kind="stable")[:, :k]
            cs.append(np.take_along_axis(s, order, axis=1))
            ci.append(aid_s[order])
            cl.append(lab_s[order])
        S = np.concatenate(cs, axis=1)
        I = np.concatenate(ci, axis=1)
        L = np.concatenate(cl, axis=1)
        # exact (sim desc, vec_id asc) order: stable argsort by id, then by -sim
        o1 = np.argsort(I, axis=1, kind="stable")
        S, I, L = (np.take_along_axis(x, o1, axis=1) for x in (S, I, L))
        o2 = np.argsort(-S, axis=1, kind="stable")
        S = np.take_along_axis(S, o2, axis=1)[:, :TOP_K]
        L = np.take_along_axis(L, o2, axis=1)[:, :TOP_K]
        # when the corpus has fewer than TOP_K candidates, -inf self-masked
        # slots survive the cut — they are NOT votes (the SQL twin joins on
        # vec_id <> vec_id and never sees them); the LSH plan already
        # filters non-finite sims the same way
        fin = np.isfinite(S)
        nlab = int(L[fin].max()) + 1 if fin.any() else 1
        counts = np.zeros((b, nlab), dtype=np.int64)
        rows = np.repeat(np.arange(b), L.shape[1])[fin.ravel()]
        np.add.at(counts, (rows, L.ravel()[fin.ravel()]), 1)
        preds = counts.argmax(axis=1)  # first max = smallest label (tie-break)
        keep = fin.any(axis=1)  # a candidate-less vector casts no vote row
        return pa.table({"vec_id": pa.array(vid[keep]),
                         "pred_label": pa.array(preds[keep])})

    out = _read_emb(sf_dir).map_batches(vote, batch_format="pyarrow").to_pandas()
    if len(out) == 0:  # every vector candidate-less: typed empty result
        return pa.table({"vec_id": pa.array([], pa.int64()),
                         "pred_label": pa.array([], pa.int64())})
    return pa.Table.from_pandas(out.sort_values("vec_id").reset_index(drop=True),
                                preserve_index=False)


SQL_ANN_KNN_LABEL = f"""
WITH sims AS MATERIALIZED (
  SELECT a.vec_id AS va, b.vec_id AS vb, b.label AS lb,
         ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                      CAST(b.embedding AS DOUBLE[])), 6) AS sim
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id),
ranked AS (
  SELECT va, lb, ROW_NUMBER() OVER (PARTITION BY va ORDER BY sim DESC, vb ASC) AS rn
  FROM sims),
votes AS (
  SELECT va, lb, COUNT(*) AS c FROM ranked WHERE rn <= {TOP_K} GROUP BY va, lb),
winner AS (
  SELECT va, lb, ROW_NUMBER() OVER (PARTITION BY va ORDER BY c DESC, lb ASC) AS rn
  FROM votes)
SELECT CAST(va AS BIGINT) AS vec_id, CAST(lb AS BIGINT) AS pred_label
FROM winner WHERE rn = 1
"""


def _lsh_planes(dim: int, table: int = 0) -> np.ndarray:
    rng = np.random.default_rng(23 + 1000 * table)
    return rng.standard_normal((dim, LSH_BITS))


# ---------------------------------------------------------------------------
# LSH-bucketed scale plans for neardup / knn (the 100-TB path)
# ---------------------------------------------------------------------------

def _tag_tables(sf_dir: str, with_label: bool):
    """Every vector tagged with its bucket in each of LSH_TABLES
    independent hyperplane tables: one row per (table, vector). The
    shuffle that follows groups by the combined (table, bucket) key, so
    each brute-force group holds one bucket of one table."""
    first = next(iter(
        _read_emb(sf_dir).limit(1).iter_batches(batch_format="pyarrow")))
    dim = len(first["embedding"][0])
    planes = [_lsh_planes(dim, t) for t in range(LSH_TABLES)]

    def tag(t: pa.Table) -> pa.Table:
        vid, m = _norm_rows(t)
        outs = []
        emb = t["embedding"].combine_chunks()
        lab = (t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
               if with_label else None)
        for ti, pl in enumerate(planes):
            b = _bucket_of(m, pl)
            cols = {
                "gkey": pa.array(ti * (1 << LSH_BITS) + b, pa.int64()),
                "vec_id": pa.array(vid, pa.int64()),
                "embedding": emb,
            }
            if lab is not None:
                cols["label"] = pa.array(lab, pa.int64())
            outs.append(pa.table(cols))
        return pa.concat_tables(outs)

    return _read_emb(sf_dir).map_batches(tag, batch_format="pyarrow")


def _neardup_lsh(sf_dir: str) -> pa.Table:
    """Near-dup pairs via per-bucket brute force in LSH_TABLES tables,
    deduped across tables with one (vec_a, vec_b) groupby. Work is
    Σ bucket² per table instead of N²; a pathologically hot bucket
    (everything near-identical) degrades toward all-pairs — the
    documented LSH limit, mitigated by raising LSH_BITS at scale."""
    from ray.data.aggregate import Min

    tagged = _tag_tables(sf_dir, with_label=False)

    def pairs_in_bucket(t: pa.Table) -> pa.Table:
        vid, m = _norm_rows(t)
        s = np.round(m @ m.T, 6)
        mask = (s >= NEARDUP_TAU) & (vid[None, :] > vid[:, None])
        i, j = np.nonzero(mask)
        return pa.table({
            "vec_a": pa.array(vid[i], pa.int64()),
            "vec_b": pa.array(vid[j], pa.int64()),
            "sim": pa.array(s[i, j], pa.float64()),
        })

    pairs = tagged.groupby("gkey").map_groups(pairs_in_bucket,
                                              batch_format="pyarrow")
    # a pair found in k tables appears k times with identical sim
    out = pairs.groupby(["vec_a", "vec_b"]).aggregate(
        Min(on="sim", alias_name="sim")
    ).to_pandas()
    out = out.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)
    return pa.Table.from_pandas(out[["vec_a", "vec_b", "sim"]],
                                preserve_index=False)


def _knn_label_lsh(sf_dir: str) -> pa.Table:
    """kNN-vote via LSH candidates: per-bucket exact top-k partials, then
    a per-vector merge that dedups candidates across tables, re-ranks
    with the exact (sim desc, id asc) order and votes (max count, ties
    -> smaller label). A vector sees only same-bucket candidates — the
    approximation the gate documents."""
    tagged = _tag_tables(sf_dir, with_label=True)

    def topk_in_bucket(t: pa.Table) -> pa.Table:
        vid, m = _norm_rows(t)
        lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        o_id = np.argsort(vid, kind="stable")
        vid_s, lab_s = vid[o_id], lab[o_id]
        s = np.round(m @ m[o_id].T, 6)
        s[vid_s[None, :] == vid[:, None]] = -np.inf  # exclude self
        k = min(TOP_K, s.shape[1])
        order = np.argsort(-s, axis=1, kind="stable")[:, :k]
        sim = np.take_along_axis(s, order, axis=1).ravel()
        keep = np.isfinite(sim)
        return pa.table({
            "vec_id": pa.array(np.repeat(vid, k)[keep], pa.int64()),
            "cand": pa.array(vid_s[order].ravel()[keep], pa.int64()),
            "clab": pa.array(lab_s[order].ravel()[keep], pa.int64()),
            "sim": pa.array(sim[keep], pa.float64()),
        })

    partial = tagged.groupby("gkey").map_groups(topk_in_bucket,
                                                batch_format="pyarrow")

    def add_vbucket(t: pa.Table) -> pa.Table:
        vb = (t["vec_id"].to_numpy(zero_copy_only=False)
              % VOTE_SHUFFLE_BUCKETS).astype(np.int64)
        return t.append_column("vbucket", pa.array(vb))

    def vote_bucket(t: pa.Table) -> pa.Table:
        """Vectorised vote over EVERY vector in this shuffle bucket at
        once (the exact path's np-kernel style — the former per-vector
        pandas map_groups ran one Python call per vector):
        dedup (vec, cand) across tables -> exact (sim desc, cand asc)
        top-k per vec via one lexsort + grouped rank -> per-(vec, label)
        counts -> winner = max count, ties -> smaller label."""
        vec = t["vec_id"].to_numpy(zero_copy_only=False)
        cand = t["cand"].to_numpy(zero_copy_only=False)
        clab = t["clab"].to_numpy(zero_copy_only=False)
        sim = t["sim"].to_numpy(zero_copy_only=False)
        n = len(vec)
        if n == 0:
            return pa.schema([("vec_id", pa.int64()),
                              ("pred_label", pa.int64())]).empty_table()
        # 1. dedup candidates seen in several tables (identical sim/lab)
        o = np.lexsort((cand, vec))
        vec, cand, clab, sim = vec[o], cand[o], clab[o], sim[o]
        new = np.ones(n, dtype=bool)
        new[1:] = (vec[1:] != vec[:-1]) | (cand[1:] != cand[:-1])
        vec, cand, clab, sim = vec[new], cand[new], clab[new], sim[new]
        n = len(vec)
        # 2. exact (sim desc, cand asc) order within each vec
        o2 = np.lexsort((cand, -sim, vec))
        vec, clab = vec[o2], clab[o2]
        # 3. grouped rank -> top-k per vec
        idx = np.arange(n)
        first = np.ones(n, dtype=bool)
        first[1:] = vec[1:] != vec[:-1]
        rank = idx - np.maximum.accumulate(np.where(first, idx, 0))
        vec, clab = vec[rank < TOP_K], clab[rank < TOP_K]
        # 4. counts per (vec, label)
        n2 = len(vec)
        o3 = np.lexsort((clab, vec))
        vec, clab = vec[o3], clab[o3]
        newp = np.ones(n2, dtype=bool)
        newp[1:] = (vec[1:] != vec[:-1]) | (clab[1:] != clab[:-1])
        starts = np.flatnonzero(newp)
        cnt = np.diff(np.append(starts, n2))
        uv, ul = vec[starts], clab[starts]
        # 5. winner: max count, tie -> smaller label (label asc is the
        # lexsort tiebreak under equal -cnt)
        o4 = np.lexsort((ul, -cnt, uv))
        uv, ul = uv[o4], ul[o4]
        win = np.ones(len(uv), dtype=bool)
        win[1:] = uv[1:] != uv[:-1]
        return pa.table({"vec_id": pa.array(uv[win].astype(np.int64)),
                         "pred_label": pa.array(ul[win].astype(np.int64))})

    out = partial.map_batches(add_vbucket, batch_format="pyarrow").groupby(
        "vbucket").map_groups(vote_bucket, batch_format="pyarrow").to_pandas()
    return pa.Table.from_pandas(
        out.sort_values("vec_id").reset_index(drop=True).astype(
            {"vec_id": "int64", "pred_label": "int64"}),
        preserve_index=False)


def _bucket_of(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    sig = (m @ planes > 0).astype(np.uint8)
    return np.packbits(sig, axis=1, bitorder="little")[:, 0].astype(np.int64)


def q_ann_lsh_topk(sf_dir: str) -> pa.Table:
    """Approximate top-k via random-hyperplane LSH buckets — the 100-TB
    scale path, as real distributed stages:

      signature map_batches (vec_id, bucket, embedding)
        -> filter to buckets any query hashes to
        -> groupby('bucket').map_groups(per-bucket brute force)

    Each bucket holds a bounded slice of the corpus; queries join only
    their own buckets. Rows-only (approximation quality is
    data-dependent; pytest checks recall against brute force).
    """
    import ray

    q_ids, q_mat = _query_set(sf_dir)
    planes = _lsh_planes(q_mat.shape[1])
    q_buckets = _bucket_of(q_mat, planes)
    ref = ray.put((q_ids, q_mat, q_buckets))
    wanted = sorted(set(int(b) for b in q_buckets))

    def tag(t: pa.Table) -> pa.Table:
        vid, m = _norm_rows(t)
        b = _bucket_of(m, planes)
        keep = np.isin(b, wanted)
        return pa.table(
            {
                "vec_id": pa.array(vid[keep], pa.int64()),
                "bucket": pa.array(b[keep], pa.int64()),
                "embedding": t["embedding"].combine_chunks().filter(pa.array(keep)),
            }
        )

    tagged = _read_emb(sf_dir).map_batches(tag, batch_format="pyarrow")

    def topk_in_bucket(t: pa.Table) -> pa.Table:
        qi, qm, qb = ray.get(ref)
        bucket = int(t["bucket"][0].as_py())
        cand_ids, cand = _norm_rows(t)
        out_q, out_v, out_s = [], [], []
        for j in np.flatnonzero(qb == bucket):
            s = np.round(cand @ qm[j], 6)
            take = min(TOP_K, len(s))
            idx = np.lexsort((cand_ids, -s))[:take]
            out_q.append(np.full(take, qi[j], np.int64))
            out_v.append(cand_ids[idx])
            out_s.append(s[idx])
        if not out_q:
            return _EMPTY_SIMS.empty_table()
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "vec_id": pa.array(np.concatenate(out_v)),
                "sim": pa.array(np.concatenate(out_s)),
            }
        )

    out = tagged.groupby("bucket").map_groups(
        topk_in_bucket, batch_format="pyarrow"
    ).to_pandas()
    out = out.sort_values(
        ["query_id", "sim", "vec_id"], ascending=[True, False, True]
    ).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


EMB_DIM = 64  # testdata embedding dimension (asserted by the oracle match)


def _lsh_sql() -> str:
    """SQL twin of q_ann_lsh_topk: the random hyperplanes are embedded as
    float constants (repr round-trips float64 exactly), the bucket is the
    little-endian packed sign byte, and per-bucket brute force mirrors
    the per-group ranking. Sign flips require |dot| within float rounding
    of zero — vanishingly unlikely for gaussian planes."""
    planes = _lsh_planes(EMB_DIM)
    bits = []
    for j in range(LSH_BITS):
        vec = ", ".join(repr(float(planes[i][j])) for i in range(EMB_DIM))
        bits.append(
            f"(CASE WHEN list_inner_product(CAST(embedding AS DOUBLE[]),"
            f" [{vec}]) > 0 THEN {1 << j} ELSE 0 END)"
        )
    bucket = " + ".join(bits)
    return f"""
WITH b AS MATERIALIZED (
  SELECT vec_id, embedding, {bucket} AS bucket FROM embeddings),
q AS MATERIALIZED (
  SELECT vec_id AS query_id, embedding AS qe, bucket AS qb
  FROM b ORDER BY vec_id LIMIT {N_QUERIES}),
cand AS MATERIALIZED (
  SELECT q.query_id, e.vec_id,
         ROUND(list_cosine_similarity(CAST(q.qe AS DOUBLE[]),
                                      CAST(e.embedding AS DOUBLE[])), 6) AS sim
  FROM q JOIN b e ON e.bucket = q.qb),
ranked AS (
  SELECT query_id, vec_id, sim,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, vec_id ASC) AS rn
  FROM cand)
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(vec_id AS BIGINT) AS vec_id,
       sim
FROM ranked WHERE rn <= {TOP_K}
"""


SQL_ANN_LSH_TOPK = _lsh_sql()


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the second scale path next to LSH
# ---------------------------------------------------------------------------

IVF_NLIST = 16      # coarse centroids (lists)
IVF_NPROBE = 4      # lists probed per query in approximate mode
IVF_SAMPLE = 4096   # training-sample cap (driver-side k-means input)
IVF_KMEANS_ITERS = 10


def ivf_train(sf_dir: str, nlist: int = IVF_NLIST) -> np.ndarray:
    """Deterministic coarse centroids: a distributed mod-sample (at most
    ~IVF_SAMPLE rows reach the driver, picked by ``vec_id % m == 0`` so
    the sample is reproducible), then seeded k-means++ / Lloyd in numpy.
    Centroids are a tiny (nlist, dim) matrix — broadcast, never joined."""
    ds = _read_emb(sf_dir)
    n = ds.count()
    m = max(1, n // IVF_SAMPLE)

    def pick(t: pa.Table) -> pa.Table:
        vid = t["vec_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(vid % m == 0))

    sample = ds.map_batches(pick, batch_format="pyarrow").take_all()
    X = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in sample])
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-30)
    rng = np.random.default_rng(97)
    # k-means++ seeding
    cent = [X[int(rng.integers(len(X)))]]
    for _ in range(1, min(nlist, len(X))):
        d2 = np.min(
            [np.sum((X - c) ** 2, axis=1) for c in cent], axis=0)
        tot = d2.sum()
        if tot <= 0.0:
            # every remaining sample coincides with a chosen centroid
            # (degenerate corpus: fewer distinct points than nlist) —
            # a p= of all zeros would raise in rng.choice; stop seeding
            # with the centroids found so far
            break
        cent.append(X[int(rng.choice(len(X), p=d2 / tot))])
    C = np.stack(cent)
    for _ in range(IVF_KMEANS_ITERS):
        assign = np.argmax(X @ C.T, axis=1)  # cosine on unit vectors
        for j in range(len(C)):
            mask = assign == j
            if mask.any():
                v = X[mask].mean(axis=0)
                C[j] = v / max(np.linalg.norm(v), 1e-30)
    return C


def ivf_build(sf_dir: str, index_dir: str, nlist: int = IVF_NLIST) -> np.ndarray:
    """Persist the IVF index: embeddings written as parquet PARTITIONED BY
    list id (one directory per inverted list), centroids alongside as
    ``centroids.npy``. At scale this is what turns nprobe into an I/O
    win — a query reads only its probed lists' files, the other
    (nlist - nprobe)/nlist of the corpus never leaves storage. Resumable
    output: one directory per list."""
    import ray

    C = ivf_train(sf_dir, nlist)
    cref = ray.put(C)

    def assign(t: pa.Table) -> pa.Table:
        vid, m = _norm_rows(t)
        lid = np.argmax(m @ ray.get(cref).T, axis=1).astype(np.int64)
        return pa.table({
            "vec_id": pa.array(vid, pa.int64()),
            "embedding": t["embedding"].combine_chunks(),
            "list_id": pa.array(lid, pa.int64()),
        })

    (_read_emb(sf_dir)
     .map_batches(assign, batch_format="pyarrow")
     .write_parquet(index_dir, partition_cols=["list_id"]))
    np.save(os.path.join(index_dir, "centroids.npy"), C)
    return C


def q_ann_ivf_topk(sf_dir: str, nprobe: int | None = None,
                   index_dir: str | None = None) -> pa.Table:
    """Top-k via IVF probing — the dual-plan pattern once more:

    * ``nprobe = nlist`` (the default at or below EXACT_SCAN_MAX_ROWS
      rows): every list is probed, so the result IS the brute-force
      top-k — bit-identical to ``ann_topk`` (same rounding and
      (sim desc, id asc) tie-break) and oracle-checked against the same
      SQL.
    * ``nprobe < nlist`` (the default beyond the gate): only the nprobe
      lists whose centroids are nearest each query are scanned —
      sub-linear candidate volume; with a built ``index_dir`` the
      non-probed lists are never read at all (file-level pruning).

    Without ``index_dir`` the assignment runs inline in the same
    map_batches that scores candidates: one broadcast centroid matmul
    per batch, no extra pass and no shuffle."""
    import ray

    if index_dir and os.path.exists(os.path.join(index_dir, "centroids.npy")):
        C = np.load(os.path.join(index_dir, "centroids.npy"))
    else:
        index_dir = None
        C = ivf_train(sf_dir)
    if nprobe is None:
        n = _read_emb(sf_dir).count()
        nprobe = len(C) if n <= EXACT_SCAN_MAX_ROWS else IVF_NPROBE
    nprobe = min(nprobe, len(C))

    q_ids, q_mat = _query_set(sf_dir)
    # per-query probed lists: nprobe nearest centroids
    order = np.argsort(-(q_mat @ C.T), axis=1, kind="stable")[:, :nprobe]
    wanted = sorted({int(l) for l in order.ravel()})
    ref = ray.put((q_ids, q_mat, order, C))

    def sims(t: pa.Table) -> pa.Table:
        qi, qm, probes, cent = ray.get(ref)
        vid, m = _norm_rows(t)
        if "list_id" in t.column_names:  # built index: list is on disk
            lid = t["list_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        else:
            lid = np.argmax(m @ cent.T, axis=1).astype(np.int64)
        out_q, out_v, out_s = [], [], []
        for j in range(len(qi)):
            cand = np.isin(lid, probes[j])
            if not cand.any():
                continue
            cv, cm = vid[cand], m[cand]
            s = np.round(cm @ qm[j], 6)
            take = min(TOP_K, len(s))
            idx = np.lexsort((cv, -s))[:take]  # local top-k combiner
            out_q.append(np.full(take, qi[j], np.int64))
            out_v.append(cv[idx])
            out_s.append(s[idx])
        if not out_q:
            return _EMPTY_SIMS.empty_table()
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q)),
            "vec_id": pa.array(np.concatenate(out_v)),
            "sim": pa.array(np.concatenate(out_s)),
        })

    if index_dir:
        import ray.data as rd

        from ..util import strip_schema_meta

        # file-level pruning: only probed lists' files are read; the
        # partition column isn't surfaced by the file-path read, so
        # sims() recomputes the (deterministic) assignment from the
        # broadcast centroids — same argmax, same lists
        import glob as _glob

        paths = [f
                 for l in wanted
                 for f in sorted(_glob.glob(
                     os.path.join(index_dir, f"list_id={l}", "*.parquet")))]
        ds = strip_schema_meta(rd.read_parquet(paths))
    else:
        ds = _read_emb(sf_dir)
    partial = ds.map_batches(sims, batch_format="pyarrow")

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True]).head(TOP_K)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "vec_id", "rank", "sim"]]

    out = partial.groupby("query_id").map_groups(
        final_topk, batch_format="pandas").to_pandas()
    out = out.sort_values(["query_id", "rank"]).reset_index(drop=True)
    return pa.Table.from_pandas(
        out.astype({"query_id": "int64", "vec_id": "int64", "rank": "int64"}),
        preserve_index=False,
    )


QUERIES = {
    "ann_topk": q_ann_topk,
    "ann_neardup": q_ann_neardup,
    "ann_knn_label": q_ann_knn_label,
    "ann_lsh_topk": q_ann_lsh_topk,
    "ann_ivf_topk": q_ann_ivf_topk,
}

ORACLES = {
    "ann_topk": SQL_ANN_TOPK,
    "ann_neardup": SQL_ANN_NEARDUP,
    "ann_knn_label": SQL_ANN_KNN_LABEL,
    "ann_lsh_topk": SQL_ANN_LSH_TOPK,
    # probe-all IVF is exactly brute-force top-k -> same oracle
    "ann_ivf_topk": SQL_ANN_TOPK,
}
