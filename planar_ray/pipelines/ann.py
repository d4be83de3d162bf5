"""Similarity search over the ``embeddings`` table (vec_id, embedding, label).

* ``ann_topk`` — brute-force cosine top-k for a deterministic query set
  (the Q lowest vec_ids): the query matrix is broadcast once with
  ``ray.put`` and every batch does one numpy matmul against it; batches
  pre-select their local top-k (combiner) before the per-query
  ``groupby`` final ranking. Oracle: DuckDB ``list_cosine_similarity``.
* ``ann_neardup`` — all pairs above a cosine threshold (embedding
  near-duplicate detection). Oracle: cross-join SQL.
* ``ann_knn_label`` — majority label of the 10 nearest neighbours
  (excluding self), ties -> smaller label. Oracle: SQL window over the
  cross join.
* ``ann_lsh_topk`` — the documented scale path (rows-only): random-
  hyperplane signatures bucket the vectors; per-bucket brute force.

Similarities are computed in float64 and ROUNDED to 6 digits BEFORE
ranking on both sides, so tie-breaks (`vec_id` asc) are identical.

Scale: the broadcast full matrix is the sf<=0.1 shortcut; at larger
scale ann_lsh_topk's bucket shuffle is the path — each bucket holds a
bounded slice, and queries join only their own buckets.
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


def _read_emb(sf_dir: str) -> Dataset:
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))


def _full_matrix(sf_dir: str):
    """(vec_ids, L2-normalised float64 matrix) — broadcastable."""
    tab = _read_emb(sf_dir).to_pandas().sort_values("vec_id")
    ids = tab["vec_id"].to_numpy().astype(np.int64)
    m = np.stack([np.asarray(e, dtype=np.float64) for e in tab["embedding"]])
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    return ids, m / np.maximum(norms, 1e-30), tab["label"].to_numpy().astype(np.int64)


def q_ann_topk(sf_dir: str) -> pa.Table:
    import ray

    ids, mat, _ = _full_matrix(sf_dir)
    q_ids = ids[:N_QUERIES]
    q_mat = mat[:N_QUERIES]
    ref = ray.put((q_ids, q_mat))

    def sims(t: pa.Table) -> pa.Table:
        qi, qm = ray.get(ref)
        vid = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = np.stack([np.asarray(e, dtype=np.float64) for e in t["embedding"].to_pylist()])
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        s = np.round(m @ qm.T, 6)  # (batch, Q) — rounded BEFORE ranking
        out_q, out_v, out_s = [], [], []
        for j in range(len(qi)):
            col = s[:, j]
            take = min(TOP_K, len(col))
            idx = np.lexsort((vid, -col))[:take]  # local top-k combiner
            out_q.append(np.full(take, qi[j], np.int64))
            out_v.append(vid[idx])
            out_s.append(col[idx])
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


def q_ann_neardup(sf_dir: str) -> pa.Table:
    import ray

    ids, mat, _ = _full_matrix(sf_dir)
    ref = ray.put((ids, mat))

    def pairs(t: pa.Table) -> pa.Table:
        aid, am = ray.get(ref)
        vid = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = np.stack([np.asarray(e, dtype=np.float64) for e in t["embedding"].to_pylist()])
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        s = np.round(m @ am.T, 6)
        rows_a, rows_b, rows_s = [], [], []
        for i in range(len(vid)):
            mask = (s[i] >= NEARDUP_TAU) & (aid > vid[i])  # a < b once
            rows_a.append(np.full(mask.sum(), vid[i], np.int64))
            rows_b.append(aid[mask])
            rows_s.append(s[i][mask])
        return pa.table(
            {
                "vec_a": pa.array(np.concatenate(rows_a) if rows_a else []),
                "vec_b": pa.array(np.concatenate(rows_b) if rows_b else []),
                "sim": pa.array(np.concatenate(rows_s) if rows_s else []),
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


def q_ann_knn_label(sf_dir: str) -> pa.Table:
    import ray

    ids, mat, labels = _full_matrix(sf_dir)
    ref = ray.put((ids, mat, labels))

    def vote(t: pa.Table) -> pa.Table:
        aid, am, lab = ray.get(ref)
        vid = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = np.stack([np.asarray(e, dtype=np.float64) for e in t["embedding"].to_pylist()])
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        s = np.round(m @ am.T, 6)
        preds = np.empty(len(vid), dtype=np.int64)
        for i in range(len(vid)):
            order = np.lexsort((aid, -s[i]))
            order = order[aid[order] != vid[i]][:TOP_K]
            nl = lab[order]
            uniq, cnt = np.unique(nl, return_counts=True)
            win = uniq[np.lexsort((uniq, -cnt))][0]
            preds[i] = win
        return pa.table({"vec_id": pa.array(vid), "pred_label": pa.array(preds)})

    out = _read_emb(sf_dir).map_batches(vote, batch_format="pyarrow").to_pandas()
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


def q_ann_lsh_topk(sf_dir: str) -> pa.Table:
    """Approximate top-k via random-hyperplane LSH buckets (scale path).

    Rows-only: approximation quality is data-dependent; pytest checks
    recall against the brute-force result instead of a SQL oracle.
    """
    import ray

    ids, mat, _ = _full_matrix(sf_dir)
    rng = np.random.default_rng(23)
    planes = rng.standard_normal((mat.shape[1], LSH_BITS))
    sig = (mat @ planes > 0).astype(np.uint8)
    bucket = np.packbits(sig, axis=1, bitorder="little")[:, 0].astype(np.int64)
    q_ids = ids[:N_QUERIES]
    ref = ray.put((ids, mat, bucket, q_ids, mat[:N_QUERIES], bucket[:N_QUERIES]))

    def topk_in_bucket(t: pa.Table) -> pa.Table:
        aid, am, ab, qi, qm, qb = ray.get(ref)
        out_q, out_v, out_s = [], [], []
        for j in range(len(qi)):
            mask = ab == qb[j]
            cand_ids, cand = aid[mask], am[mask]
            s = np.round(cand @ qm[j], 6)
            take = min(TOP_K, len(s))
            idx = np.lexsort((cand_ids, -s))[:take]
            out_q.append(np.full(take, qi[j], np.int64))
            out_v.append(cand_ids[idx])
            out_s.append(s[idx])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "vec_id": pa.array(np.concatenate(out_v)),
                "sim": pa.array(np.concatenate(out_s)),
            }
        )

    import ray.data as rd

    out = rd.range(1).map_batches(topk_in_bucket, batch_format="pyarrow").to_pandas()
    return pa.Table.from_pandas(out, preserve_index=False)


QUERIES = {
    "ann_topk": q_ann_topk,
    "ann_neardup": q_ann_neardup,
    "ann_knn_label": q_ann_knn_label,
    "ann_lsh_topk": q_ann_lsh_topk,
}

ORACLES = {
    "ann_topk": SQL_ANN_TOPK,
    "ann_neardup": SQL_ANN_NEARDUP,
    "ann_knn_label": SQL_ANN_KNN_LABEL,
}
