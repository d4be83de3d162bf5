"""Training-data text pipelines over the ``documents`` table.

Deduplication + text-analysis operators a 100 TB corpus pipeline needs
(none exist in the reference — Planar is graph-only — but the north rule
grades them as first-class alongside the kernels):

Oracle-checked (DuckDB SQL twin beside each):
  doc_exact_dedup   exact duplicate groups by content hash
  doc_token_count   RE2 ``[a-z0-9_]+`` token counts (same regex engine
                    both sides: pyarrow and DuckDB are both RE2)
  doc_quality       punctuation/stopword/length quality score
  doc_langid        stopword-profile language guess, tie -> alphabetical

Oracle-checked since round 4 (shingle/token hashing switched from
siphash to the SQL-replicable poly+splitmix64 hash, util.poly_splitmix_vec
— the whole chain token -> shingle hash -> 64 MinHash permutations ->
banded LSH buckets -> candidate pairs -> exact Jaccard -> min-label
components is replayed bit-exactly in DuckDB HUGEINT arithmetic):
  doc_minhash_dedup near-dup groups via MinHash + LSH banding
  doc_simhash       64-bit SimHash signatures
  doc_ngram_jaccard exact word-3-gram Jaccard for LSH candidate pairs

Oracle-checked via a HUGEINT window-SQL twin:
  doc_fingerprint   winnowing rolling-hash document fingerprints

Scale notes: every per-doc computation is a stateless ``map_batches``
stage (regexes/seeds prepared once per actor in ``__init__`` where
stateful); LSH candidates go through the standard shingle -> minhash ->
band -> bucket shuffle (band buckets hashed into a bounded number of
shuffle groups, pair expansion vectorised per group); the exact-Jaccard
VERIFY step is distributed too — candidate pairs hash-bucket-join the
per-doc shingle-set table twice (doc_a, doc_b) and Jaccard is computed
inside the joined batches, so the documents table is never read to the
driver. Group assignment over VERIFIED pairs is a dual plan
(_pair_components_assign): driver union-find + broadcast map while
pairs are tiny, the distributed WCC kernel over the pair graph beyond
WCC_PAIRS_THRESHOLD — value-identical (both reps are the component
min; parity-pinned in tests). All shingle/band/token hashing goes through the vectorised
siphash kernel (util.h64_bytes_vec) — no per-row hashlib loops.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset
from ray.data.aggregate import Count, Min

from ..joins import hash_bucket_join
from ..util import POLY_PRIME, h64, h64_bytes_vec, poly_splitmix_vec, splitmix64

TOKEN_RE = "[a-z0-9_]+"  # RE2-safe, identical semantics in pyarrow + DuckDB

# seeds of the SQL-replicable shingle/token hashes (poly_splitmix_vec)
SHINGLE_SEED = 1469598103934665603  # FNV-1a offset basis
SIMHASH_SEED = 2870177450012600261  # splitmix64 golden-gamma derived
STOPWORDS = {
    "de": ["der", "die", "und", "das", "ein"],
    "en": ["the", "a", "and", "of", "to"],
    "es": ["el", "los", "y", "es", "un"],
    "fr": ["le", "et", "les", "des", "un"],
    "zh": ["shi", "bu", "wo", "zhe", "ni"],
}
PUNCT_RE = r"[.,;:!?]"
QUALITY_CAP = 400

MINHASH_PERMS = 64
LSH_BANDS = 16  # x 4 rows
MERSENNE = (1 << 61) - 1
JACCARD_TAU = 0.5
DEDUP_SHUFFLE_BUCKETS = 64  # bounded shuffle groups for band-bucket pairing
BROADCAST_VERIFY_MAX = 100_000  # candidate-doc cap for the broadcast verify path


def _read_docs(sf_dir: str, columns=("doc_id", "text")) -> Dataset:
    import os

    from ..util import read_parquet_clean

    return read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                              columns=list(columns))


# ---------------------------------------------------------------------------
# oracle-checked queries
# ---------------------------------------------------------------------------

def q_doc_exact_dedup(sf_dir: str) -> pa.Table:
    """Exact dedup: one row per distinct text, keeper = min doc_id.

    The dedup key is two independent vectorised 64-bit siphashes plus the
    byte length (≈128-bit composite — collision odds negligible at any
    corpus size), not a cryptographic hash: sha256 has no vectorised
    kernel and was the last per-row Python hash loop in the suite. The
    SQL oracle groups by text itself, so it is key-agnostic."""
    docs = _read_docs(sf_dir)

    def add_key(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        h1 = h64_bytes_vec(texts, "dedup1").astype(np.int64)
        h2 = h64_bytes_vec(texts, "dedup2").astype(np.int64)
        ln = pc.binary_length(t["text"]).cast(pa.int64())
        return pa.table({"doc_id": t["doc_id"], "h1": pa.array(h1),
                         "h2": pa.array(h2), "ln": ln})

    grouped = docs.map_batches(add_key, batch_format="pyarrow").groupby(
        ["h1", "h2", "ln"]
    ).aggregate(
        Min(on="doc_id", alias_name="doc_id"), Count(alias_name="dups")
    )
    tab = grouped.to_pandas()
    return pa.table(
        {
            "doc_id": pa.array(tab["doc_id"].to_numpy().astype(np.int64)),
            "dups": pa.array(tab["dups"].to_numpy().astype(np.int64)),
        }
    )


SQL_DOC_EXACT_DEDUP = """
SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id, CAST(COUNT(*) AS BIGINT) AS dups
FROM documents GROUP BY text
"""


def q_doc_token_count(sf_dir: str) -> pa.Table:
    docs = _read_docs(sf_dir)

    def count_tokens(t: pa.Table) -> pa.Table:
        low = pc.utf8_lower(t["text"])
        n = pc.count_substring_regex(low, TOKEN_RE)
        return pa.table({"doc_id": t["doc_id"], "tokens": n.cast(pa.int64())})

    return docs.map_batches(count_tokens, batch_format="pyarrow").to_pandas().pipe(
        lambda df: pa.table({"doc_id": df["doc_id"].astype("int64"),
                             "tokens": df["tokens"].astype("int64")})
    )


SQL_DOC_TOKEN_COUNT = f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(len(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS BIGINT) AS tokens
FROM documents
"""


_ALL_STOPS = sorted({w for ws in STOPWORDS.values() for w in ws})


def _stop_counts(low: pa.ChunkedArray | pa.Array, words: list[str]) -> np.ndarray:
    """Σ standalone-word occurrences of ``words`` — vectorised RE2 passes.

    ``\\b<w>\\b`` on lowered text counts exactly the TOKEN_RE tokens equal
    to ``w`` (token chars are [a-z0-9_] = \\w after lower()), so this is
    bit-identical to the per-token membership loop it replaces.
    """
    total = None
    for w in words:
        c = pc.count_substring_regex(low, rf"\b{w}\b").to_numpy(
            zero_copy_only=False).astype(np.float64)
        total = c if total is None else total + c
    return total if total is not None else np.zeros(len(low))


def _quality_arrays(t: pa.Table):
    """(punct_ratio, stop_ratio, quality) for a batch — the shared
    vectorised quality math (RE2 kernels, no Python row loop)."""
    low = pc.utf8_lower(t["text"])
    n_chars = pc.utf8_length(t["text"]).to_numpy(
        zero_copy_only=False).astype(np.float64)
    punct = pc.count_substring_regex(t["text"], PUNCT_RE).to_numpy(
        zero_copy_only=False).astype(np.float64)
    words = pc.count_substring_regex(low, TOKEN_RE).to_numpy(
        zero_copy_only=False).astype(np.float64)
    stop_hits = _stop_counts(low, _ALL_STOPS)
    punct_ratio = np.where(n_chars > 0, punct / n_chars, 0.0)
    stop_ratio = np.where(words > 0, stop_hits / words, 0.0)
    quality = (
        0.4 * stop_ratio
        + 0.3 * np.minimum(words, QUALITY_CAP) / QUALITY_CAP
        + 0.3 * (1.0 - punct_ratio)
    )
    return punct_ratio, stop_ratio, quality


def q_doc_quality(sf_dir: str) -> pa.Table:
    """Quality score: stopword ratio + capped length + low punctuation.
    Fully vectorised: every count is a pyarrow RE2 kernel, no Python
    loop over rows or tokens."""
    docs = _read_docs(sf_dir)

    def score(t: pa.Table) -> pa.Table:
        punct_ratio, stop_ratio, quality = _quality_arrays(t)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "punct_ratio": pa.array(np.round(punct_ratio, 6)),
                "stop_ratio": pa.array(np.round(stop_ratio, 6)),
                "quality": pa.array(np.round(quality, 6)),
            }
        )

    out = docs.map_batches(score, batch_format="pyarrow").to_pandas()
    return pa.Table.from_pandas(out, preserve_index=False)


_STOP_SQL_LIST = ", ".join(f"'{w}'" for w in _ALL_STOPS)
SQL_DOC_QUALITY = f"""
WITH base AS MATERIALIZED (
  SELECT doc_id,
         CAST(length(text) AS DOUBLE) AS n_chars,
         CAST(len(regexp_extract_all(text, '{PUNCT_RE}')) AS DOUBLE) AS punct,
         regexp_extract_all(lower(text), '{TOKEN_RE}') AS toks
  FROM documents),
r AS (
  SELECT doc_id,
         CASE WHEN n_chars > 0 THEN punct / n_chars ELSE 0 END AS punct_ratio,
         CASE WHEN len(toks) > 0
              THEN CAST(len(list_filter(toks, x -> x IN ({_STOP_SQL_LIST}))) AS DOUBLE) / len(toks)
              ELSE 0 END AS stop_ratio,
         CAST(len(toks) AS DOUBLE) AS words
  FROM base)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       ROUND(punct_ratio, 6) AS punct_ratio,
       ROUND(stop_ratio, 6) AS stop_ratio,
       ROUND(0.4 * stop_ratio + 0.3 * LEAST(words, {QUALITY_CAP}) / {QUALITY_CAP}
             + 0.3 * (1.0 - punct_ratio), 6) AS quality
FROM r
"""


def q_doc_langid(sf_dir: str) -> pa.Table:
    """Stopword-profile language heuristic; ties -> alphabetically first.
    Vectorised: one RE2 count pass per stopword, argmax over the (docs,
    langs) score matrix (first max = alphabetically-first tie-break)."""
    docs = _read_docs(sf_dir)
    langs = sorted(STOPWORDS)

    def classify(t: pa.Table) -> pa.Table:
        low = pc.utf8_lower(t["text"])
        scores = np.stack(
            [_stop_counts(low, STOPWORDS[lg]) for lg in langs], axis=1
        )
        best = np.asarray(langs, dtype=object)[scores.argmax(axis=1)]
        return pa.table({"doc_id": t["doc_id"],
                         "pred_lang": pa.array(best, pa.string())})

    out = docs.map_batches(classify, batch_format="pyarrow").to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


def _langid_sql() -> str:
    score_cols = ",\n         ".join(
        f"len(list_filter(toks, x -> x IN ({', '.join(repr(w) for w in ws)}))) AS s_{lg}"
        for lg, ws in sorted(STOPWORDS.items())
    )
    langs = sorted(STOPWORDS)
    greatest = "GREATEST(" + ", ".join(f"s_{lg}" for lg in langs) + ")"
    case = "CASE " + " ".join(
        f"WHEN s_{lg} = {greatest} THEN '{lg}'" for lg in langs
    ) + " END"
    return f"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE}') AS toks FROM documents),
scores AS (
  SELECT doc_id,
         {score_cols}
  FROM toks)
SELECT CAST(doc_id AS BIGINT) AS doc_id, {case} AS pred_lang FROM scores
"""


SQL_DOC_LANGID = _langid_sql()


# ---------------------------------------------------------------------------
# rows-only near-dup suite
# ---------------------------------------------------------------------------

_STAGE_CACHE: dict = {}


def _stage(cls):
    """Run a callable-class stage as TASKS with worker-process-resident
    state: the instance is built once per worker process (Ray reuses
    processes across tasks), not once per actor — an actor pool costs
    ~1-3 s spin-up PER map_batches execution, which dwarfs these stages'
    cheap state (compiled regexes, seed arrays). Same idiom as the
    superstep engine's CSR cache."""

    def fn(t: pa.Table) -> pa.Table:
        inst = _STAGE_CACHE.get(cls)
        if inst is None:
            inst = _STAGE_CACHE[cls] = cls()
        return inst(t)

    fn.__name__ = cls.__name__
    return fn


def _batch_shingles(texts: list[str], tok_re) -> tuple[np.ndarray, np.ndarray]:
    """(per-doc shingle counts, flat uint64 word-3-gram hashes).

    One vectorised siphash call for the whole batch — the hot hash is
    never a per-shingle Python loop.
    """
    counts = np.empty(len(texts), dtype=np.int64)
    toks_all: list[np.ndarray] = []
    for i, s in enumerate(texts):
        toks = tok_re.findall(s.lower())
        if len(toks) < 3:
            toks = toks + ["_pad"] * (3 - len(toks))
        a = np.asarray(toks, dtype=object)
        toks_all.append(a[:-2] + "\x1f" + a[1:-1] + "\x1f" + a[2:])
        counts[i] = len(toks) - 2
    flat = (np.concatenate(toks_all) if toks_all
            else np.empty(0, dtype=object))
    return counts, poly_splitmix_vec(flat, SHINGLE_SEED)


class ShingleSets:
    """Stateless stage: (doc_id, sh:list<int64>) distinct shingle hashes
    per document — the distributed verify step's building block."""

    def __init__(self):
        self.tok_re = re.compile(TOKEN_RE)

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        counts, flat = _batch_shingles(texts, self.tok_re)
        offs = np.concatenate([[0], np.cumsum(counts)])
        sets = [np.unique(flat[offs[i]:offs[i + 1]]).astype(np.int64)
                for i in range(len(texts))]
        return pa.table({
            "doc_id": t["doc_id"].cast(pa.int64()),
            "sh": pa.array(sets, pa.list_(pa.int64())),
        })


class MinHasher:
    """Stateful stage: permutation seeds prepared once per actor.
    Emits one (doc_id, band, bhash) row per LSH band, vectorised across
    the whole batch (affine perms -> segment minima -> mixed band hash)."""

    def __init__(self, perms: int = MINHASH_PERMS, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, MERSENNE, size=perms, dtype=np.uint64)
        self.b = rng.integers(0, MERSENNE, size=perms, dtype=np.uint64)
        self.tok_re = re.compile(TOKEN_RE)

    def signatures(self, texts: list[str]) -> np.ndarray:
        """(n_docs, perms) MinHash signature matrix for a batch."""
        counts, flat = _batch_shingles(texts, self.tok_re)
        sh = flat % MERSENNE
        vals = (np.outer(self.a, sh) + self.b[:, None]) % MERSENNE  # (P, S)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        # per-doc segment minima along the flat shingle axis
        return np.stack(
            [np.minimum.reduceat(vals[p], starts) for p in range(len(self.a))],
            axis=1,
        )

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        if not texts:
            return pa.schema([("doc_id", pa.int64()), ("band", pa.int64()),
                              ("bhash", pa.int64())]).empty_table()
        sig = self.signatures(texts)  # (n, perms)
        n = len(texts)
        per_band = MINHASH_PERMS // LSH_BANDS
        sig = sig.reshape(n, LSH_BANDS, per_band).astype(np.uint64)
        # order-dependent band hash: fold values through the splitmix mixer
        bh = np.zeros((n, LSH_BANDS), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for k in range(per_band):
                bh = splitmix64(bh ^ sig[:, :, k])
        did = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(did, LSH_BANDS)),
                "band": pa.array(np.tile(np.arange(LSH_BANDS, dtype=np.int64), n)),
                "bhash": pa.array(bh.reshape(-1).astype(np.int64)),
            }
        )


def lsh_candidate_pairs(sf_dir: str) -> "Dataset":
    """(doc_a < doc_b) candidate pairs sharing any LSH band bucket — as a
    Dataset. Band buckets are hashed into a bounded number of shuffle
    groups; pair expansion inside a group is vectorised over the sorted
    (band, bhash) runs (only multi-doc buckets — rare — loop)."""
    docs = _read_docs(sf_dir)
    bands = docs.map_batches(_stage(MinHasher), batch_format="pyarrow",
                             batch_size=256)

    def add_bucket(t: pa.Table) -> pa.Table:
        b = (t["bhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
             % np.uint64(DEDUP_SHUFFLE_BUCKETS)).astype(np.int64)
        return t.append_column("bucket", pa.array(b))

    def bucket_pairs(t: pa.Table) -> pa.Table:
        band = t["band"].to_numpy(zero_copy_only=False)
        bh = t["bhash"].to_numpy(zero_copy_only=False)
        doc = t["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((doc, bh, band))
        band, bh, doc = band[order], bh[order], doc[order]
        new = np.ones(len(band), dtype=bool)
        new[1:] = (band[1:] != band[:-1]) | (bh[1:] != bh[:-1])
        starts = np.flatnonzero(new)
        ends = np.concatenate([starts[1:], [len(band)]])
        out_a, out_b = [], []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            ids = doc[s:e]
            i, j = np.triu_indices(len(ids), k=1)
            out_a.append(ids[i])
            out_b.append(ids[j])
        a = np.concatenate(out_a) if out_a else np.empty(0, np.int64)
        b = np.concatenate(out_b) if out_b else np.empty(0, np.int64)
        return pa.table({"doc_a": pa.array(a, pa.int64()),
                         "doc_b": pa.array(b, pa.int64())})

    pairs = (
        bands.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )
    # distinct pairs (a doc pair can collide in several bands)
    return pairs.groupby(["doc_a", "doc_b"]).aggregate(
        Count(alias_name="_n")
    ).select_columns(["doc_a", "doc_b"])


def pair_jaccards(sf_dir: str, cand: "Dataset") -> "Dataset":
    """Exact word-3-gram Jaccard for candidate pairs — DISTRIBUTED verify:
    the candidate table joins the per-doc shingle-set table twice (once
    per endpoint) via hash_bucket_join; Jaccard is computed inside the
    joined batches. The documents table never reaches the driver.

    Semi-join first: only docs that appear in a candidate pair are
    shingled (the candidate-id set is bounded by LSH collisions — tiny
    relative to the corpus — so broadcasting it is the cheap side)."""
    import ray

    cand = cand.materialize()
    ids = cand.to_pandas()  # pairs only: bounded, not the doc table
    need = np.union1d(ids["doc_a"].to_numpy(), ids["doc_b"].to_numpy())
    need_ref = ray.put(need)

    def only_needed(t: pa.Table) -> pa.Table:
        keep = np.isin(t["doc_id"].to_numpy(zero_copy_only=False),
                       ray.get(need_ref))
        return t.filter(pa.array(keep))

    shingles = _read_docs(sf_dir).map_batches(
        only_needed, batch_format="pyarrow"
    ).map_batches(
        _stage(ShingleSets), batch_format="pyarrow"
    ).materialize()  # consumed by BOTH endpoint joins — compute once

    if len(need) <= BROADCAST_VERIFY_MAX:
        # fast path: the needed shingle sets are bounded by the candidate
        # count (same bound that justifies the driver union-find), so
        # broadcast them once and verify in a single map over the pairs
        sh_map = {}
        for t in shingles.iter_batches(batch_size=4096, batch_format="pyarrow"):
            for d, s in zip(t["doc_id"].to_pylist(), t["sh"].to_pylist()):
                sh_map[int(d)] = np.asarray(s, dtype=np.int64)
        sh_ref = ray.put(sh_map)

        def jac_bcast(t: pa.Table) -> pa.Table:
            m = ray.get(sh_ref)
            da = t["doc_a"].to_numpy(zero_copy_only=False)
            db = t["doc_b"].to_numpy(zero_copy_only=False)
            out = np.empty(len(da), dtype=np.float64)
            for i in range(len(da)):  # rows = candidate pairs only
                x, y = m[int(da[i])], m[int(db[i])]
                inter = len(np.intersect1d(x, y, assume_unique=True))
                union = len(x) + len(y) - inter
                out[i] = inter / union if union else 0.0
            return pa.table({
                "doc_a": pa.array(da.astype(np.int64)),
                "doc_b": pa.array(db.astype(np.int64)),
                "jaccard": pa.array(np.round(out, 6), pa.float64()),
            })

        return cand.map_batches(jac_bcast, batch_format="pyarrow")

    sh_a = shingles.map_batches(
        lambda t: pa.table({"_da": t["doc_id"], "sh_a": t["sh"]}),
        batch_format="pyarrow",
    )
    sh_b = shingles.map_batches(
        lambda t: pa.table({"_db": t["doc_id"], "sh_b": t["sh"]}),
        batch_format="pyarrow",
    )
    j = hash_bucket_join(cand, sh_a, left_on="doc_a", right_on="_da")
    j = hash_bucket_join(j, sh_b, left_on="doc_b", right_on="_db")

    def jac(t: pa.Table) -> pa.Table:
        sa = t["sh_a"].to_pylist()
        sb = t["sh_b"].to_pylist()
        out = np.empty(len(sa), dtype=np.float64)
        for i, (x, y) in enumerate(zip(sa, sb)):  # rows = candidate pairs only
            inter = len(np.intersect1d(x, y, assume_unique=True))
            union = len(x) + len(y) - inter
            out[i] = inter / union if union else 0.0
        return pa.table({
            "doc_a": t["doc_a"].cast(pa.int64()),
            "doc_b": t["doc_b"].cast(pa.int64()),
            "jaccard": pa.array(np.round(out, 6), pa.float64()),
        })

    return j.map_batches(jac, batch_format="pyarrow")


def q_doc_minhash_dedup(sf_dir: str, run_dir: str | None = None,
                        resume: bool = False) -> pa.Table:
    """Near-dup groups: LSH candidates -> exact-Jaccard verify -> union-find.

    Candidates AND verification are distributed; only the union-find over
    VERIFIED pairs runs driver-side (verified pairs << docs, LSH bounded);
    at corpus scale the same pairs feed the WCC kernel instead. The final
    group assignment broadcasts the tiny rep map and labels documents in
    a map_batches pass — no driver materialisation of the doc table.

    ``run_dir`` checkpoints the two expensive phases (candidate pairs,
    verified pairs — checkpoint.PhaseLog); ``resume=True`` skips any
    phase whose manifest exists, so a kill mid-verify restarts at verify
    instead of re-shingling the corpus.
    """
    import ray

    from ..checkpoint import PhaseLog

    plog = PhaseLog(run_dir) if run_dir else None
    cand = verified = None
    if resume and plog is not None:
        found = plog.latest()
        if found is not None:
            pdone, _meta = found
            if pdone >= 1:
                verified = plog.load(1, "verified").to_pandas()
            else:
                cand = plog.load(0, "candidates").materialize()
    if verified is None:
        if cand is None:
            cand = lsh_candidate_pairs(sf_dir)
            if plog is not None:
                cand = cand.materialize()
                plog.complete(0, {"candidates": cand}, {"stage": "candidates"})
        verified = pair_jaccards(sf_dir, cand).filter(
            expr=f"jaccard >= {JACCARD_TAU}"
        ).to_pandas()  # verified near-dup pairs only: tiny by construction
        if plog is not None:
            plog.complete(1, {"verified": pa.table({
                "doc_a": pa.array(verified["doc_a"].to_numpy().astype(np.int64)),
                "doc_b": pa.array(verified["doc_b"].to_numpy().astype(np.int64)),
                "jaccard": pa.array(verified["jaccard"].to_numpy().astype(np.float64)),
            })}, {"stage": "verified"})
    return _pair_components_assign(sf_dir, verified)


# above this many verified pairs the group assignment switches from the
# driver union-find + broadcast map to the distributed WCC kernel over
# the pair graph (min labels == min union-find reps, so the two paths
# are value-identical; parity-pinned in tests via wcc_threshold=0)
WCC_PAIRS_THRESHOLD = 50_000


def _rep_arrays(rep: dict) -> tuple[np.ndarray, np.ndarray]:
    """Sorted (keys, values) arrays of a rep map for vectorised lookup."""
    if not rep:
        e = np.empty(0, dtype=np.int64)
        return e, e
    keys = np.fromiter(rep.keys(), dtype=np.int64, count=len(rep))
    vals = np.fromiter(rep.values(), dtype=np.int64, count=len(rep))
    o = np.argsort(keys)
    return keys[o], vals[o]


def _map_reps(keys_sorted: np.ndarray, vals_sorted: np.ndarray,
              ids: np.ndarray) -> np.ndarray:
    """ids -> rep (identity where absent), one searchsorted pass — the
    shared group-assignment lookup (no Python loop over rows)."""
    out = ids.copy()
    if len(keys_sorted) == 0:
        return out
    pos = np.minimum(np.searchsorted(keys_sorted, ids),
                     len(keys_sorted) - 1)
    hit = keys_sorted[pos] == ids
    out[hit] = vals_sorted[pos[hit]]
    return out


def _pair_components_assign(sf_dir: str, verified,
                            wcc_threshold: int = WCC_PAIRS_THRESHOLD
                            ) -> pa.Table:
    """(doc_id, group_rep) for EVERY document: connected components of
    the verified-pair graph, identity elsewhere.

    Small pair sets: driver union-find + broadcast map (pairs are tiny
    by LSH construction). Beyond ``wcc_threshold``: the pairs become a
    symmetric graph store and the WCC kernel labels them — the
    documented 10^12-doc switch, now real. Either path's rep is the
    component's MIN doc_id, and the final assignment folds identity
    via one grouped min (group_rep = min(doc_id, component label)) —
    no outer join, no driver materialisation of the doc table."""
    import ray

    docs = _read_docs(sf_dir, columns=("doc_id",))
    if len(verified) <= wcc_threshold:
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent.get(x, x) != x:
                parent[x] = parent.get(parent[x], parent[x])
                x = parent[x]
            return x

        for a, b in zip(verified["doc_a"], verified["doc_b"]):
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        rep_ref = ray.put(_rep_arrays({x: find(x) for x in parent}))

        def assign(t: pa.Table) -> pa.Table:
            rk, rv = ray.get(rep_ref)
            did = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table({"doc_id": pa.array(did),
                             "group_rep": pa.array(_map_reps(rk, rv, did))})

        out = docs.map_batches(assign, batch_format="pyarrow").to_pandas()
        out = out.sort_values("doc_id").reset_index(drop=True)
        return pa.Table.from_pandas(out, preserve_index=False)

    # ---- distributed path: WCC kernel over the pair graph ----------------
    import os
    import shutil

    import ray.data as rd

    from ..graph import partition_edges
    from ..kernels import wcc

    a = verified["doc_a"].to_numpy().astype(np.int64)
    b = verified["doc_b"].to_numpy().astype(np.int64)
    pairs = rd.from_arrow(pa.table({"src": np.concatenate([a, b]),
                                    "dst": np.concatenate([b, a])}))
    V = int(max(a.max(), b.max())) + 1
    root = os.path.join("/tmp/planar_ray_cache",
                        f"dedup_wcc_{os.getpid()}")
    shutil.rmtree(root, ignore_errors=True)
    g = partition_edges(pairs, root, V, num_parts=8, direction="fwd",
                        dedup_in_parts=True)
    state, eng = wcc(g)
    # is_doc marker: WCC labels zero-degree id-space holes too — the
    # grouped fold keeps only groups that contain a real document row
    # (fully distributed; no driver doc-id materialisation)
    labels = state.select_columns(["v", "val"]).map_batches(
        lambda t: pa.table({
            "doc_id": t["v"],
            "group_rep": t["val"].cast(pa.int64()),
            "is_doc": pa.array(np.zeros(len(t), np.int8)),
        }),
        batch_format="pyarrow")
    eng.close()
    ident = docs.map_batches(
        lambda t: pa.table({
            "doc_id": t["doc_id"].combine_chunks().cast(pa.int64()),
            "group_rep": t["doc_id"].combine_chunks().cast(pa.int64()),
            "is_doc": pa.array(np.ones(len(t), np.int8)),
        }),
        batch_format="pyarrow")
    from ray.data.aggregate import Max, Min

    out = (ident.union(labels).groupby("doc_id")
           .aggregate(Min(on="group_rep", alias_name="group_rep"),
                      Max(on="is_doc", alias_name="is_doc"))
           .to_pandas())
    out = out[out["is_doc"] == 1].drop(columns=["is_doc"])
    out = out.astype({"doc_id": "int64", "group_rep": "int64"})
    out = out.sort_values("doc_id").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


class SimHasher:
    """64-bit SimHash, vectorised: tokens of the whole batch are hashed
    in one siphash call; per-bit ±1 votes accumulate via a single
    ``np.add.at`` over the (docs, 64) vote matrix."""

    def __init__(self):
        # the token hash seed is the module-level SIMHASH_SEED (shared
        # with the SQL oracle) — not a constructor knob
        self.tok_re = re.compile(TOKEN_RE)

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        toks_per_doc = [
            np.asarray(self.tok_re.findall(s.lower()), dtype=object)
            for s in texts
        ]
        counts = np.array([len(x) for x in toks_per_doc], dtype=np.int64)
        flat = (np.concatenate(toks_per_doc) if toks_per_doc
                else np.empty(0, dtype=object))
        hv = poly_splitmix_vec(flat, SIMHASH_SEED)
        shifts = np.arange(64, dtype=np.uint64)
        pm = np.where(((hv[:, None] >> shifts[None, :]) & 1) == 1, 1, -1
                      ).astype(np.int64)  # (tokens, 64) of +-1
        votes = np.zeros((len(texts), 64), dtype=np.int64)
        np.add.at(votes, np.repeat(np.arange(len(texts)), counts), pm)
        sig = np.bitwise_or.reduce(
            (votes > 0).astype(np.uint64) << shifts[None, :], axis=1
        )
        return pa.table({"doc_id": t["doc_id"],
                         "simhash": pa.array(sig.astype(np.int64), pa.int64())})


def q_doc_simhash(sf_dir: str) -> pa.Table:
    docs = _read_docs(sf_dir)
    out = docs.map_batches(_stage(SimHasher), batch_format="pyarrow").to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    return pa.Table.from_pandas(out.sort_values("doc_id"), preserve_index=False)


def q_doc_ngram_jaccard(sf_dir: str) -> pa.Table:
    cand = lsh_candidate_pairs(sf_dir)
    verified = pair_jaccards(sf_dir, cand).to_pandas()
    return pa.Table.from_pandas(
        verified.sort_values(["doc_a", "doc_b"]).reset_index(drop=True),
        preserve_index=False,
    )


class Winnower:
    """Winnowing fingerprints: k-gram rolling hash + window minima."""

    def __init__(self, k: int = 8, w: int = 4):
        self.k, self.w = k, w
        base = np.uint64(1099511628211)
        self.weights = base ** np.arange(k - 1, -1, -1, dtype=np.uint64)

    def fingerprints(self, text: str) -> np.ndarray:
        raw = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
        if len(raw) < self.k:
            return np.array([int(h64("short", text)) & (2**63 - 1)], dtype=np.int64)
        win = np.lib.stride_tricks.sliding_window_view(raw.astype(np.uint64), self.k)
        hashes = (win * self.weights).sum(axis=1)  # uint64 wraparound = mod 2^64
        if len(hashes) < self.w:
            mins = np.array([hashes.min()])
        else:
            hw = np.lib.stride_tricks.sliding_window_view(hashes, self.w)
            mins = hw.min(axis=1)
        return np.unique(mins).astype(np.int64, casting="unsafe")

    def __call__(self, t: pa.Table) -> pa.Table:
        """Whole-batch winnowing over the CONCATENATED Arrow utf-8
        buffer — one polynomial-hash pass and one window-min pass for
        the entire batch, no per-doc Python loop. Windows that straddle
        a doc boundary are computed but never selected (each doc's valid
        start range excludes its last k-1 / w-1 positions), so results
        are byte-identical to per-doc ``fingerprints``."""
        k, w = self.k, self.w
        col = t["text"].combine_chunks().cast(pa.large_string())
        bufs = col.buffers()
        off = np.frombuffer(bufs[1], dtype=np.int64)[
            col.offset:col.offset + len(col) + 1]
        data = np.frombuffer(bufs[2], dtype=np.uint8)
        n = len(col)
        L = np.diff(off)
        n_fp = np.zeros(n, dtype=np.int64)
        min_fp = np.zeros(n, dtype=np.int64)

        normal = L >= k  # docs with at least one k-gram
        if normal.any() and len(data) >= k:
            d64 = data.astype(np.uint64)
            m = len(data) - k + 1
            hashes = np.zeros(m, dtype=np.uint64)
            with np.errstate(over="ignore"):  # wraparound = mod 2^64
                for j in range(k):
                    hashes += d64[j:j + m] * self.weights[j]
            nw = L - k + 1  # k-gram count per doc
            few = normal & (nw < w)  # min over ALL the doc's hashes
            for i in np.flatnonzero(few):
                h = hashes[off[i]:off[i] + nw[i]]
                n_fp[i] = 1
                min_fp[i] = np.int64(h.min().astype(np.int64))
            many = normal & (nw >= w)
            if many.any():
                mw = len(hashes) - w + 1
                mins_all = np.lib.stride_tricks.sliding_window_view(
                    hashes, w).min(axis=1) if mw > 0 else hashes[:0]
                starts = off[:-1][many]
                cnt = (nw[many] - w + 1)
                tot = int(cnt.sum())
                # grouped arange: for each doc, its cnt window positions
                docrep = np.repeat(np.flatnonzero(many), cnt)
                pos = (np.arange(tot)
                       - np.repeat(np.cumsum(cnt) - cnt, cnt)
                       + np.repeat(starts, cnt))
                vals = mins_all[pos].astype(np.int64)  # unsafe cast as before
                order = np.lexsort((vals, docrep))
                dr, vs = docrep[order], vals[order]
                first = np.empty(tot, dtype=bool)
                first[0] = True
                first[1:] = (dr[1:] != dr[:-1]) | (vs[1:] != vs[:-1])
                np.add.at(n_fp, dr[first], 1)
                # per-doc min = first value of each doc group (sorted asc)
                head = np.empty(tot, dtype=bool)
                head[0] = True
                head[1:] = dr[1:] != dr[:-1]
                min_fp[dr[head]] = vs[head]

        for i in np.flatnonzero(~normal):  # rare: doc shorter than k bytes
            fp = self.fingerprints(col[i].as_py())
            n_fp[i] = len(fp)
            min_fp[i] = int(fp.min())

        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_fp": pa.array(n_fp, pa.int64()),
                "min_fp": pa.array(min_fp, pa.int64()),
            }
        )


def q_doc_fingerprint(sf_dir: str) -> pa.Table:
    docs = _read_docs(sf_dir)
    out = docs.map_batches(_stage(Winnower), batch_format="pyarrow").to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    return pa.Table.from_pandas(out.sort_values("doc_id"), preserve_index=False)


def _fingerprint_sql(k: int = 8, w: int = 4) -> str:
    """SQL twin of the winnowing fingerprints (the splitmix64-in-SQL
    precedent): the k-gram polynomial rolling hash is pure mod-2^64
    arithmetic, so HUGEINT replicates it bit-exactly — byte j of each
    window contributes ``byte * base^(k-1-j)``, built with ``lead()``
    window functions; window minima are a ROWS BETWEEN frame over the
    UNSIGNED hash (HUGEINT in [0, 2^64) preserves unsigned order);
    the final distinct-count/min are over the int64-cast (signed)
    values, matching the numpy ``astype(int64)``.

    Valid for ASCII corpora whose docs all have >= k+w-1 bytes (the
    testdata guarantee — ``ascii(substr(...))`` indexes characters, the
    engine indexes utf-8 bytes; the engine's short-doc fallbacks are
    siphash-based and deliberately not replicated)."""
    base = 1099511628211
    W = [pow(base, k - 1 - j, 1 << 64) for j in range(k)]
    poly = " + ".join(
        (f"b * {W[0]}::HUGEINT" if j == 0 else
         f"lead(b, {j}) OVER win * {W[j]}::HUGEINT")
        for j in range(k))
    return f"""
WITH pos AS (
  SELECT doc_id, text,
         unnest(generate_series(1, CAST(length(text) AS BIGINT))) AS i
  FROM documents),
bytes AS MATERIALIZED (
  SELECT doc_id, i,
         CAST(ascii(substr(text, CAST(i AS INT), 1)) AS HUGEINT) AS b
  FROM pos),
h AS MATERIALIZED (
  SELECT doc_id, i,
         ({poly}) % 18446744073709551616::HUGEINT AS hv,
         lead(b, {k - 1}) OVER win IS NOT NULL AS ok
  FROM bytes WINDOW win AS (PARTITION BY doc_id ORDER BY i)),
mins AS (
  SELECT doc_id, i,
         MIN(hv) OVER (PARTITION BY doc_id ORDER BY i
                       ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS mv,
         COUNT(*) OVER (PARTITION BY doc_id ORDER BY i
                        ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS cnt
  FROM h WHERE ok),
signed AS (
  SELECT doc_id,
         CAST(CASE WHEN mv >= 9223372036854775808::HUGEINT
                   THEN mv - 18446744073709551616::HUGEINT
                   ELSE mv END AS BIGINT) AS sv
  FROM mins WHERE cnt = {w})
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(COUNT(DISTINCT sv) AS BIGINT) AS n_fp,
       MIN(sv) AS min_fp
FROM signed GROUP BY doc_id
"""


SQL_DOC_FINGERPRINT = _fingerprint_sql()


# ---------------------------------------------------------------------------
# SQL twins of the near-dup suite (round 4): poly+splitmix64 hashing is
# pure mod-2^64 arithmetic, so DuckDB HUGEINT replays the ENTIRE pipeline
# bit-exactly — token -> shingle hash -> 64 MinHash permutations (uint64
# wraparound affine maps mod the Mersenne prime) -> order-dependent band
# fold (xor + splitmix64, the _sql_mix CTE chain) -> candidate pairs on
# (band, bhash) equality -> exact shingle-set Jaccard -> recursive
# min-label components (the union-find twin). Permutation constants are
# embedded as VALUES rows from the same seeded rng as MinHasher.
# ---------------------------------------------------------------------------

_M64 = 1 << 64


def _hash_sql_ctes(prefix: str, src: str, col: str, seed: int,
                   keep: list[str]) -> tuple[list[str], str]:
    """CTE chain computing z = poly_splitmix_vec(col, seed) (UBIGINT,
    verified bit-exact against util.poly_splitmix_vec)."""
    from .testdata_graph import _sql_mix

    poly = (f"list_reduce(list_prepend(CAST({seed} AS HUGEINT), "
            f"list_transform(generate_series(1, CAST(length({col}) AS BIGINT)), "
            f"x -> CAST(ascii(substr({col}, CAST(x AS INT), 1)) AS HUGEINT))), "
            f"(h, b) -> (h * {POLY_PRIME} + b) % {_M64}::HUGEINT)")
    return _sql_mix(prefix, src, poly, keep)


def _simhash_sql() -> str:
    ctes = [
        f"stoks AS MATERIALIZED (SELECT doc_id, "
        f"unnest(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS tok "
        f"FROM documents)",
    ]
    hctes, fin = _hash_sql_ctes("sh", "stoks", "tok", SIMHASH_SEED, ["doc_id"])
    ctes += hctes
    votes = ", ".join(
        f"SUM(CASE WHEN ((z >> {j}) & 1) = 1 THEN 1 ELSE -1 END) AS v{j}"
        for j in range(64))
    ctes.append(f"votes AS (SELECT doc_id, {votes} FROM {fin} GROUP BY doc_id)")
    sig = " + ".join(
        f"(CASE WHEN v{j} > 0 THEN {1 << j}::HUGEINT ELSE 0::HUGEINT END)"
        for j in range(64))
    ctes.append(f"sig AS (SELECT doc_id, {sig} AS s FROM votes)")
    ctes.append(
        f"signed AS (SELECT doc_id, CAST(CASE WHEN s >= {1 << 63}::HUGEINT "
        f"THEN s - {_M64}::HUGEINT ELSE s END AS BIGINT) AS simhash FROM sig)")
    return ("WITH " + ",\n".join(ctes)
            + "\nSELECT CAST(d.doc_id AS BIGINT) AS doc_id, "
              "COALESCE(g.simhash, 0) AS simhash "
              "FROM documents d LEFT JOIN signed g ON g.doc_id = d.doc_id")


def _cand_jac_ctes() -> list[str]:
    """Shared CTE block: documents -> shingle hashes -> MinHash bands ->
    LSH candidate pairs -> exact Jaccard per pair ('jac')."""
    from .testdata_graph import _sql_mix

    ctes = [
        f"jt0 AS (SELECT doc_id, regexp_extract_all(lower(text), "
        f"'{TOKEN_RE}') AS tk FROM documents)",
        # pad to >= 3 tokens with '_pad' (the _batch_shingles rule)
        "jt1 AS (SELECT doc_id, CASE WHEN len(tk) >= 3 THEN tk "
        "ELSE list_concat(tk, list_transform(generate_series(1, 3 - len(tk)),"
        " x -> '_pad')) END AS tk FROM jt0)",
        "jt2 AS (SELECT doc_id, tk, "
        "unnest(generate_series(1, len(tk) - 2)) AS i FROM jt1)",
        "jt3 AS (SELECT doc_id, tk[i] || chr(31) || tk[i+1] || chr(31) || "
        "tk[i+2] AS s FROM jt2)",
    ]
    hctes, fin = _hash_sql_ctes("jh", "jt3", "s", SHINGLE_SEED, ["doc_id"])
    ctes += hctes
    ctes.append(f"shing AS MATERIALIZED (SELECT doc_id, z FROM {fin})")
    mh = MinHasher()
    perms = ", ".join(f"({p}, {int(mh.a[p])}, {int(mh.b[p])})"
                      for p in range(MINHASH_PERMS))
    per_band = MINHASH_PERMS // LSH_BANDS
    ctes.append(f"perms(p, a, b) AS (SELECT * FROM (VALUES {perms}) "
                f"t(p, a, b))")
    # uint64-wraparound affine map then mod Mersenne — exactly the numpy
    # (np.outer(a, sh) + b) % MERSENNE in uint64
    ctes.append(
        f"mvals AS MATERIALIZED (SELECT s.doc_id, pm.p, "
        f"MIN((((CAST(pm.a AS HUGEINT) * (CAST(s.z AS HUGEINT) % {MERSENNE}))"
        f" % {_M64}::HUGEINT + pm.b) % {_M64}::HUGEINT) % {MERSENNE}) AS sv "
        f"FROM shing s CROSS JOIN perms pm GROUP BY s.doc_id, pm.p)")
    ctes.append(f"bnd AS (SELECT doc_id, p // {per_band} AS band, "
                f"p % {per_band} AS k, sv FROM mvals)")
    ctes.append("bf0 AS (SELECT DISTINCT doc_id, band, "
                "CAST(0 AS UBIGINT) AS bh FROM bnd)")
    for k in range(per_band):  # bh = splitmix64(bh ^ sig[:, :, k])
        ctes.append(
            f"bx{k} AS (SELECT f.doc_id, f.band, "
            f"xor(f.bh, CAST(v.sv AS UBIGINT)) AS zin "
            f"FROM bf{k} f JOIN bnd v ON v.doc_id = f.doc_id "
            f"AND v.band = f.band AND v.k = {k})")
        mix, mfin = _sql_mix(f"bm{k}", f"bx{k}", "zin", ["doc_id", "band"])
        ctes += mix
        ctes.append(f"bf{k + 1} AS (SELECT doc_id, band, z AS bh FROM {mfin})")
    ctes.append(
        f"cand AS MATERIALIZED (SELECT DISTINCT a.doc_id AS doc_a, "
        f"b.doc_id AS doc_b FROM bf{per_band} a JOIN bf{per_band} b "
        f"ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id)")
    ctes.append("shsets AS MATERIALIZED (SELECT doc_id, list(DISTINCT z) "
                "AS sh FROM shing GROUP BY doc_id)")
    ctes.append(
        "jpair AS MATERIALIZED (SELECT c.doc_a, c.doc_b, "
        "CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) AS inter, "
        "CAST(len(a.sh) + len(b.sh) AS DOUBLE) AS tot "
        "FROM cand c JOIN shsets a ON a.doc_id = c.doc_a "
        "JOIN shsets b ON b.doc_id = c.doc_b)")
    ctes.append("jac AS MATERIALIZED (SELECT doc_a, doc_b, "
                "ROUND(inter / (tot - inter), 6) AS jaccard FROM jpair)")
    return ctes


def _ngram_jaccard_sql() -> str:
    return ("WITH " + ",\n".join(_cand_jac_ctes())
            + "\nSELECT CAST(doc_a AS BIGINT) AS doc_a, "
              "CAST(doc_b AS BIGINT) AS doc_b, jaccard FROM jac")


def _minhash_dedup_sql() -> str:
    ctes = _cand_jac_ctes()
    ctes.append(f"ver AS (SELECT doc_a, doc_b FROM jac "
                f"WHERE jaccard >= {JACCARD_TAU})")
    ctes.append("walk AS (SELECT doc_a AS a, doc_b AS b FROM ver "
                "UNION ALL SELECT doc_b, doc_a FROM ver)")
    # min-label transitive closure == the driver union-find's min rep
    # (verified groups are tiny, so the closure is cheap)
    ctes.append(
        "reach(d, r) AS (SELECT doc_id, doc_id FROM documents "
        "UNION SELECT w.b, r.r FROM reach r JOIN walk w ON w.a = r.d)")
    return ("WITH RECURSIVE " + ",\n".join(ctes)
            + "\nSELECT CAST(d AS BIGINT) AS doc_id, "
              "CAST(MIN(r) AS BIGINT) AS group_rep FROM reach GROUP BY d")


SQL_DOC_SIMHASH = _simhash_sql()
SQL_DOC_NGRAM_JACCARD = _ngram_jaccard_sql()
SQL_DOC_MINHASH_DEDUP = _minhash_dedup_sql()


TOP_TERMS_K = 20


def _token_counts(sf_dir: str) -> "Dataset":
    """(token, n) global token counts: per-batch combiner then one
    aggregate shuffle. Tokenisation is pure Arrow kernels — finding all
    ``[a-z0-9_]+`` runs equals SPLITTING on ``[^a-z0-9_]+`` (dropping
    the empty boundary fragments), so lower + split_pattern_regex +
    list_flatten + value_counts replaces the per-row ``re.findall``
    loop; no Python touches a token."""
    from ray.data.aggregate import Sum

    docs = _read_docs(sf_dir, columns=("text",))

    def batch_counts(t: pa.Table) -> pa.Table:
        low = pc.utf8_lower(t["text"])
        flat = pc.list_flatten(pc.split_pattern_regex(low, "[^a-z0-9_]+"))
        flat = flat.filter(pc.not_equal(flat, ""))
        if len(flat) == 0:
            return pa.schema([("token", pa.string()),
                              ("n", pa.int64())]).empty_table()
        vc = pc.value_counts(flat)
        return pa.table({"token": vc.field("values").cast(pa.string()),
                         "n": vc.field("counts").cast(pa.int64())})

    return docs.map_batches(batch_counts, batch_format="pyarrow").groupby(
        "token"
    ).aggregate(Sum(on="n", alias_name="n"))


def q_doc_vocab(sf_dir: str) -> pa.Table:
    """Global vocabulary stats: distinct token count + total token count."""
    counts = _token_counts(sf_dir).materialize()
    vocab = counts.count()
    total = counts.sum("n") or 0
    return pa.table({"vocab_size": pa.array([int(vocab)], pa.int64()),
                     "total_tokens": pa.array([int(total)], pa.int64())})


SQL_DOC_VOCAB = f"""
WITH toks AS MATERIALIZED (
  SELECT UNNEST(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS token
  FROM documents)
SELECT CAST(COUNT(DISTINCT token) AS BIGINT) AS vocab_size,
       CAST(COUNT(*) AS BIGINT) AS total_tokens
FROM toks
"""


def q_doc_top_terms(sf_dir: str) -> pa.Table:
    """Top-{TOP_TERMS_K} most frequent tokens (ties -> token asc)."""
    counts = _token_counts(sf_dir)
    top = counts.sort(["n", "token"], descending=[True, False]).limit(
        TOP_TERMS_K).to_pandas()
    return pa.table({"token": pa.array(top["token"]),
                     "n": pa.array(top["n"].astype("int64"))})


SQL_DOC_TOP_TERMS = f"""
WITH toks AS MATERIALIZED (
  SELECT UNNEST(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS token
  FROM documents)
SELECT token, CAST(COUNT(*) AS BIGINT) AS n
FROM toks GROUP BY token
ORDER BY n DESC, token ASC LIMIT {TOP_TERMS_K}
"""


# ---------------------------------------------------------------------------
# HyperLogLog distinct-token sketch (the "novel sketch" operator class)
# ---------------------------------------------------------------------------

HLL_B = 10                 # 2^10 = 1024 registers
HLL_M = 1 << HLL_B
HLL_SEED = 7640891576956012809  # splitmix golden-gamma derived (distinct seed)


def _bit_length_u64(w: np.ndarray) -> np.ndarray:
    """Exact bit length of uint64 values (no float log2 — w can exceed
    2^53 where float rounding would misplace the boundary)."""
    bl = np.zeros(len(w), np.int64)
    v = w.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        m = v >= (np.uint64(1) << np.uint64(shift))
        bl[m] += shift
        v[m] >>= np.uint64(shift)
    bl += (v > 0).astype(np.int64)
    return bl


def _hll_estimate(denom: float, nonzero: int) -> float:
    """Standard HLL estimator with the linear-counting small-range
    correction; ``denom`` already includes 2^0 = 1 per EMPTY register."""
    m = float(HLL_M)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / denom
    zeros = HLL_M - nonzero
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)
    return float(est)


def q_doc_hll_vocab(sf_dir: str) -> pa.Table:
    """Approximate distinct-token count via a distributed HyperLogLog:
    per batch, tokens hash (poly+splitmix64) into 2^{HLL_B} registers
    and the batch emits its ≤{HLL_M}-row register PARTIAL (max rho per
    bucket — the combiner); one tiny groupby-max merges partials. At
    100 TB this replaces doc_vocab's full token shuffle with a
    constant-size exchange. The SQL twin replays the identical hash,
    bucket split, exact-integer bit-length CASE chain and estimator."""
    from ray.data.aggregate import Max

    docs = _read_docs(sf_dir, columns=("text",))

    def partial(t: pa.Table) -> pa.Table:
        low = pc.utf8_lower(t["text"])
        flat = pc.list_flatten(pc.split_pattern_regex(low, "[^a-z0-9_]+"))
        flat = flat.filter(pc.not_equal(flat, ""))
        if len(flat) == 0:
            return pa.schema([("bucket", pa.int64()),
                              ("rho", pa.int64())]).empty_table()
        hv = poly_splitmix_vec(flat, HLL_SEED)
        bucket = (hv & np.uint64(HLL_M - 1)).astype(np.int64)
        w = hv >> np.uint64(HLL_B)          # remaining 64-HLL_B bits
        rho = (64 - HLL_B + 1) - _bit_length_u64(w)  # w==0 -> max rho
        reg = np.zeros(HLL_M, np.int64)
        np.maximum.at(reg, bucket, rho)
        nz = np.flatnonzero(reg)
        return pa.table({"bucket": pa.array(nz),
                         "rho": pa.array(reg[nz])})

    regs = (docs.map_batches(partial, batch_format="pyarrow")
            .groupby("bucket").aggregate(Max(on="rho", alias_name="rho"))
            .to_pandas())
    nonzero = len(regs)
    denom = float(np.sum(np.power(2.0, -regs["rho"].to_numpy(np.float64)))
                  + (HLL_M - nonzero))
    est = _hll_estimate(denom, nonzero)
    return pa.table({"hll_vocab": pa.array([round(est, 6)], pa.float64())})


def _hll_sql() -> str:
    wbits = 64 - HLL_B
    # exact integer thresholds: w >= 2^k  ->  bit_length k+1  ->  rho = wbits - k
    rho_case = "CASE " + " ".join(
        f"WHEN w >= {1 << k} THEN {wbits - k}"
        for k in range(wbits - 1, -1, -1)
    ) + f" ELSE {wbits + 1} END"
    m = float(HLL_M)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    ctes = [
        f"toks AS MATERIALIZED (SELECT unnest(regexp_extract_all(lower(text),"
        f" '{TOKEN_RE}')) AS tok FROM documents)",
    ]
    hctes, fin = _hash_sql_ctes("hv", "toks", "tok", HLL_SEED, [])
    ctes += hctes
    ctes += [
        f"br AS (SELECT CAST(z % {HLL_M} AS BIGINT) AS bucket,"
        f" z // {HLL_M} AS w FROM {fin})",
        f"rr AS (SELECT bucket, {rho_case} AS rho FROM br)",
        "regs AS (SELECT bucket, MAX(rho) AS rho FROM rr GROUP BY bucket)",
        f"agg AS (SELECT SUM(POWER(2.0, -rho)) + ({HLL_M} - COUNT(*)) AS denom,"
        f" {HLL_M} - COUNT(*) AS zeros FROM regs)",
        # every float literal CAST to DOUBLE: DuckDB parses decimal
        # literals as DECIMAL(18,..) whose products overflow
        f"est AS (SELECT CAST({alpha!r} AS DOUBLE) * CAST({m!r} AS DOUBLE)"
        f" * CAST({m!r} AS DOUBLE) / denom AS e, zeros FROM agg)",
    ]
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT ROUND(CASE WHEN e <= CAST({2.5 * m!r} AS DOUBLE)"
            f" AND zeros > 0"
            f" THEN CAST({m!r} AS DOUBLE) * ln(CAST({m!r} AS DOUBLE) / zeros)"
            " ELSE e END, 6) AS hll_vocab"
            " FROM est")


SQL_DOC_HLL_VOCAB = _hll_sql()


# ---------------------------------------------------------------------------
# dictionary scrub (boilerplate / banned-term removal)
# ---------------------------------------------------------------------------

# fixed scrub dictionary (deterministic; terms that occur in the corpus
# so the transform is exercised, not a no-op)
SCRUB_TERMS = ("key", "table", "merge")
SCRUB_RE = r"\b(" + "|".join(SCRUB_TERMS) + r")\b"  # RE2 both sides
SCRUB_TOKEN = "[TERM]"


def q_doc_scrub(sf_dir: str) -> pa.Table:
    """Dictionary-based scrub — the banned-term/boilerplate-removal
    primitive of a training-data pipeline: one vectorised RE2
    alternation replace per batch (pc.replace_substring_regex), plus
    the count of redactions per doc. DuckDB twin: regexp_replace(...,
    'g') with the identical RE2 pattern."""
    docs = _read_docs(sf_dir)

    def scrub(t: pa.Table) -> pa.Table:
        hits = pc.count_substring_regex(t["text"], SCRUB_RE)
        clean = pc.replace_substring_regex(t["text"], SCRUB_RE, SCRUB_TOKEN)
        return pa.table({
            "doc_id": t["doc_id"],
            "scrubbed": clean,
            "n_redacted": hits.cast(pa.int64()),
        })

    out = docs.map_batches(scrub, batch_format="pyarrow").to_pandas()
    return pa.Table.from_pandas(out, preserve_index=False)


SQL_DOC_SCRUB = f"""
SELECT doc_id,
       regexp_replace(text, '{SCRUB_RE}', '{SCRUB_TOKEN}', 'g') AS scrubbed,
       CAST(length(regexp_split_to_array(text, '{SCRUB_RE}')) - 1 AS BIGINT)
         AS n_redacted
FROM documents
"""


# ---------------------------------------------------------------------------
# TF-IDF top term per document (round 5)
# ---------------------------------------------------------------------------


def _doc_token_tf(sf_dir: str) -> "Dataset":
    """(doc_id, token, tf) — per-batch Arrow tokenisation (no Python in
    the loop) with a per-batch (doc, token) combine before the df
    shuffle."""
    docs = _read_docs(sf_dir, columns=("doc_id", "text"))

    def f(t: pa.Table) -> pa.Table:
        import pandas as pd

        low = pc.utf8_lower(t["text"])
        lists = pc.split_pattern_regex(low, "[^a-z0-9_]+")
        lens = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(lists)
        doc = np.repeat(
            t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64),
            lens)
        keep = pc.not_equal(flat, "")
        doc = doc[keep.to_numpy(zero_copy_only=False)]
        flat = flat.filter(keep)
        if len(doc) == 0:
            return pa.schema([("doc_id", pa.int64()), ("token", pa.string()),
                              ("tf", pa.int64())]).empty_table()
        df = pd.DataFrame({"doc_id": doc, "token": flat.to_pandas()})
        gc = (df.groupby(["doc_id", "token"], sort=False).size()
              .reset_index(name="tf"))
        return pa.table({"doc_id": pa.array(gc["doc_id"].to_numpy()),
                         "token": pa.array(gc["token"], pa.string()),
                         "tf": pa.array(gc["tf"].to_numpy(np.int64))})

    return docs.map_batches(f, batch_format="pyarrow")


def q_doc_tfidf(sf_dir: str) -> pa.Table:
    """Highest-tfidf token per document (tf * ln(N/df); ties -> token
    asc): tf rows join the df aggregate on token (one bounded shuffle
    each), per-doc argmax via groupby — nothing dense on the driver."""
    from ray.data.aggregate import Count

    from ..joins import hash_bucket_join

    tf = _doc_token_tf(sf_dir).materialize()
    n_docs = float(_read_docs(sf_dir, columns=("doc_id",)).count())
    df = tf.groupby("token").aggregate(Count(alias_name="df"))
    joined = hash_bucket_join(tf, df, left_on="token", right_on="token")

    def score(t: pa.Table) -> pa.Table:
        s = (t["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
             * np.log(n_docs
                      / t["df"].to_numpy(zero_copy_only=False)
                      .astype(np.float64)))
        return pa.table({"doc_id": t["doc_id"], "token": t["token"],
                         "tfidf": pa.array(np.round(s, 6))})

    def top1(t: pa.Table) -> pa.Table:
        tt = t.to_pandas().sort_values(
            ["tfidf", "token"], ascending=[False, True]).head(1)
        return pa.Table.from_pandas(tt, preserve_index=False)

    out = (joined.map_batches(score, batch_format="pyarrow")
           .groupby("doc_id").map_groups(top1, batch_format="pyarrow")
           .to_pandas())
    out["doc_id"] = out["doc_id"].astype("int64")
    return pa.Table.from_pandas(
        out.sort_values("doc_id").reset_index(drop=True),
        preserve_index=False)


SQL_DOC_TFIDF = f"""
WITH dt AS MATERIALIZED (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, token,
         CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id,
               UNNEST(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS token
        FROM documents)
  GROUP BY doc_id, token),
dfv AS MATERIALIZED (
  SELECT token, CAST(COUNT(*) AS DOUBLE) AS df FROM dt GROUP BY token),
n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
sc AS (
  SELECT dt.doc_id, dt.token, ROUND(dt.tf * ln(n.n / dfv.df), 6) AS tfidf
  FROM dt JOIN dfv USING (token) CROSS JOIN n)
SELECT doc_id, token, tfidf FROM sc
QUALIFY row_number() OVER (
  PARTITION BY doc_id ORDER BY tfidf DESC, token ASC) = 1
ORDER BY doc_id
"""


KEEP_PACK = 1 << 40  # doc_id < 2^40; quality micro-units < 2^21


def q_doc_dedup_keep_best(sf_dir: str) -> pa.Table:
    """The flagship corpus-dedup composite: near-dup clusters (MinHash
    LSH -> exact-Jaccard verify -> components) REDUCED to one surviving
    document each — the member with the highest quality score (ties ->
    lowest doc_id), i.e. what an LLM-data pipeline actually ships.

    Scale shape: clustering reuses the bounded LSH + verify plan
    (verified pairs << docs); the rep map broadcasts once via
    ``ray.put``. Quality is computed in the SAME map pass that assigns
    the group, and the per-group argmax is an integer Max aggregate
    over a packed key ``q6 * 2^40 + (2^40 - 1 - doc_id)`` (quality in
    exact micro-units, doc_id complemented so higher pack == higher
    quality then lower id) — so the wide step is ONE groupby carrying
    two int64s per doc, with map-side combining, and the tie-break is
    bit-deterministic on both the Ray and DuckDB sides."""
    import ray
    from ray.data.aggregate import Count, Max

    verified = pair_jaccards(sf_dir, lsh_candidate_pairs(sf_dir)).filter(
        expr=f"jaccard >= {JACCARD_TAU}"
    ).to_pandas()  # tiny by LSH construction

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in zip(verified["doc_a"], verified["doc_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    rep_ref = ray.put(_rep_arrays({x: find(x) for x in parent}))

    docs = _read_docs(sf_dir)

    def score_assign(t: pa.Table) -> pa.Table:
        rk, rv = ray.get(rep_ref)
        did = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        reps = _map_reps(rk, rv, did)
        _, _, quality = _quality_arrays(t)
        q6 = np.rint(np.round(quality, 6) * 1e6).astype(np.int64)
        pack = q6 * KEEP_PACK + (KEEP_PACK - 1 - did)
        return pa.table({"group_rep": pa.array(reps),
                         "pack": pa.array(pack)})

    agg = (docs.map_batches(score_assign, batch_format="pyarrow")
               .groupby("group_rep")
               .aggregate(Count(alias_name="n_docs"),
                          Max(on="pack", alias_name="pack"))
               .to_pandas())
    pk = agg["pack"].to_numpy().astype(np.int64)
    return pa.table({
        "group_rep": pa.array(agg["group_rep"].astype("int64")),
        "n_docs": pa.array(agg["n_docs"].astype("int64")),
        "kept_doc_id": pa.array(KEEP_PACK - 1 - (pk % KEEP_PACK)),
        "kept_quality": pa.array((pk // KEEP_PACK) / 1e6),
    })


def _dedup_keep_best_sql() -> str:
    ctes = _cand_jac_ctes()
    ctes.append(f"ver AS (SELECT doc_a, doc_b FROM jac "
                f"WHERE jaccard >= {JACCARD_TAU})")
    ctes.append("walk AS (SELECT doc_a AS a, doc_b AS b FROM ver "
                "UNION ALL SELECT doc_b, doc_a FROM ver)")
    ctes.append(
        "reach(d, r) AS (SELECT doc_id, doc_id FROM documents "
        "UNION SELECT w.b, r.r FROM reach r JOIN walk w ON w.a = r.d)")
    ctes.append("grp AS (SELECT CAST(d AS BIGINT) AS doc_id, "
                "CAST(MIN(r) AS BIGINT) AS group_rep FROM reach GROUP BY d)")
    ctes.append(f"""qbase AS (
  SELECT doc_id,
         CAST(length(text) AS DOUBLE) AS n_chars,
         CAST(len(regexp_extract_all(text, '{PUNCT_RE}')) AS DOUBLE) AS punct,
         regexp_extract_all(lower(text), '{TOKEN_RE}') AS toks
  FROM documents)""")
    ctes.append(f"""qual AS (
  SELECT doc_id,
         ROUND(0.4 * (CASE WHEN len(toks) > 0
                 THEN CAST(len(list_filter(toks, x -> x IN ({_STOP_SQL_LIST}))) AS DOUBLE) / len(toks)
                 ELSE 0 END)
             + 0.3 * LEAST(CAST(len(toks) AS DOUBLE), {QUALITY_CAP}) / {QUALITY_CAP}
             + 0.3 * (1.0 - CASE WHEN n_chars > 0 THEN punct / n_chars ELSE 0 END),
           6) AS quality
  FROM qbase)""")
    ctes.append(f"""packed AS (
  SELECT g.group_rep,
         CAST(ROUND(q.quality * 1000000) AS BIGINT) * {KEEP_PACK}
           + ({KEEP_PACK} - 1 - q.doc_id) AS pack
  FROM grp g JOIN qual q ON q.doc_id = g.doc_id)""")
    return ("WITH RECURSIVE " + ",\n".join(ctes) + f"""
SELECT group_rep,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST({KEEP_PACK} - 1 - (MAX(pack) % {KEEP_PACK}) AS BIGINT)
         AS kept_doc_id,
       (MAX(pack) // {KEEP_PACK}) / 1000000.0 AS kept_quality
FROM packed GROUP BY 1""")


SQL_DOC_DEDUP_KEEP_BEST = _dedup_keep_best_sql()


QUERIES = {
    "doc_exact_dedup": q_doc_exact_dedup,
    "doc_token_count": q_doc_token_count,
    "doc_quality": q_doc_quality,
    "doc_langid": q_doc_langid,
    "doc_minhash_dedup": q_doc_minhash_dedup,
    "doc_simhash": q_doc_simhash,
    "doc_ngram_jaccard": q_doc_ngram_jaccard,
    "doc_fingerprint": q_doc_fingerprint,
    "doc_vocab": q_doc_vocab,
    "doc_top_terms": q_doc_top_terms,
    "doc_scrub": q_doc_scrub,
    "doc_hll_vocab": q_doc_hll_vocab,
    "doc_tfidf": q_doc_tfidf,
    "doc_dedup_keep_best": q_doc_dedup_keep_best,
}

ORACLES = {
    "doc_exact_dedup": SQL_DOC_EXACT_DEDUP,
    "doc_token_count": SQL_DOC_TOKEN_COUNT,
    "doc_quality": SQL_DOC_QUALITY,
    "doc_langid": SQL_DOC_LANGID,
    "doc_vocab": SQL_DOC_VOCAB,
    "doc_tfidf": SQL_DOC_TFIDF,
    "doc_top_terms": SQL_DOC_TOP_TERMS,
    "doc_fingerprint": SQL_DOC_FINGERPRINT,
    "doc_simhash": SQL_DOC_SIMHASH,
    "doc_ngram_jaccard": SQL_DOC_NGRAM_JACCARD,
    "doc_minhash_dedup": SQL_DOC_MINHASH_DEDUP,
    "doc_scrub": SQL_DOC_SCRUB,
    "doc_hll_vocab": SQL_DOC_HLL_VOCAB,
    "doc_dedup_keep_best": SQL_DOC_DEDUP_KEEP_BEST,
}
