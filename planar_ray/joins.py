"""Partitioned hash join as a pure Ray-Data composition.

``Dataset.join`` in this Ray release spins up a fixed fleet of
``HashShuffleAggregator`` actors that must ALL be scheduled before any
progress — on a small/busy cluster that deadlocks against concurrently
running actor pools. This module implements the portable pattern instead
(explicit partitioned hash join, cf. the Ray Data user guide's joins
section): add ``bucket = hash(key) % B`` to both sides, union them with a
side tag, one ``groupby('bucket')`` sort-shuffle, and a vectorised pandas
merge per bucket. No fixed actor fleet, no deadlock, deterministic
output; B bounds the number of per-group Python calls, and each bucket's
merge is a single vectorised pandas hash join.

Skew note: a hot join key salts naturally across buckets only if the key
itself varies; for the engine's uses (vertex-dict resolution, triangle
wedge closing) keys are near-uniform hashes already.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from .util import h64_bytes_vec, splitmix64

DEFAULT_BUCKETS = 64
MAX_SHUFFLE_BLOCKS = 64  # sort tasks scale with input blocks; cap overhead


def coalesce(ds: Dataset, max_blocks: int = MAX_SHUFFLE_BLOCKS) -> Dataset:
    """Materialize + cap the block count before an all-to-all.

    Ray's sort shuffle launches O(blocks) map AND reduce tasks; a table
    that arrives as hundreds of tiny blocks (e.g. out of a previous
    64-bucket join) pays ~10 ms of per-task overhead x 2 x blocks —
    measured 6.6 s of an 8.4 s join on 336 k rows. Coalescing to
    ``max_blocks`` first costs one cheap concat pass and caps the task
    count. On a multi-node cluster scale max_blocks with total cores.
    """
    ds = ds.materialize()
    if ds.num_blocks() > max_blocks:
        ds = ds.repartition(max_blocks).materialize()
    return ds


def _bucket_of(col: pa.ChunkedArray | pa.Array, buckets: int) -> np.ndarray:
    if pa.types.is_integer(col.type):
        v = col.to_numpy(zero_copy_only=False).astype(np.uint64)
        # shared splitmix64 scramble so range-clustered ids spread evenly
        return (splitmix64(v) % np.uint64(buckets)).astype(np.int64)
    return (h64_bytes_vec(col.to_pylist(), "join") % buckets).astype(np.int64)


def _with_schema(ds: Dataset):
    """(possibly-materialized ds, schema) without double execution."""
    s = ds.schema(fetch_if_missing=False)
    if s is None:
        ds = ds.materialize()
        s = ds.schema()
        if s is None:
            raise ValueError(
                "join side is empty with no derivable schema — an "
                "upstream filter/groupby produced zero rows")
    return ds, s


def hash_bucket_join(
    left: Dataset,
    right: Dataset,
    left_on: str,
    right_on: str,
    buckets: int = DEFAULT_BUCKETS,
    how: str = "inner",
) -> Dataset:
    """Join two datasets on a single key column (string or integer).

    ``how``: "inner" / "left" emit all left columns + all right columns
    except ``right_on`` (joined value columns must not collide by
    name). "semi" / "anti" are membership-only: the right side is
    reduced to its key column before the exchange and the output
    carries LEFT columns only (anti = left rows with NO right match).
    """

    # .schema(fetch_if_missing=True) on a lazy plan EXECUTES it (fully, if
    # an all-to-all sits upstream) and the real run then re-executes it —
    # chained joins would pay 2-3x. When the schema isn't statically
    # known, materialize ONCE and reuse the blocks.
    left, lschema = _with_schema(left)
    right, rschema = _with_schema(right)
    if how in ("semi", "anti"):
        # membership-only: ship just the key column from the right side
        right = right.map_batches(
            lambda t, _k=right_on: t.select([_k]), batch_format="pyarrow")
        rtype = dict(zip(rschema.names, rschema.types))[right_on]
        rschema = pa.schema([(right_on, rtype)])
    lnames = list(lschema.names)
    rnames = list(rschema.names)
    ltypes = dict(zip(lschema.names, lschema.types))
    rtypes = dict(zip(rschema.names, rschema.types))
    overlap = (set(lnames) - {left_on}) & (set(rnames) - {right_on})
    if overlap:
        raise ValueError(f"join value columns collide: {overlap}")

    def tag(side: str, key: str):
        def fn(t: pa.Table) -> pa.Table:
            b = _bucket_of(t[key].combine_chunks(), buckets)
            out = t.append_column("__bucket", pa.array(b))
            return out.append_column("__side", pa.array([side] * len(t)))
        return fn

    lt = left.map_batches(tag("l", left_on), batch_format="pyarrow")
    rt = right.map_batches(tag("r", right_on), batch_format="pyarrow")

    # align schemas for union: both sides emit the SAME column order, with
    # nulls for the other side's value columns
    ordered = lnames + [n for n in rnames if n not in lnames] + ["__bucket", "__side"]
    types = dict(ltypes)
    for n, t in rtypes.items():
        types.setdefault(n, t)

    def pad(fn_names: list[str]):
        have = set(fn_names) | {"__bucket", "__side"}

        def fn(t: pa.Table) -> pa.Table:
            data = {}
            for n in ordered:
                data[n] = t[n] if n in have else pa.nulls(len(t), types[n])
            return pa.table(data)

        return fn

    lt = lt.map_batches(pad(lnames), batch_format="pyarrow")
    rt = rt.map_batches(pad(rnames), batch_format="pyarrow")

    out_r_cols = [n for n in rnames if n != right_on]

    out_schema = pa.schema(
        [(n, types[n]) for n in lnames] + [(n, rtypes[n]) for n in out_r_cols]
    )

    arrow_how = {"inner": "inner", "left": "left outer",
                 "semi": "left semi", "anti": "left anti"}[how]

    # Acero's hash join rejects NESTED (list/struct) non-key columns —
    # e.g. the shingle-set payloads of the minhash verify path. Detach
    # them before the join and re-attach by row-index take afterwards.
    nested_l = [n for n in lnames
                if n != left_on and pa.types.is_nested(types[n])]
    nested_r = [n for n in out_r_cols if pa.types.is_nested(rtypes[n])]

    def merge(group: pa.Table) -> pa.Table:
        # split sides while still Arrow and join with Arrow's hash join:
        # no pandas transit, so (a) int64 keys/values never pass through
        # float64 (silent precision loss above 2^53 — e.g. triangle pair
        # keys y*V+z and MST ekeys at large V), (b) outer-join nulls stay
        # typed nullable int64 instead of widening to float, and (c) keys
        # with embedded NUL bytes hash on their full buffers (pandas'
        # string hash table compares C strings and truncates at NUL).
        import pyarrow.compute as pc
        lmask = pc.equal(group["__side"], "l")
        gl = group.filter(lmask).select(lnames).combine_chunks()
        gr = group.filter(pc.invert(lmask)).select(rnames).combine_chunks()
        flat_l = [n for n in lnames if n not in nested_l]
        flat_r = [n for n in rnames if n not in nested_r]
        jl, jr = gl.select(flat_l), gr.select(flat_r)
        if nested_l:
            jl = jl.append_column(
                "__li", pa.array(np.arange(len(gl), dtype=np.int64)))
        if nested_r:
            jr = jr.append_column(
                "__ri", pa.array(np.arange(len(gr), dtype=np.int64)))
        merged = jl.join(jr, keys=[left_on], right_keys=[right_on],
                         join_type=arrow_how)
        # re-attach nested payloads: take by originating row index
        # (a left-outer null index takes a null row, matching Acero)
        for n in nested_l:
            merged = merged.append_column(n, pc.take(gl[n], merged["__li"]))
        for n in nested_r:
            merged = merged.append_column(n, pc.take(gr[n], merged["__ri"]))
        # no row-order sort: row order inside a block is not semantic —
        # every consumer either aggregates or sorts on its own keys
        return merged.select(lnames + out_r_cols).cast(out_schema)

    # materialize + coalesce the tagged union BEFORE the sort shuffle —
    # the sort's sampling pass re-executes a lazy upstream map, and its
    # task count scales with input blocks (see coalesce)
    return coalesce(lt.union(rt)).groupby("__bucket").map_groups(
        merge, batch_format="pyarrow"
    )


def asof_bucket_join(
    left: Dataset,
    right: Dataset,
    left_by: str,
    right_by: str,
    left_ts: str,
    right_ts: str,
    buckets: int = DEFAULT_BUCKETS,
    right_tiebreak: str | None = None,
) -> Dataset:
    """Distributed point-in-time (as-of) join: for each left row, the
    single right row sharing its key with the greatest ``right_ts`` <=
    ``left_ts`` (DuckDB/pandas "backward" semantics, inner flavour —
    left rows with no preceding right row are dropped).

    Same scale shape as :func:`hash_bucket_join`: both sides tagged with
    ``hash(key) % buckets`` so a key's full history co-locates, ONE
    ``groupby('bucket')`` sort-shuffle total, then each bucket runs one
    vectorised ``pandas.merge_asof`` (a C merge over the two ts-sorted
    sides). Skewed keys are bounded by per-key history size, not bucket
    count — a single key's rows must fit one group, the same contract as
    sessionization.

    Determinism requires the right side be unique per (key, ts): if two
    right rows tie on both, "the" as-of row is ambiguous. Pass
    ``right_tiebreak`` to keep the row with the MINIMUM value of that
    column per (key, ts) — free inside the bucket merge, since a key's
    rows are already co-located (SQL twin: ``row_number() over
    (partition by key, ts order by tiebreak) = 1``).
    """
    left, lschema = _with_schema(left)
    right, rschema = _with_schema(right)
    lnames = list(lschema.names)
    rnames = list(rschema.names)
    overlap = (set(lnames)) & (set(rnames))
    if overlap:
        raise ValueError(f"asof join columns collide: {overlap}")

    def tag(side: str, key: str):
        def fn(t: pa.Table) -> pa.Table:
            b = _bucket_of(t[key].combine_chunks(), buckets)
            out = t.append_column("__bucket", pa.array(b))
            return out.append_column("__side", pa.array([side] * len(t)))
        return fn

    lt = left.map_batches(tag("l", left_by), batch_format="pyarrow")
    rt = right.map_batches(tag("r", right_by), batch_format="pyarrow")

    types = dict(zip(lschema.names, lschema.types))
    types.update(zip(rschema.names, rschema.types))
    ordered = lnames + rnames + ["__bucket", "__side"]

    def pad(have_names: list[str]):
        have = set(have_names) | {"__bucket", "__side"}

        def fn(t: pa.Table) -> pa.Table:
            return pa.table({n: (t[n] if n in have
                                 else pa.nulls(len(t), types[n]))
                             for n in ordered})

        return fn

    lt = lt.map_batches(pad(lnames), batch_format="pyarrow")
    rt = rt.map_batches(pad(rnames), batch_format="pyarrow")

    out_schema = pa.schema([(n, types[n]) for n in lnames + rnames])

    def merge(group: pa.Table) -> pa.Table:
        import pandas as pd
        import pyarrow.compute as pc

        lmask = pc.equal(group["__side"], "l")
        gl = group.filter(lmask).select(lnames).to_pandas()
        gr = group.filter(pc.invert(lmask)).select(rnames).to_pandas()
        if not len(gl) or not len(gr):
            return out_schema.empty_table()
        gl = gl.sort_values(left_ts, kind="stable")
        if right_tiebreak is not None:
            gr = gr.sort_values([right_by, right_ts, right_tiebreak],
                                kind="stable")
            gr = gr.drop_duplicates([right_by, right_ts], keep="first")
        gr = gr.sort_values(right_ts, kind="stable")
        m = pd.merge_asof(gl, gr, left_on=left_ts, right_on=right_ts,
                          left_by=left_by, right_by=right_by,
                          direction="backward", allow_exact_matches=True)
        m = m[m[right_ts].notna()]  # inner: drop left rows with no match
        return pa.Table.from_pandas(m, preserve_index=False).select(
            lnames + rnames).cast(out_schema)

    return coalesce(lt.union(rt)).groupby("__bucket").map_groups(
        merge, batch_format="pyarrow"
    )
