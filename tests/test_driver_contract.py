"""Driver-contract simulation: queries() vs oracle_sql() through DuckDB.

Mirrors what the graft driver does at sf=0.01, but at sf=0.001 for test
runtime: row count + schema-name + value equality (order-insensitive).
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def contract():
    import __ray_entry__ as E

    return E.queries(), E.oracle_sql()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF, f"{t}.parquet")
        if os.path.exists(p):
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return c


def _compare(got, want):
    if hasattr(got, "to_pandas"):
        got = got.to_pandas()
    assert len(got) == len(want), (len(got), len(want))
    assert sorted(got.columns) == sorted(want.columns)
    cols = sorted(got.columns)
    gv = got[cols].sort_values(cols).reset_index(drop=True)
    wv = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(gv, wv, check_dtype=False, check_exact=False,
                                  rtol=0, atol=1e-9)


def test_oracle_queries_match(contract, con):
    queries, oracles = contract
    checked = 0
    for name, sql in oracles.items():
        got = queries[name](SF)
        want = con.execute(sql).df()
        _compare(got, want)
        checked += 1
    assert checked >= 8


def test_rows_only_queries_run(contract):
    queries, oracles = contract
    for name, fn in queries.items():
        if name in oracles:
            continue
        got = fn(SF)
        if hasattr(got, "to_pandas"):
            got = got.to_pandas()
        assert len(got) >= 0


def test_entry_returns_rows():
    import __ray_entry__ as E

    out = E.entry()
    if hasattr(out, "to_pandas"):
        out = out.to_pandas()
    assert len(out) > 0
    assert set(out.columns) == {"key", "val"}