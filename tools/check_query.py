"""Single-query driver-contract check: ``python tools/check_query.py
name [name ...]`` runs just those queries() entries against their
oracle at $GRAFT_SF_DIR (default sf0.01). Fast iteration companion to
sim_driver.py (which runs the whole surface)."""
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ["PYTHONPATH"] = (_ROOT + os.pathsep
                            + os.environ.get("PYTHONPATH", ""))

import ray

ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 16)),
         include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False
import duckdb
import pandas as pd

import __ray_entry__ as E

SF = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.01")
qs, osql = E.queries(), E.oracle_sql()
con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

rc = 0
for name in sys.argv[1:]:
    t0 = time.time()
    got = qs[name](SF)
    got = got.to_pandas() if not isinstance(got, pd.DataFrame) else got
    if name not in osql:
        print(f"rows_only {name}: {len(got)} rows  {time.time()-t0:.1f}s")
        continue
    try:
        want = con.sql(osql[name]).df()
        cols = sorted(got.columns)
        assert sorted(want.columns) == cols, \
            f"schema {cols} != {sorted(want.columns)}"
        g = got[cols].sort_values(cols).reset_index(drop=True)
        w = want[cols].sort_values(cols).reset_index(drop=True)
        assert len(g) == len(w), f"rows {len(g)} != {len(w)}"
        pd.testing.assert_frame_equal(g, w, check_dtype=False,
                                      check_exact=False, rtol=1e-6,
                                      atol=1e-9)
        print(f"oracle_ok {name}: {len(g)} rows  {time.time()-t0:.1f}s")
    except Exception as ex:
        print(f"FAIL {name}: {str(ex)[:400]}")
        rc = 1
ray.shutdown()
sys.exit(rc)
