"""Full driver-contract simulation: run EVERY queries() entry at
$GRAFT_SF_DIR (default sf0.01);
compare against oracle_sql() where present (rows + schema + values),
rows-only otherwise. Expect fails=[]."""
import os
import sys
import time

# repo root on the path AND in PYTHONPATH *before* ray.init, so the
# raylet's worker processes (which inherit this env) can deserialize
# planar_ray closures — sys.path alone only fixes the driver
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ["PYTHONPATH"] = (_ROOT + os.pathsep
                            + os.environ.get("PYTHONPATH", ""))

import ray

ray.init(address="local", num_cpus=32, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False
import duckdb
import numpy as np
import pandas as pd

import __ray_entry__ as E

SF = __import__("os").environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.01")
qs, osql = E.queries(), E.oracle_sql()
con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

fails, oracle_ok, rows_only = [], 0, 0
t_all = time.time()
for name, fn in sorted(qs.items()):
    t0 = time.time()
    try:
        got = fn(SF)
        got = got.to_pandas() if not isinstance(got, pd.DataFrame) else got
    except Exception as ex:
        fails.append((name, f"query raised: {ex!r}"))
        print(f"FAIL {name}: {ex!r}", flush=True)
        continue
    if name not in osql:
        rows_only += 1
        print(f"rows_only {name}: {len(got)} rows  {time.time()-t0:.1f}s",
              flush=True)
        continue
    try:
        want = con.sql(osql[name]).df()
        cols = sorted(got.columns)
        if sorted(want.columns) != cols:
            raise AssertionError(f"schema {cols} != {sorted(want.columns)}")
        g = got[cols].sort_values(cols).reset_index(drop=True)
        w = want[cols].sort_values(cols).reset_index(drop=True)
        if len(g) != len(w):
            raise AssertionError(f"rows {len(g)} != {len(w)}")
        pd.testing.assert_frame_equal(g, w, check_dtype=False,
                                      check_exact=False, rtol=1e-6,
                                      atol=1e-9)
        oracle_ok += 1
        print(f"oracle_ok {name}: {len(g)} rows  {time.time()-t0:.1f}s",
              flush=True)
    except Exception as ex:
        fails.append((name, str(ex)[:200]))
        print(f"FAIL {name}: {str(ex)[:200]}", flush=True)

ent = E.entry()
n_ent = ent.count() if hasattr(ent, "count") else len(ent)
print(f"entry() rows: {n_ent}")
print(f"TOTAL {len(qs)} queries: oracle_ok={oracle_ok} rows_only={rows_only} "
      f"fails={fails}  {time.time()-t_all:.0f}s")
ray.shutdown()
