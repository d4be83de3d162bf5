import os, sys, time
_ROOT = "/root/repo"
sys.path.insert(0, _ROOT)
os.environ["PYTHONPATH"] = _ROOT + os.pathsep + os.environ.get("PYTHONPATH", "")
import ray
ray.init(address="local", num_cpus=16, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
import duckdb, numpy as np, pandas as pd
import __ray_entry__ as E
SF = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.01")
qs, osql = E.queries(), E.oracle_sql()
con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events documents embeddings").split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
bad = []
for name, sql in sorted(osql.items()):
    t0 = time.time()
    got = qs[name](SF)
    got = got.to_pandas() if not isinstance(got, pd.DataFrame) else got
    want = con.sql(sql).df()
    cols = sorted(got.columns)
    if sorted(want.columns) != cols:
        print(f"{name}: SCHEMA {cols} vs {sorted(want.columns)}", flush=True)
        bad.append(name)
        continue
    g = got[cols].sort_values(cols).reset_index(drop=True)
    w = want[cols].sort_values(cols).reset_index(drop=True)
    status = "exact"
    if len(g) != len(w):
        status = f"ROWS {len(g)} vs {len(w)}"
    else:
        for c in cols:
            gv, wv = g[c].to_numpy(), w[c].to_numpy()
            if gv.dtype.kind == "f" or wv.dtype.kind == "f":
                eq = (gv == wv) | (np.isnan(gv.astype(float)) & np.isnan(wv.astype(float)))
            else:
                eq = gv == wv
            if not np.asarray(eq).all():
                n = int((~np.asarray(eq)).sum())
                i = int(np.flatnonzero(~np.asarray(eq))[0])
                status = f"DIFF col={c} n={n} e.g. {gv[i]!r} vs {wv[i]!r}"
                break
    print(f"{name}: {status}  {time.time()-t0:.1f}s", flush=True)
    if status != "exact":
        bad.append(name)
print("STRICT_BAD:", bad)
ray.shutdown()
