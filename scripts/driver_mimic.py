"""Driver-mimic: run the first-50 queries() window side-by-side with DuckDB.

Mirrors the external graft driver contract (fresh process, ray.init owned
here, hash-exact compare for oracled queries, rows-only otherwise).
Usage: [MIMIC_SF=/root/testdata/sf0.1] python scripts/driver_mimic.py

Resume/record knobs (for the long sf1 sweeps, where one DuckDB oracle can
take 20+ min and the host can die mid-run):
  MIMIC_SKIP=N    skip the first N window entries (already verified)
  MIMIC_LIMIT=N   run at most N entries after the skip (slice the window
                  across processes / survive host restarts)
  MIMIC_JSON=path append one JSON line per query {name,status,rows,sec}"""
import os, sys, time
os.environ.setdefault("RAY_DATA_DISABLE_PROGRESS_BARS", "1")
import ray
ray.init(address="local", num_cpus=int(os.environ.get("MIMIC_CPUS", "8")),
         include_dashboard=False, logging_level="ERROR", log_to_driver=False)
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
sys.path.insert(0, "/root/repo")
import importlib.util
spec = importlib.util.spec_from_file_location("__ray_entry__", "/root/repo/__ray_entry__.py")
m = importlib.util.module_from_spec(spec); spec.loader.exec_module(m)

import duckdb, pandas as pd, numpy as np, pyarrow as pa

SF = os.environ.get("MIMIC_SF", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

def to_pd(r):
    import ray.data
    if isinstance(r, ray.data.Dataset):
        return r.to_pandas()
    if isinstance(r, pa.Table):
        return r.to_pandas()
    return r

def canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)

ent = m.entry()
print(f"entry(): {len(ent)} rows, cols={list(ent.columns)[:6]}...")
qs, oracles = m.queries(), m.oracle_sql()
win = list(qs)[:50]
skip = int(os.environ.get("MIMIC_SKIP", "0"))
if skip:
    print(f"(skipping first {skip} window entries, already verified)")
    win = win[skip:]
limit = int(os.environ.get("MIMIC_LIMIT", "0"))
if limit:
    print(f"(running {limit} entries: slice [{skip}, {skip + limit}))")
    win = win[:limit]
jpath = os.environ.get("MIMIC_JSON")
def record(name, status, rows, sec):
    if jpath:
        import json
        with open(jpath, "a") as f:
            f.write(json.dumps({"name": name, "status": status,
                                "rows": rows, "sec": round(sec, 2)}) + "\n")
fails = []
for name in win:
    t0 = time.time()
    try:
        rdf = to_pd(qs[name](SF))
        if name in oracles:
            odf = con.execute(oracles[name]).fetchdf()
            assert sorted(rdf.columns) == sorted(odf.columns), f"cols {sorted(rdf.columns)} vs {sorted(odf.columns)}"
            assert len(rdf) == len(odf), f"rows {len(rdf)} vs {len(odf)}"
            a, b = canon(rdf), canon(odf)
            for c in a.columns:
                av, bv = a[c].to_numpy(), b[c].to_numpy()
                if np.issubdtype(np.asarray(av).dtype, np.floating) or np.issubdtype(np.asarray(bv).dtype, np.floating):
                    assert np.allclose(av.astype(float), bv.astype(float), rtol=0, atol=1e-9, equal_nan=True), f"values col {c}"
                else:
                    assert (av == bv).all(), f"values col {c}"
            status = "oracle-match"
        else:
            assert rdf is not None and len(rdf.columns) > 0
            status = "rows-only"
        print(f"  {name}: {status} ({len(rdf)} rows, {time.time()-t0:.1f}s)", flush=True)
        record(name, status, len(rdf), time.time() - t0)
    except Exception as ex:
        fails.append((name, str(ex)[:200]))
        print(f"  {name}: FAIL {str(ex)[:200]}", flush=True)
        record(name, "FAIL", -1, time.time() - t0)
print(f"\n{len(win)-len(fails)}/{len(win)} pass; fails={fails}")
ray.shutdown()
sys.exit(1 if fails else 0)
