"""Dev harness mimicking the driver's correctness gate: run every
queries() entry at sf0.01, compare SQL-expressible ones against DuckDB
(row count, column names, order-insensitive value hash)."""

import hashlib
import sys
import time

import duckdb
import pandas as pd

import ray

ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

sys.path.insert(0, "/root/repo")
import __ray_entry__ as entrymod

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")


def norm(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return hashlib.md5(df.to_csv(index=False).encode()).hexdigest()


qs = entrymod.queries()
oracles = entrymod.oracle_sql()
only = sys.argv[2:] or list(qs)
ok = bad = 0
for name in only:
    fn = qs[name]
    t0 = time.time()
    try:
        res = fn(SF_DIR)
        if hasattr(res, "to_pandas"):
            res = res.to_pandas()
        elif hasattr(res, "to_pydict"):
            res = pd.DataFrame(res.to_pydict())
        el = time.time() - t0
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {e}")
        bad += 1
        continue
    if name in oracles:
        ora = con.execute(oracles[name]).df()
        rc = "OK" if len(res) == len(ora) else f"ROWS {len(res)} vs {len(ora)}"
        sc = "OK" if sorted(res.columns) == sorted(ora.columns) else (
            f"SCHEMA {sorted(res.columns)} vs {sorted(ora.columns)}"
        )
        vh = "OK" if norm(res.copy()) == norm(ora.copy()) else "VALUE-HASH MISMATCH"
        status = "PASS" if (rc, sc, vh) == ("OK", "OK", "OK") else f"{rc}; {sc}; {vh}"
    else:
        status = f"rows-only ({len(res)} rows)"
    good = status == "PASS" or status.startswith("rows-only")
    ok += good
    bad += not good
    print(f"{'PASS' if good else 'FAIL':4} {name:24} {status}  [{el:.1f}s]")

print(f"\n{ok} ok, {bad} bad")
ray.shutdown()
sys.exit(1 if bad else 0)
