"""Mimic the round driver's correctness gate EXACTLY, under a wall-clock
budget, so a silent gate failure (round 2's empty CORRECTNESS file) cannot
recur unnoticed.

Protocol (same as the driver): fresh ``ray.init(address="local")``, import
``__ray_entry__``, run ``entry()`` once, then every ``queries()`` entry at
the given sf dir; for entries with an ``oracle_sql()`` twin, run the SQL in
DuckDB over the same parquet views and compare row count, sorted column
names, and an order-insensitive round-6 value hash.  Results are written
incrementally to a JSON file (default /tmp/driver_smoke.json) so a crash
mid-pass still leaves a partial record — the failure mode that produced
``CORRECTNESS_r02.json == {}``.

Usage:
    python scripts/driver_smoke.py [sf_dir] [--budget SECONDS] [--out FILE]

Exit status: 0 iff every query ran, every oracle compared clean, and the
whole pass fit the budget.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import sys
import time

import duckdb
import pandas as pd

import ray

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return hashlib.md5(df.to_csv(index=False).encode()).hexdigest()


def to_pandas(res) -> pd.DataFrame:
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    if hasattr(res, "to_pydict"):
        return pd.DataFrame(res.to_pydict())
    return res


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument("--budget", type=float, default=600.0,
                    help="wall-clock budget in seconds for the WHOLE pass")
    ap.add_argument("--out", default="/tmp/driver_smoke.json")
    ap.add_argument("--num-cpus", type=int, default=32)
    args = ap.parse_args()

    t_start = time.time()
    ray.init(address="local", num_cpus=args.num_cpus,
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    record: dict[str, dict] = {}

    def flush() -> None:
        with open(args.out, "w") as f:
            json.dump(record, f, indent=2)

    # entry() smoke: runs and yields >=0 rows with a stable schema
    t0 = time.time()
    try:
        eres = to_pandas(entrymod.entry())
        record["__entry__"] = {
            "rows": int(len(eres)),
            "columns": sorted(map(str, eres.columns)),
            "sec": round(time.time() - t0, 2),
            "err": None,
        }
    except Exception as e:  # noqa: BLE001 - smoke harness records everything
        record["__entry__"] = {"rows": None, "sec": round(time.time() - t0, 2),
                               "err": f"{type(e).__name__}: {e}"}
    flush()

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_bad = 0
    for name, fn in qs.items():
        row: dict = {"rows_match": None, "schema_match": None,
                     "hash_match": None, "spark_rows": None,
                     "oracle_rows": None, "err": None}
        t0 = time.time()
        try:
            res = to_pandas(fn(args.sf_dir))
            row["spark_rows"] = int(len(res))
            row["query_sec"] = round(time.time() - t0, 2)
            if name in oracles:
                t1 = time.time()
                ora = con.execute(oracles[name]).df()
                row["oracle_sec"] = round(time.time() - t1, 2)
                row["oracle_rows"] = int(len(ora))
                row["rows_match"] = len(res) == len(ora)
                row["schema_match"] = sorted(res.columns) == sorted(ora.columns)
                row["hash_match"] = (
                    row["rows_match"] and row["schema_match"]
                    and norm_hash(res.copy()) == norm_hash(ora.copy())
                )
                if not row["hash_match"]:
                    n_bad += 1
            else:
                row["err"] = "no_oracle"
        except Exception as e:  # noqa: BLE001
            row["err"] = f"{type(e).__name__}: {e}"
            row["query_sec"] = round(time.time() - t0, 2)
            n_bad += 1
        record[name] = row
        flush()
        status = ("PASS" if row["hash_match"]
                  else "rows" if row["err"] == "no_oracle" and row["spark_rows"] is not None
                  else "FAIL")
        print(f"{status:5} {name:28} {row.get('query_sec', 0):6.1f}s query"
              f" {row.get('oracle_sec', 0):6.1f}s oracle"
              + (f"  [{row['err']}]" if row["err"] not in (None, "no_oracle") else ""))
        if time.time() - t_start > args.budget:
            print(f"BUDGET EXCEEDED at {name}: "
                  f"{time.time() - t_start:.0f}s > {args.budget:.0f}s")
            flush()
            ray.shutdown()
            return 2

    total = time.time() - t_start
    n_hash = sum(1 for r in record.values() if r.get("hash_match"))
    n_rows_only = sum(1 for r in record.values() if r.get("err") == "no_oracle")
    print(f"\n{len(qs)} queries: {n_hash} hash-green, {n_rows_only} rows-only, "
          f"{n_bad} bad; total {total:.0f}s (budget {args.budget:.0f}s)")
    flush()
    ray.shutdown()
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
