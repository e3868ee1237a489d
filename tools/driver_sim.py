"""Simulate the round driver's correctness gate locally.

Runs in a FRESH process (owns its Ray session, like the driver):
  ray.init(num_cpus=N)  ->  import __ray_entry__  ->  entry() smoke
  ->  every queries() entry at sf0.01  ->  DuckDB oracle compare
(row count + sorted-column, order-insensitive value hash), recording
per-query pass/fail + wall time to a JSON file.

The point of running at num_cpus=32 (the driver's level) rather than the
test fixture's 4: partition counts derive from cluster width, and round 2
shipped a bug (`jaccard_dedup_docs` rename_columns crash) that only
reproduced at >=16 partitions. This sweep is the pre-flight that catches
that class before the driver does.

Usage:
    python tools/driver_sim.py [--sf-dir /root/testdata/sf0.01]
        [--num-cpus 32] [--out /tmp/driver_sim.json] [--only name1,name2]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time
import traceback

# `python tools/driver_sim.py` puts tools/ at sys.path[0]; the entry
# module lives at the repo root, exactly where the driver imports it from.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _to_pandas(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            # driver-style value hash: round floats so 1e-12 jitter
            # doesn't flip the digest
            df[c] = np.round(df[c].astype("float64"), 6)
    return df


def _hash(df: pd.DataFrame) -> str:
    payload = df.to_csv(index=False).encode()
    return hashlib.sha256(payload).hexdigest()[:16]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--num-cpus", type=int, default=32)
    ap.add_argument("--out", default="/tmp/driver_sim.json")
    ap.add_argument("--only", default="", help="comma-separated query names")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
        )

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    results: dict[str, dict] = {}

    # entry() smoke, exactly as the driver does
    t0 = time.monotonic()
    try:
        ent = entrymod.entry()
        edf = _to_pandas(ent)
        results["__entry__"] = {
            "ok": len(edf) >= 0,
            "rows": int(len(edf)),
            "sec": round(time.monotonic() - t0, 2),
        }
    except Exception:
        results["__entry__"] = {"ok": False, "err": traceback.format_exc()}

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = sorted(queries)
    if args.only:
        names = [n for n in names if n in set(args.only.split(","))]

    n_pass = n_fail = n_rows_only = 0
    for name in names:
        t0 = time.monotonic()
        rec: dict = {}
        try:
            ray_df = _normalize(_to_pandas(queries[name](args.sf_dir)))
            rec["rows"] = int(len(ray_df))
            if name in oracles:
                sql_df = _normalize(con.execute(oracles[name]).fetchdf())
                rec["oracle_rows"] = int(len(sql_df))
                rec["rows_match"] = len(ray_df) == len(sql_df)
                rec["schema_match"] = list(ray_df.columns) == list(sql_df.columns)
                rec["hash_match"] = (
                    rec["rows_match"]
                    and rec["schema_match"]
                    and _hash(ray_df) == _hash(sql_df)
                )
                ok = rec["hash_match"]
                if not ok and rec["rows_match"] and rec["schema_match"]:
                    # pin down the first differing cell for debugging
                    try:
                        diff = (ray_df != sql_df) & ~(
                            ray_df.isna() & sql_df.isna()
                        )
                        loc = list(zip(*np.where(diff)))[:3]
                        rec["first_diffs"] = [
                            {
                                "row": int(r),
                                "col": ray_df.columns[c],
                                "ray": str(ray_df.iat[r, c]),
                                "sql": str(sql_df.iat[r, c]),
                            }
                            for r, c in loc
                        ]
                    except Exception:
                        pass
            else:
                rec["no_oracle"] = True
                ok = True
                n_rows_only += 1
        except Exception:
            rec["err"] = traceback.format_exc(limit=8)
            ok = False
        rec["sec"] = round(time.monotonic() - t0, 2)
        rec["ok"] = ok
        results[name] = rec
        n_pass += ok
        n_fail += not ok
        status = "ok" if ok else "FAIL"
        extra = " (rows-only)" if rec.get("no_oracle") else ""
        print(f"[{status}] {name} {rec['sec']}s{extra}", flush=True)

    summary = {
        "num_cpus": args.num_cpus,
        "sf_dir": args.sf_dir,
        "n_queries": len(names),
        "n_pass": n_pass,
        "n_fail": n_fail,
        "n_rows_only": n_rows_only,
        "failures": [n for n in names if not results[n]["ok"]],
    }
    with open(args.out, "w") as f:
        json.dump({"summary": summary, "results": results}, f, indent=1)
    print(json.dumps(summary), flush=True)

    ray.shutdown()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
