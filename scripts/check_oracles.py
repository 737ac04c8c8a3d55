"""Run the in-repo DuckDB differential gate for selected queries at a given
scale factor — the builder-side replica of the driver's t2 correctness run.

Usage:
    python scripts/check_oracles.py [--sf /root/testdata/sf0.01] [name ...]
    python scripts/check_oracles.py --first N     # registry run-order prefix
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--first", type=int, default=0)
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from horaedb_spark.core.session import get_spark
    from horaedb_spark.queries.oracle import compare_query, duckdb_connection
    from horaedb_spark.queries.registry import QUERIES, queries_map

    ordered = queries_map()  # registration + driver run order
    if args.names:
        names = args.names
    elif args.first:
        names = list(ordered)[: args.first]
    else:
        names = list(ordered)

    spark = get_spark(app_name="oracle_check")
    con = duckdb_connection(args.sf)
    failed = []
    for name in names:
        q = QUERIES[name]
        t0 = time.time()
        try:
            if q.oracle is None:
                n = q.fn(spark, args.sf).count()
                ok, detail = True, f"rows_only n={n}"
            else:
                r = compare_query(q.fn(spark, args.sf), q.oracle, con, name)
                ok, detail = r.ok, r.detail
        except Exception as e:  # noqa: BLE001 - report and continue
            ok, detail = False, f"ERROR {type(e).__name__}: {e}"
        dt = time.time() - t0
        status = "ok " if ok else "FAIL"
        print(f"{status} {name} ({dt:.1f}s) {'' if ok else detail[:400]}", flush=True)
        if not ok:
            failed.append(name)
    print(f"\n{len(names) - len(failed)}/{len(names)} green at {args.sf}")
    if failed:
        print("failed:", " ".join(failed))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
