"""Pre-flight the driver's correctness gate locally.

Runs every registered query at a given SF dir (default sf0.01 — the
driver's certification scale) and compares against its DuckDB oracle the
same way the driver does: row count, sorted column names, order-insensitive
normalized values. Prints one status line per query and a final summary.

Usage: python tools/verify_all.py [--sf /root/testdata/sf0.01] [name ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from machine_learning_with_spark_streaming_spark.schemas import TESTDATA_TABLES  # noqa: E402
from machine_learning_with_spark_streaming_spark.session import get_session  # noqa: E402
from machine_learning_with_spark_streaming_spark.testing import (  # noqa: E402
    oracle_type_violations,
    rowset as _rowset,
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--shuffle", type=int, default=16,
        help="spark.sql.shuffle.partitions — rerunning the full sweep "
             "under a different value is the cheap local proxy for "
             "cluster-vs-local answer stability",
    )
    ap.add_argument("names", nargs="*", help="subset of query names to run")
    args = ap.parse_args()

    import __spark_entry__ as entry

    queries = entry.queries()
    oracles = entry.oracle_sql()
    names = args.names or list(queries)

    spark = get_session("verify-all", shuffle_partitions=args.shuffle)
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        path = f"{args.sf}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    n_pass = n_fail = n_rows_only = 0
    failures: list[str] = []
    for name in names:
        fn = queries.get(name)
        if fn is None:
            # a typo must not read as a green pre-flight
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: not registered")
            continue
        t0 = time.time()
        try:
            df = fn(spark, args.sf)
            s_cols = list(df.columns)
            s_rows = [tuple(r) for r in df.collect()]
        except Exception:
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: spark error\n{traceback.format_exc()}")
            continue
        sql = oracles.get(name)
        if sql is None:
            n_rows_only += 1
            print(f"ROWS  {name}: {len(s_rows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            bad_types = oracle_type_violations(con, sql)
            res = con.execute(sql)
            o_cols = [d[0] for d in res.description]
            o_rows = res.fetchall()
        except Exception:
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: oracle error\n{traceback.format_exc()}")
            continue
        msgs = []
        if bad_types:
            # fetchall is blind to this divergence; the driver is not
            msgs.append(f"oracle output types {bad_types} (HUGEINT/DECIMAL "
                        "materialize as float64 on the driver path — cast)")
        if len(s_rows) != len(o_rows):
            msgs.append(f"rows spark={len(s_rows)} oracle={len(o_rows)}")
        if sorted(s_cols) != sorted(o_cols):
            msgs.append(f"cols spark={sorted(s_cols)} oracle={sorted(o_cols)}")
        if not msgs:
            s_set = _rowset(s_cols, s_rows)
            o_set = _rowset(o_cols, o_rows)
            for i, (a, b) in enumerate(zip(s_set, o_set)):
                if a != b:
                    msgs.append(f"row #{i}: spark={a!r} oracle={b!r}")
                    break
        if msgs:
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(msgs)} [{time.time()-t0:.1f}s]")
        else:
            n_pass += 1
            print(f"ok    {name}: {len(s_rows)} rows [{time.time()-t0:.1f}s]")

    print(
        f"\nSUMMARY pass={n_pass} rows_only={n_rows_only} fail={n_fail}"
        + (f" failures={failures}" if failures else "")
    )
    # a run that verified nothing is not a green run
    return 1 if n_fail or (n_pass + n_rows_only) == 0 else 0


if __name__ == "__main__":
    raise SystemExit(main())
