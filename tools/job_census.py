#!/usr/bin/env python
"""Per-query Spark JOB census (round 12).

The r11 verdict's scaling block showed 8c ≈ 32c for the slow tier —
wall-clock there is per-job scheduling/materialization latency, not
shuffle volume. This tool counts the jobs a query run submits (via
``setJobGroup`` + ``statusTracker``) alongside the same warm-up + timed
noop methodology as ``tools/profile_query.py``, so a "job-count diet"
change has direct before/after evidence: {name: {jobs, runs, median}}.

Usage: python tools/job_census.py [--sf DIR] [--repeats N] name [name ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    import __spark_entry__ as entry
    from machine_learning_with_spark_streaming_spark.session import get_session

    spark = get_session(
        "job-census", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    sc = spark.sparkContext
    queries = entry.queries()
    out: dict[str, dict] = {}
    for name in args.names:
        fn = queries.get(name)
        if fn is None:
            out[name] = {"error": "unknown query"}
            continue
        # untimed warm-up (codegen/JIT), same as bench.py
        spark.catalog.clearCache()
        fn(spark, args.sf).write.format("noop").mode("overwrite").save()
        runs: list[float] = []
        n_jobs = 0
        for i in range(args.repeats):
            spark.catalog.clearCache()
            group = f"census-{name}-{i}"
            sc.setJobGroup(group, name)
            t0 = time.time()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
            sc.setJobGroup(None, None)
            n_jobs = len(sc.statusTracker().getJobIdsForGroup(group))
        runs.sort()
        out[name] = {
            "jobs": n_jobs,
            "runs": runs,
            "median": runs[len(runs) // 2],
        }
        spark.catalog.clearCache()
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
