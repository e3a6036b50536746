#!/usr/bin/env python
"""Per-query optimization profiler (round 11).

Times individual registered queries at an SF dir with the exact bench
methodology (untimed warm-up for codegen/JIT, then timed noop-sink runs)
and optionally writes ``explain("formatted")`` to a file — the
before/after evidence artifacts for plans/r11/.

Usage:
  python tools/profile_query.py [--sf DIR] [--repeats N] \
      [--explain-dir plans/r11 --suffix before] name [name ...]

Prints one JSON line: {"name": {"runs": [...], "median": s}, ...}
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--no-time", action="store_true",
                    help="only capture plans (skip timed runs)")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    import __spark_entry__ as entry
    from machine_learning_with_spark_streaming_spark.session import get_session

    spark = get_session(
        "profile-query", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    queries = entry.queries()
    out: dict[str, dict] = {}
    for name in args.names:
        fn = queries.get(name)
        if fn is None:
            out[name] = {"error": "unknown query"}
            continue
        try:
            if args.explain_dir:
                os.makedirs(args.explain_dir, exist_ok=True)
                df = fn(spark, args.sf)
                txt = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
                path = os.path.join(
                    args.explain_dir, f"{name}_{args.suffix}.txt"
                )
                with open(path, "w") as f:
                    f.write(txt)
                spark.catalog.clearCache()
            if args.no_time:
                out[name] = {"explained": True}
                continue
            spark.sparkContext.setJobDescription(f"warmup:{name}")
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            spark.catalog.clearCache()
            runs = []
            for i in range(args.repeats):
                spark.sparkContext.setJobDescription(f"timed:{name}:{i}")
                t0 = time.time()
                fn(spark, args.sf).write.format("noop").mode("overwrite").save()
                runs.append(round(time.time() - t0, 3))
                spark.catalog.clearCache()
            out[name] = {"runs": runs, "median": round(statistics.median(runs), 3)}
        except Exception as exc:  # noqa: BLE001
            out[name] = {"error": f"{type(exc).__name__}: {exc}"[:300]}
        finally:
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(None)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
