#!/usr/bin/env python
"""Quantitative physical-plan inventory over every registered query.

For each batch query (streaming runs are skipped — their plans are
per-micro-batch), renders the executed plan at sf0.001 and counts the
operators that matter at 100 TB: exchanges (shuffles), broadcast vs
sort-merge joins, window nodes, Python stages (Arrow vs row-at-a-time),
and scans with pushed filters. Prints one JSON line and a worst-10
table; the registry-wide anti-pattern REJECTION lives in
machine_learning_with_spark_streaming_spark/planaudit.py + tests — this tool is the measurement side.

Usage: python tools/plan_inventory.py [--sf /root/testdata/sf0.001]
"""
from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SKIP_SUBSTR = ("_stream",)  # real streaming runs: no single batch plan


def main() -> int:
    import __spark_entry__ as entry
    from machine_learning_with_spark_streaming_spark.session import get_session

    sf = "/root/testdata/sf0.001"
    for a in sys.argv[1:]:
        if a.startswith("--sf"):
            sf = a.split("=", 1)[1] if "=" in a else sys.argv[sys.argv.index(a) + 1]

    spark = get_session(
        "plan-inventory", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    rows = {}
    totals = {"exchange": 0, "bhj": 0, "smj": 0, "window": 0,
              "arrow_python": 0, "row_python": 0, "cartesian": 0,
              "scans": 0, "pushed": 0}
    for name, fn in entry.queries().items():
        if any(s in name for s in SKIP_SUBSTR):
            continue
        try:
            df = fn(spark, sf)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001
            rows[name] = {"error": f"{type(exc).__name__}"[:40]}
            continue
        m = {
            "exchange": len(re.findall(r"\bExchange (?!SinglePartition, EXECUTOR_BROADCAST)", plan)),
            "bhj": len(re.findall(r"BroadcastHashJoin", plan)),
            "smj": len(re.findall(r"SortMergeJoin", plan)),
            "window": len(re.findall(r"\bWindow\b", plan)),
            "arrow_python": len(re.findall(r"MapInPandas|FlatMapGroupsInPandas|ArrowEvalPython", plan)),
            "row_python": len(re.findall(r"BatchEvalPython", plan)),
            "cartesian": len(re.findall(r"CartesianProduct", plan)),
            "scans": len(re.findall(r"FileScan|Scan parquet", plan)),
            "pushed": len(re.findall(r"PushedFilters: \[(?!\])", plan)),
        }
        rows[name] = m
        for k in totals:
            totals[k] += m[k]
    ok = {k: v for k, v in rows.items() if "error" not in v}
    worst = sorted(ok.items(), key=lambda kv: -kv[1]["exchange"])[:10]
    print(json.dumps({"metric": "plan_inventory", "sf": sf,
                      "n_queries": len(ok), "totals": totals,
                      "worst_exchanges": [(n, m["exchange"]) for n, m in worst],
                      "row_python_queries": [n for n, m in ok.items() if m["row_python"]],
                      "cartesian_queries": [n for n, m in ok.items() if m["cartesian"]],
                      "errors": [n for n, m in rows.items() if "error" in m]}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
