"""Static plan audit over the whole headline suite (optimization r11).

For every bench.py HEADLINE query, build the DataFrame (no execution
beyond what the workload fn itself does), grab the formatted physical
plan, and count the structural signals the optimization guide says to
look for: Exchange nodes, join strategies, parquet scans per fixture
table (>1 scan of the same table in one plan = a subtree Spark will
evaluate more than once unless an exchange is reused), Python
evaluation nodes, and whether filters reached the scan.

Output: one JSON line per query to stdout (pipe to a file), so the
heavy hitters can be sorted/diffed offline.

Usage: python tools/plan_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cs744_big_data_system_spark.session import get_spark
from cs744_big_data_system_spark.workloads import all_workloads


def audit_plan(plan: str) -> dict:
    counts = {
        "exchange": len(re.findall(r"\bExchange\b", plan)),
        "reused_exchange": len(re.findall(r"ReusedExchange", plan)),
        "sort": len(re.findall(r"\bSort\b", plan)),
        "smj": len(re.findall(r"SortMergeJoin", plan)),
        "bhj": len(re.findall(r"BroadcastHashJoin", plan)),
        "shj": len(re.findall(r"ShuffledHashJoin", plan)),
        "bnlj": len(re.findall(r"BroadcastNestedLoopJoin", plan)),
        "cartesian": len(re.findall(r"CartesianProduct", plan)),
        "window": len(re.findall(r"\bWindow\b", plan)),
        "py_eval": len(re.findall(r"(BatchEvalPython|ArrowEvalPython|MapInArrow|MapInPandas|FlatMapGroupsInPandas)", plan)),
        "codegen_spans": len(set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))),
    }
    scans: dict[str, int] = {}
    for m in re.finditer(r"Scan parquet[^\n]*\n(?:.*\n)*?.*?Location:[^\n]*?(\w+)\.parquet", plan):
        t = m.group(1)
        scans[t] = scans.get(t, 0) + 1
    if not scans:  # fall back: count by file name mention in scan nodes
        for m in re.finditer(r"file:[^\s\]]*?/(\w+)\.parquet", plan):
            t = m.group(1)
            scans[t] = scans.get(t, 0) + 1
    counts["scans"] = scans
    counts["dup_scans"] = {t: n for t, n in scans.items() if n > 1}
    return counts


def main() -> None:
    argv = sys.argv[1:]
    sf_dir = argv[0] if argv and os.path.isdir(argv[0]) else "/root/testdata/sf0.1"
    names = [a for a in argv if not os.path.isdir(a)]
    import bench

    reg = all_workloads()
    spark = get_spark("plan_audit")
    spark.sparkContext.setLogLevel("ERROR")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    for name in (names or bench.HEADLINE):
        fn, _ = reg[name]
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(mode)
            row = {"query": name, **audit_plan(plan)}
        except Exception as e:
            row = {"query": name, "error": str(e)[:200]}
        print(json.dumps(row), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
