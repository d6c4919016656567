"""Capture the EXECUTED (post-collect, AQE-final) plan of registry
queries — the r11/r12 plan-evidence protocol: `explain()` before an
action shows only the initial AQE plan; `ReusedExchange` and
`AQEShuffleRead` appear only after the SAME DataFrame's own query
execution finalizes, so we `collect()` the DataFrame, then explain it.

Usage: python tools/capture_plan.py OUTDIR SUFFIX query [query ...]
       writes OUTDIR/<query>_<SUFFIX>.txt
"""

from __future__ import annotations

import os
import sys

# Import the engine from the CURRENT WORKING DIRECTORY's checkout, not
# this script's: before/after plan pairs are captured by running this
# one script from two different worktrees (`cd <worktree> && python
# /path/to/capture_plan.py ...`), and inserting the script's own repo
# root would silently capture the same side twice.
sys.path.insert(0, os.getcwd())

from cs744_big_data_system_spark.session import get_spark
from cs744_big_data_system_spark.workloads import all_workloads


def main() -> None:
    outdir, suffix, *queries = sys.argv[1:]
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("capture_plan")
    spark.sparkContext.setLogLevel("ERROR")
    reg = all_workloads()
    for q in queries:
        fn, _ = reg[q]
        spark.sparkContext.setJobDescription(f"capture: {q}")
        df = fn(spark, sf)
        df.collect()
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(outdir, f"{q}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        n_ex = plan.count("Exchange")
        n_reuse = plan.count("ReusedExchange")
        n_scan = plan.count("Scan parquet")
        print(f"[plan] {q}: exchanges~{n_ex} reused={n_reuse} scans={n_scan} -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
