"""Laws for incremental view maintenance (workloads/curation8.py):
the delta-merged state must equal the from-scratch recompute (the
query proves it in-query; this test proves it against an independent
driver-side recompute, plus the delete path and group-drop rule)."""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_ivm_equals_python_recompute(spark):
    from cs744_big_data_system_spark.sources.readers import load_table
    from cs744_big_data_system_spark.workloads.curation8 import (
        _IVM_CUT,
        q_ivm_agg_maintenance,
    )

    rows = {r.event_type: r for r in q_ivm_agg_maintenance(spark, SF).collect()}
    assert all(r.ivm_matches_recompute == 1 for r in rows.values())

    ev = load_table(spark, SF, "events").select(
        "event_id",
        "event_type",
        (F.col("ts") < F.lit(_IVM_CUT).cast("timestamp")).alias("is_base"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    ).collect()
    n, s = defaultdict(int), defaultdict(int)
    for r in ev:
        keep = (not r.is_base) or (r.event_id % 13 != 0)
        if keep:
            n[r.event_type] += 1
            s[r.event_type] += r.cents
    expect = {k: (n[k], s[k]) for k in n if n[k] > 0}
    assert {k: (r.n, r.sum_cents) for k, r in rows.items()} == expect
    # the purge really deleted something (the delta path is exercised)
    purged = sum(1 for r in ev if r.is_base and r.event_id % 13 == 0)
    assert purged > 0
