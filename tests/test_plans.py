"""Scale-posture assertions: the physical plans are the ones we want —
pushed filters, pruned columns, whole-stage codegen, broadcast joins.
(The prompt-level requirement: a plan that reads all 11 lineitem
columns for a 2-column projection is wrong even if results match.)"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def test_filter_pushdown_reaches_parquet_scan(spark):
    from cs744_big_data_system_spark.plans.explain import formatted_plan, has_pushed_filters
    from cs744_big_data_system_spark.sources.readers import load_table

    li = load_table(spark, SF_SMALL, "lineitem").filter(F.col("l_shipdate") > "2000-01-01")
    assert has_pushed_filters(li), formatted_plan(li)


def test_column_pruning(spark):
    from cs744_big_data_system_spark.plans.explain import read_schema_columns
    from cs744_big_data_system_spark.sources.readers import load_table

    li = load_table(spark, SF_SMALL, "lineitem").select("l_orderkey", "l_quantity")
    cols = read_schema_columns(li)
    assert set(cols) == {"l_orderkey", "l_quantity"}, cols


def test_flagship_uses_broadcast_joins_and_codegen(spark):
    from cs744_big_data_system_spark.plans.explain import (
        formatted_plan,
        wholestage_codegen_spans,
    )
    from cs744_big_data_system_spark.workloads.relational import q_flagship_q3

    df = q_flagship_q3(spark, SF_SMALL)
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan, plan  # dims broadcast, fact never shuffled
    assert "TakeOrderedAndProject" in plan, plan  # top-k, not a global sort
    # AQE's pre-execution formatted plan hides codegen spans — check
    # with AQE off (the stages themselves are identical).
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        assert wholestage_codegen_spans(q_flagship_q3(spark, SF_SMALL)) >= 1
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_topk_plans_take_ordered(spark):
    from cs744_big_data_system_spark.operators.relational import top_k
    from cs744_big_data_system_spark.plans.explain import formatted_plan
    from cs744_big_data_system_spark.sources.readers import load_table

    df = top_k(load_table(spark, SF_SMALL, "orders"), 10, F.col("o_totalprice").desc())
    assert "TakeOrderedAndProject" in formatted_plan(df)


def test_range_join_broadcasts_band_table(spark):
    from cs744_big_data_system_spark.operators.relational import range_join
    from cs744_big_data_system_spark.plans.explain import formatted_plan
    from cs744_big_data_system_spark.sources.readers import load_table

    bands = spark.createDataFrame([("low", 0.0, 1e5), ("high", 1e5, 1e18)], ["band_name", "lo", "hi"])
    j = range_join(load_table(spark, SF_SMALL, "orders"), bands, "o_totalprice")
    plan = formatted_plan(j)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan


def test_agg_has_partial_aggregation(spark):
    """sum/count must do map-side partial aggregation (the reference's
    reduceByKey-over-groupByKey lesson, task1.py:52 vs :34)."""
    from cs744_big_data_system_spark.plans.explain import formatted_plan
    from cs744_big_data_system_spark.sources.readers import load_table

    df = load_table(spark, SF_SMALL, "lineitem").groupBy("l_returnflag").agg(F.sum("l_quantity"))
    plan = formatted_plan(df)
    assert "partial_sum" in plan, plan
