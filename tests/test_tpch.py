"""TPC-H family: every query executes with its declared schema, and the
headline plans have the shapes the docstrings promise (pushed filters,
semi/anti joins, broadcast dims, top-k without a global sort)."""

from __future__ import annotations

import pytest

from cs744_big_data_system_spark.workloads import tpch
from tests.conftest import SF_SMALL

EXPECTED_COLS = {
    "tpch_q2": ["s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "supplycost"],
    "tpch_q4": ["o_orderpriority", "order_count"],
    "tpch_q11": ["l_partkey", "value"],
    "tpch_q12": ["ship_class", "high_line_count", "low_line_count"],
    "tpch_q16": ["p_brand", "p_type", "p_size", "supplier_cnt"],
    "tpch_q20": ["s_name", "s_acctbal"],
    "tpch_q21": ["s_name", "numwait"],
    "tpch_q6": ["revenue"],
    "tpch_q7": ["supp_nation", "cust_nation", "l_year", "revenue"],
    "tpch_q8": ["o_year", "mkt_share"],
    "tpch_q9": ["nation", "o_year", "sum_profit"],
    "tpch_q10": ["c_custkey", "c_name", "c_acctbal", "n_name", "revenue"],
    "tpch_q13": ["c_count", "custdist"],
    "tpch_q14": ["promo_revenue"],
    "tpch_q15": ["s_suppkey", "s_name", "total_revenue"],
    "tpch_q17": ["avg_yearly"],
    "tpch_q19": ["revenue"],
    "tpch_q22": ["cntry", "numcust", "totacctbal"],
}


@pytest.mark.parametrize("name", sorted(tpch.WORKLOADS))
def test_runs_with_declared_schema(spark, name):
    fn, oracle = tpch.WORKLOADS[name]
    df = fn(spark, SF_SMALL)
    assert df.columns == EXPECTED_COLS[name]
    rows = df.collect()
    # Aggregate-to-one-row queries always produce their row; grouped
    # queries may legitimately be empty at sf0.001 (q7's nation pair,
    # q22's dormant customers) — emptiness is covered at sf0.01 by the
    # oracle gate, so only assert the frame materializes.
    assert rows is not None
    assert oracle is not None  # whole family is oracle-backed


def test_q6_filters_push_to_scan(spark):
    from cs744_big_data_system_spark.plans.explain import formatted_plan, has_pushed_filters

    df = tpch.q_tpch_q6(spark, SF_SMALL)
    assert has_pushed_filters(df), formatted_plan(df)
    plan = formatted_plan(df)
    # Only the four referenced columns leave the reader.
    assert "l_returnflag" not in plan.split("Location")[0]


def test_q4_is_left_semi(spark):
    from cs744_big_data_system_spark.plans.explain import formatted_plan

    plan = formatted_plan(tpch.q_tpch_q4(spark, SF_SMALL))
    assert "LeftSemi" in plan, plan


def test_q22_is_left_anti_with_broadcast_scalar(spark):
    from cs744_big_data_system_spark.plans.explain import formatted_plan

    plan = formatted_plan(tpch.q_tpch_q22(spark, SF_SMALL))
    assert "LeftAnti" in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan


def test_q21_correlations_are_semi_and_anti_joins(spark):
    """The double correlated EXISTS / NOT EXISTS must lower to one
    LeftSemi and one LeftAnti join — never a row-exploding inner join
    over sibling lines."""
    from cs744_big_data_system_spark.plans.explain import formatted_plan

    plan = formatted_plan(tpch.q_tpch_q21(spark, SF_SMALL))
    assert "LeftSemi" in plan, plan
    assert "LeftAnti" in plan, plan


def test_q16_distinct_pairs_before_join(spark):
    """The derived part-supplier relation must deduplicate on the two
    key columns only (8-byte shuffle rows), not after the part join."""
    from cs744_big_data_system_spark.plans.explain import formatted_plan

    plan = formatted_plan(tpch.q_tpch_q16(spark, SF_SMALL))
    assert "l_partkey" in plan and "HashAggregate" in plan, plan


def test_q10_broadcasts_nation_and_takes_ordered(spark):
    from cs744_big_data_system_spark.plans.explain import formatted_plan

    plan = formatted_plan(tpch.q_tpch_q10(spark, SF_SMALL))
    assert "BroadcastHashJoin" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan  # LIMIT 20 never global-sorts


def test_q15_has_no_global_window(spark):
    """The scalar max must be an aggregate + broadcast join, not a
    Window.partitionBy() (single-partition bottleneck at scale)."""
    from cs744_big_data_system_spark.plans.explain import formatted_plan

    plan = formatted_plan(tpch.q_tpch_q15(spark, SF_SMALL))
    assert "Window" not in plan, plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan
