"""Laws for the front-end batch (workloads/frontends.py): each
alternative front end must agree with the canonical DataFrame engine
path, and the operator-level semantics (collation merge, watermark
dedup) are pinned directly."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_ps_frontend_matches_dataframe_q1(spark):
    """The pandas-on-Spark Q1 must equal the DataFrame Q1 row-for-row
    (same oracle, but this pins the two ENGINE paths against each
    other, no DuckDB involved)."""
    from cs744_big_data_system_spark.workloads.frontends import q_ps_frontend_agg
    from cs744_big_data_system_spark.workloads.relational import q_agg_sums_q1

    key = lambda r: (r.l_returnflag, r.l_linestatus)  # noqa: E731
    ps_rows = {key(r): r.asDict() for r in q_ps_frontend_agg(spark, SF).collect()}
    df_rows = {key(r): r.asDict() for r in q_agg_sums_q1(spark, SF).collect()}
    assert ps_rows == df_rows


def test_sql_table_function_equals_dataframe(spark):
    """The TVF call must equal the equivalent DataFrame filter+agg."""
    from cs744_big_data_system_spark.sources.readers import load_table
    from cs744_big_data_system_spark.workloads.frontends import q_sql_table_function

    got = {
        r.o_orderpriority: (r.n_orders, r.sum_price)
        for r in q_sql_table_function(spark, SF).collect()
    }
    truth = {
        r.o_orderpriority: (r.n_orders, r.sum_price)
        for r in load_table(spark, SF, "orders")
        .filter(F.col("o_totalprice") >= 150000.0)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("sum_price"),
        )
        .collect()
    }
    assert got == truth


def test_collation_merges_case_variants(spark):
    """Under UTF8_LCASE every group must have exactly 2 binary
    variants (upper for even event_ids, raw for odd — both parities
    exist for every type at this sf), counts must partition the table,
    and the merged count must equal the per-type count."""
    from cs744_big_data_system_spark.sources.readers import load_table
    from cs744_big_data_system_spark.workloads.frontends import q_string_collation

    rows = {r.event_type_ci: r for r in q_string_collation(spark, SF).collect()}
    ev = load_table(spark, SF, "events")
    truth = {
        r.event_type: r.n for r in ev.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    assert set(rows) == set(truth)
    for t, r in rows.items():
        assert r.n_events == truth[t]
        assert r.n_variants == 2


def test_map_in_arrow_matches_python(spark):
    """The Arrow-kernel stats must equal a plain-Python computation
    over the same documents."""
    from cs744_big_data_system_spark.sources.readers import load_table
    from cs744_big_data_system_spark.workloads.frontends import q_udf_map_in_arrow

    got = {
        r.doc_id: (r.n_chars_obs, r.n_spaces)
        for r in q_udf_map_in_arrow(spark, SF).collect()
    }
    truth = {
        r.doc_id: (len(r.text), r.text.count(" "))
        for r in load_table(spark, SF, "documents").select("doc_id", "text").collect()
    }
    assert got == truth


def test_dedup_within_watermark_collapses_total_redelivery(spark):
    """A full second delivery of the table must change nothing: the
    streamed result equals the batch aggregate over the original."""
    from cs744_big_data_system_spark.sources.readers import load_table
    from cs744_big_data_system_spark.workloads.frontends import (
        q_stream_dedup_within_watermark_replay,
    )

    got = {
        r.event_type: (r.n_events, r.sum_value)
        for r in q_stream_dedup_within_watermark_replay(spark, SF).collect()
    }
    truth = {
        r.event_type: (r.n_events, r.sum_value)
        for r in load_table(spark, SF, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .collect()
    }
    assert got == truth
