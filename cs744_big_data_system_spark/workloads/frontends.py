"""Alternative front ends and Python-boundary surfaces (late round 5):
every way a user can DRIVE the engine beyond the DataFrame API and
plain SQL, each resolving to the same Catalyst plans and hash-checked
against the same oracles —

  * ``ps_frontend_agg`` — the pandas API on Spark (``pyspark.pandas``):
    TPC-H Q1 written as idiomatic pandas, sharing the DataFrame Q1's
    oracle verbatim;
  * ``sql_table_function`` — Spark 4 SQL table functions
    (CREATE FUNCTION ... RETURNS TABLE): parameterized relational views
    callable in FROM position;
  * ``string_collation`` — Spark 4 collation-aware grouping
    (UTF8_LCASE): case variants merge inside the engine, no lower()
    rewrite needed;
  * ``udf_map_in_arrow`` — mapInArrow: the zero-pandas Arrow
    RecordBatch boundary (pyarrow.compute kernels, no per-row Python,
    no pandas conversion overhead);
  * ``stream_dedup_within_watermark_replay`` —
    dropDuplicatesWithinWatermark: at-least-once delivery collapsed to
    exactly-once semantics with state bounded by the watermark horizon
    (the operator made for redelivered streams, vs plain dropDuplicates
    whose state never expires).

All five are oracle-backed. Registry placement: appended after the
curation3 block per the ordering invariant (r06+ window).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cs744_big_data_system_spark.sources.readers import load_table
from cs744_big_data_system_spark.workloads.relational import SQL_AGG_SUMS_Q1

__all__ = ["WORKLOADS"]


# --- pandas API on Spark: TPC-H Q1 as idiomatic pandas ---
def q_ps_frontend_agg(spark, sf_dir):
    """TPC-H Q1 through ``pyspark.pandas``: column assignment, groupby,
    per-column sums/means, index-aligned concat — pandas idioms end to
    end, but every step plans to the same distributed Catalyst
    aggregates as the DataFrame Q1 (agg_sums_q1), whose oracle this
    query shares verbatim. The migration surface for pandas codebases:
    same script, 100 TB input."""
    import pyspark.pandas as ps

    old = ps.get_option("compute.ops_on_diff_frames")
    ps.set_option("compute.ops_on_diff_frames", True)
    try:
        psdf = load_table(spark, sf_dir, "lineitem").pandas_api()
        psdf["disc_price"] = psdf["l_extendedprice"] * (1 - psdf["l_discount"])
        g = psdf.groupby(["l_returnflag", "l_linestatus"])
        sums = g[["l_quantity", "l_extendedprice", "disc_price"]].sum()
        sums.columns = ["sum_qty", "sum_base_price", "sum_disc_price"]
        means = g[["l_quantity", "l_discount"]].mean()
        means.columns = ["avg_qty", "avg_disc"]
        cnt = g.size().rename("count_order")
        out = ps.concat([sums, means, cnt], axis=1).reset_index()
        for c, nd in [
            ("sum_qty", 4),
            ("sum_base_price", 4),
            ("sum_disc_price", 4),
            ("avg_qty", 4),
            ("avg_disc", 6),
        ]:
            out[c] = out[c].round(nd)
        return out.to_spark()
    finally:
        ps.set_option("compute.ops_on_diff_frames", old)


# --- Spark 4 SQL table function (parameterized relational view) ---
def q_sql_table_function(spark, sf_dir):
    """CREATE FUNCTION ... RETURNS TABLE: a parameterized relation
    callable in FROM position — the SQL-native encapsulation unit
    (pricing tiers, cohort slices) that inlines into the calling plan
    like any view, so filters/pruning still push to the scan."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("tvf_orders")
    spark.sql("""
        CREATE OR REPLACE TEMPORARY FUNCTION big_orders(minprice DOUBLE)
        RETURNS TABLE(o_orderkey BIGINT, o_totalprice DOUBLE, o_orderpriority STRING)
        RETURN SELECT CAST(o_orderkey AS BIGINT), CAST(o_totalprice AS DOUBLE),
                      o_orderpriority
               FROM tvf_orders WHERE o_totalprice >= minprice
    """)
    return spark.sql("""
        SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
               round(sum(o_totalprice), 4) AS sum_price
        FROM big_orders(150000.0D)
        GROUP BY o_orderpriority
    """)


SQL_SQL_TABLE_FUNCTION = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(o_totalprice), 4) AS sum_price
FROM orders WHERE o_totalprice >= 150000.0
GROUP BY o_orderpriority
"""


# --- Spark 4 collations: case-insensitive grouping in the engine ---
def q_string_collation(spark, sf_dir):
    """Collation-aware grouping (UTF8_LCASE): half the event types are
    uppercased (deterministically, by event_id parity), then grouped
    under the case-insensitive collation — the engine merges the case
    variants itself (n_variants proves both spellings landed in each
    group), with no lower() normalization in the grouping key. The
    collation is part of the data type, so comparisons, joins and
    aggregations all honor it — the i18n-correct path at any scale."""
    ev = load_table(spark, sf_dir, "events")
    mixed = F.when(
        F.col("event_id") % 2 == 0, F.upper("event_type")
    ).otherwise(F.col("event_type"))
    return (
        ev.select(mixed.alias("mixed"))
        .groupBy(F.collate(F.col("mixed"), "UTF8_LCASE").alias("k"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct(F.collate(F.col("mixed"), "UTF8_BINARY")).alias(
                "n_variants"
            ),
        )
        .select(F.lower("k").alias("event_type_ci"), "n_events", "n_variants")
    )


SQL_STRING_COLLATION = """
WITH mixed AS (
  SELECT CASE WHEN event_id % 2 = 0 THEN upper(event_type) ELSE event_type END AS m
  FROM events
)
SELECT lower(m) AS event_type_ci, CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT m) AS BIGINT) AS n_variants
FROM mixed GROUP BY lower(m)
"""


# --- mapInArrow: the zero-pandas Arrow boundary ---
def q_udf_map_in_arrow(spark, sf_dir):
    """Per-document text stats through ``mapInArrow`` — Arrow
    RecordBatches processed with pyarrow.compute kernels directly: no
    pandas materialization, no per-row Python, the cheapest possible
    Python boundary (the other boundaries — pandas_udf, grouped map,
    cogrouped map, UDTF, mapInPandas — are covered by the udf_* /
    multimodal families; this completes the matrix)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def stats(batches):
        import pyarrow as pa  # noqa: PLC0415 — worker-side
        import pyarrow.compute as pc

        for b in batches:
            txt = b.column("text")
            yield pa.RecordBatch.from_arrays(
                [
                    b.column("doc_id"),
                    pc.cast(pc.utf8_length(txt), pa.int64()),
                    pc.cast(pc.count_substring(txt, " "), pa.int64()),
                ],
                ["doc_id", "n_chars_obs", "n_spaces"],
            )

    return docs.mapInArrow(stats, "doc_id long, n_chars_obs long, n_spaces long")


SQL_UDF_MAP_IN_ARROW = """
SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars_obs,
       CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT) AS n_spaces
FROM documents
"""


# --- Streaming dedup with watermark-bounded state ---
def q_stream_dedup_within_watermark_replay(spark, sf_dir):
    """At-least-once delivery made exactly-once by the OPERATOR:
    the whole events table replays TWICE (two mtime-ordered waves —
    total redelivery), and dropDuplicatesWithinWatermark(event_id)
    emits each event once, with dedup state retained only inside the
    watermark horizon (vs plain dropDuplicates, whose state grows
    forever — the difference that matters on an unbounded 100 TB/day
    stream). With a loose watermark nothing expires mid-replay, so the
    result must equal the batch aggregate over the ORIGINAL table."""
    import shutil

    from cs744_big_data_system_spark.streaming.windows import (
        _drain_stream,
        stage_waves_stream,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    stage, stream = stage_waves_stream(spark, [ev, ev])
    try:
        deduped = stream.withWatermark("ts", "365 days").dropDuplicatesWithinWatermark(
            ["event_id"]
        )
        rows = _drain_stream(spark, deduped, "append")
    finally:
        shutil.rmtree(stage, ignore_errors=True)
    return rows.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


SQL_STREAM_DEDUP_WITHIN_WM = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 4) AS sum_value
FROM events GROUP BY event_type
"""


WORKLOADS = {
    "ps_frontend_agg": (q_ps_frontend_agg, SQL_AGG_SUMS_Q1),
    "sql_table_function": (q_sql_table_function, SQL_SQL_TABLE_FUNCTION),
    "string_collation": (q_string_collation, SQL_STRING_COLLATION),
    "udf_map_in_arrow": (q_udf_map_in_arrow, SQL_UDF_MAP_IN_ARROW),
    "stream_dedup_within_watermark_replay": (
        q_stream_dedup_within_watermark_replay,
        SQL_STREAM_DEDUP_WITHIN_WM,
    ),
}
