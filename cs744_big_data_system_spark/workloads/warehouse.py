"""Warehouse / CDC workloads: MERGE upsert, SCD-2 history build, and
the skew-safe two-stage top-k — operators a production lakehouse user
expects from an engine, absent from the reference (no file to cite;
semantics follow the SQL-standard MERGE and the classic Kimball type-2
dimension).

All three are fully oracle-checked against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from cs744_big_data_system_spark.operators.merge import merge_upsert, scd2_history
from cs744_big_data_system_spark.sources.readers import load_table


# --- MERGE INTO via one full-outer join (operators/merge.py) ---
def q_merge_upsert(spark, sf_dir):
    """CDC apply: per-customer order totals merged into the customer
    dimension. Matched rows get acctbal += total_spent; a deterministic
    synthetic slice (custkey % 7 == 0, shifted beyond the key range)
    exercises the INSERT branch; customers without orders pass through
    as 'kept'. One shuffle (the full-outer join) — the change-set side
    broadcasts under AQE when small."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal", "c_mktsegment"
    )
    src = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_spent"),
        )
    )
    inserts = src.filter(F.col("o_custkey") % 7 == 0).withColumn(
        "o_custkey", F.col("o_custkey") + 1_000_000
    )
    source = src.unionByName(inserts).withColumnRenamed("o_custkey", "c_custkey")
    merged = merge_upsert(
        cust,
        source,
        key="c_custkey",
        matched_set={
            "c_acctbal": F.round(F.col("t.c_acctbal") + F.col("s.total_spent"), 2)
        },
        not_matched_insert={
            "c_nationkey": F.lit(-1).cast("long"),
            "c_acctbal": F.col("s.total_spent"),
            "c_mktsegment": F.lit("NEW"),
        },
    )
    return merged.select(
        "c_custkey",
        "c_nationkey",
        F.round("c_acctbal", 2).alias("c_acctbal"),
        "c_mktsegment",
        "merge_action",
    )


SQL_MERGE_UPSERT = """
WITH src AS (
  SELECT o_custkey AS k, round(sum(o_totalprice), 2) AS total_spent
  FROM orders GROUP BY 1
), source AS (
  SELECT k, total_spent FROM src
  UNION ALL
  SELECT k + 1000000 AS k, total_spent FROM src WHERE k % 7 = 0
)
SELECT coalesce(t.c_custkey, s.k) AS c_custkey,
       CASE WHEN t.c_custkey IS NULL THEN CAST(-1 AS BIGINT) ELSE t.c_nationkey END AS c_nationkey,
       round(CASE WHEN t.c_custkey IS NOT NULL AND s.k IS NOT NULL
                    THEN round(t.c_acctbal + s.total_spent, 2)
                  WHEN t.c_custkey IS NULL THEN s.total_spent
                  ELSE t.c_acctbal END, 2) AS c_acctbal,
       CASE WHEN t.c_custkey IS NULL THEN 'NEW' ELSE t.c_mktsegment END AS c_mktsegment,
       CASE WHEN t.c_custkey IS NOT NULL AND s.k IS NOT NULL THEN 'updated'
            WHEN t.c_custkey IS NULL THEN 'inserted'
            ELSE 'kept' END AS merge_action
FROM customer t FULL OUTER JOIN source s ON t.c_custkey = s.k
"""


# --- SCD type-2 history from the orders change log ---
def q_scd2_history(spark, sf_dir):
    """Type-2 dimension of customer order-status runs: one row per run
    of equal o_orderstatus per customer, with valid_from/valid_to
    intervals closed by the next change and an is_current flag. Single
    shuffle on the business key (operators/merge.py::scd2_history)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderstatus", "o_orderdate", "o_orderkey"
    )
    hist = scd2_history(
        orders,
        key="o_custkey",
        tracked="o_orderstatus",
        order_by=["o_orderdate", "o_orderkey"],
    )
    return hist.select(
        "o_custkey",
        "o_orderstatus",
        "valid_from",
        "valid_to",
        F.col("is_current").cast("long").alias("is_current"),
    )


SQL_SCD2_HISTORY = """
WITH ordered AS (
  SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
         lag(o_orderstatus) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev
  FROM orders
), changed AS (
  SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey
  FROM ordered WHERE prev IS NULL OR o_orderstatus <> prev
), closed AS (
  SELECT o_custkey, o_orderstatus, o_orderdate,
         lead(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS nxt
  FROM changed
)
SELECT o_custkey, o_orderstatus,
       strftime(o_orderdate, '%Y-%m-%d') AS valid_from,
       coalesce(strftime(nxt, '%Y-%m-%d'), '9999-12-31') AS valid_to,
       CAST(nxt IS NULL AS BIGINT) AS is_current
FROM closed
"""


# --- Skew-safe two-stage top-k per group ---
def q_topk_per_group_salted(spark, sf_dir):
    """Top-3 orders by price per priority, computed as per-(group,
    salt) partial top-k then a final top-k over the ≤ groups·salts·k
    candidates. The naive single window sorts EVERY row of a hot group
    on one task; the salted first stage bounds any task's sort to
    ~1/16th of a group, and the second stage's input is k·16 rows per
    group regardless of group size — the plan that survives a
    billion-row skewed group. Result provably equals the naive window
    (the oracle): a group's global top-k is contained in the union of
    its per-salt top-ks."""
    orders = load_table(spark, sf_dir, "orders")
    k = 3
    by_price = [F.desc("o_totalprice"), F.asc("o_orderkey")]
    w1 = Window.partitionBy("o_orderpriority", "salt").orderBy(*by_price)
    w2 = Window.partitionBy("o_orderpriority").orderBy(*by_price)
    cand = (
        orders.withColumn("salt", F.col("o_orderkey") % 16)
        .withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") <= k)
    )
    return (
        cand.withColumn("rnk", F.row_number().over(w2))
        .filter(F.col("rnk") <= k)
        .select("o_orderpriority", "rnk", "o_orderkey", "o_totalprice")
    )


SQL_TOPK_PER_GROUP = """
SELECT o_orderpriority, rnk, o_orderkey, o_totalprice
FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey) AS rnk
  FROM orders
)
WHERE rnk <= 3
"""


WORKLOADS = {
    "merge_upsert": (q_merge_upsert, SQL_MERGE_UPSERT),
    "scd2_history": (q_scd2_history, SQL_SCD2_HISTORY),
    "topk_per_group_salted": (q_topk_per_group_salted, SQL_TOPK_PER_GROUP),
}
