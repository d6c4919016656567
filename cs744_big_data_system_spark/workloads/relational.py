"""Relational workloads: SURVEY.md §2.1-§2.7 core + §2.9 gap families.

Every function takes (spark, sf_dir) and returns a DataFrame; WORKLOADS
maps name -> (fn, oracle_sql|None). Reference sites cited per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cs744_big_data_system_spark.functions.text import tokens
from cs744_big_data_system_spark.operators.relational import (
    asof_join_last_prior,
    range_join,
    sessionize,
    tagged_set_ops,
    top_k,
)
from cs744_big_data_system_spark.sources.readers import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- §2.5 O1: global multi-column sort (assignment1/part2/task.py:24) ---
def q_global_sort(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
    ).orderBy(F.col("event_type").asc(), F.col("ts_us").asc())


SQL_GLOBAL_SORT = """
SELECT event_type, epoch_us(ts) AS ts_us, event_id
FROM events ORDER BY event_type, ts_us
"""


# --- §2.2 P1-P3 + §2.6 F1-F3: filter/split/project (task1.py:28-30) ---
def q_filter_project(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.filter(F.col("source").startswith("src1")).select(
        "doc_id",
        "lang",
        F.element_at(tokens("text"), 1).alias("first_token"),
        F.size(tokens("text")).cast("long").alias("n_tokens"),
    )


SQL_FILTER_PROJECT = """
WITH tk AS (
  SELECT doc_id, lang,
         list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> '') AS toks
  FROM documents WHERE source LIKE 'src1%'
)
SELECT doc_id, lang, toks[1] AS first_token, CAST(len(toks) AS BIGINT) AS n_tokens FROM tk
"""


# --- Phase-0 flagship: TPC-H-Q3-shaped 3-way join + agg + top-k ---
def q_flagship_q3(spark, sf_dir):
    """Scan→filter→join→agg→top-k: the reference's entire relational
    surface (S1, P1-P4, J1, A2, O1 + limit) in one declarative plan.
    customer/orders are dimension-ish vs lineitem → Catalyst/AQE
    broadcasts them; the lineitem scan gets pushed filters."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "2000-01-01")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "2000-01-01")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.round(F.sum(rev), 4).alias("revenue"))
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


SQL_FLAGSHIP_Q3 = """
SELECT o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       CAST(round(sum(l_extendedprice * (1 - l_discount)), 4) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '2000-01-01'
  AND l_shipdate > TIMESTAMP '2000-01-01'
GROUP BY o_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


# --- Q18-shaped large-volume customers: agg→semi-join→join, co-keyed ---
def q_flagship_q18(spark, sf_dir):
    """TPC-H Q18 shape: orders whose total lineitem quantity exceeds a
    threshold, joined back to customer detail, top-100 by price.

    Scale shape: the HAVING aggregation, the semi-join filter, and the
    detail re-aggregation are ALL keyed by l_orderkey/o_orderkey — one
    hash partitioning serves the whole chain (Catalyst reuses the
    exchange instead of re-shuffling); customer broadcasts; the final
    top-100 is TakeOrderedAndProject, never a global sort."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_qty"))
        .filter(F.col("_qty") > 200)
        .select("l_orderkey")
    )
    return (
        li.join(big, "l_orderkey", "left_semi")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 4).alias("sum_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("o_totalprice", 4).alias("totalprice"),
            "sum_qty",
        )
        .orderBy(F.col("totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


SQL_FLAGSHIP_Q18 = """
SELECT c_name, c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       CAST(round(o_totalprice, 4) AS DOUBLE) AS totalprice,
       CAST(round(sum(l_quantity), 4) AS DOUBLE) AS sum_qty
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE l_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 200)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY totalprice DESC, o_orderkey ASC
LIMIT 100
"""


# --- Q5-shaped 6-table join: local-supplier revenue by nation ---
def q_flagship_q5(spark, sf_dir):
    """region→nation→customer→orders→lineitem→supplier with the
    local-supplier constraint (customer and supplier in the same
    nation) — the deepest join chain in the suite. All four dimension
    tables broadcast; lineitem (the fact) shuffles exactly once, for
    the final groupBy. Join ORDER is Catalyst's choice — the
    declarative form is what makes the 6-way reorderable."""
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "2000-01-01")
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .filter(cust.c_nationkey == supp.s_nationkey)  # local supplier
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(rev), 4).alias("revenue"), F.count(F.lit(1)).alias("n_items"))
    )


SQL_FLAGSHIP_Q5 = """
SELECT n_name,
       CAST(round(sum(l_extendedprice * (1 - l_discount)), 4) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA' AND o_orderdate < TIMESTAMP '2000-01-01'
GROUP BY n_name
"""


# --- Same flagship through the Spark SQL TEXT front end ---
def q_flagship_q3_sql(spark, sf_dir):
    """Identical query authored as SQL text against registered temp
    views — proof the SQL front end (parser → same Catalyst plan) is a
    first-class way to drive the engine, not just the DataFrame API."""
    for t in ("customer", "orders", "lineitem"):
        _t(spark, sf_dir, t).createOrReplaceTempView(f"v_{t}")
    return spark.sql("""
        SELECT o_orderkey,
               date_format(o_orderdate, 'yyyy-MM-dd') AS orderdate,
               round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        FROM v_lineitem
        JOIN v_orders ON l_orderkey = o_orderkey
        JOIN v_customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '2000-01-01'
          AND l_shipdate > TIMESTAMP '2000-01-01'
        GROUP BY o_orderkey, o_orderdate
        ORDER BY revenue DESC, o_orderkey ASC
        LIMIT 10
    """)


# --- §2.3 J1: inner equi-join (task1.py:51) widened to a 3-way ---
def q_join_inner(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    supp = _t(spark, sf_dir, "supplier")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.avg("p_retailprice"), 4).alias("avg_price"),
        )
    )


SQL_JOIN_INNER = """
SELECT p_brand,
       count(*) AS n_items,
       CAST(round(sum(l_quantity), 4) AS DOUBLE) AS sum_qty,
       CAST(round(avg(p_retailprice), 4) AS DOUBLE) AS avg_price
FROM lineitem JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
GROUP BY p_brand
"""


# --- §2.9 joins: left outer ---
def q_join_left_outer(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 4).alias("total_spent"),
        )
    )


SQL_JOIN_LEFT_OUTER = """
SELECT c_custkey,
       count(o_orderkey) AS n_orders,
       CAST(round(coalesce(sum(o_totalprice), 0.0), 4) AS DOUBLE) AS total_spent
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey
"""


# --- §2.9 joins: left semi ---
def q_join_semi(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    f_orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return cust.join(f_orders, cust.c_custkey == f_orders.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


SQL_JOIN_SEMI = """
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
"""


# --- §2.9 joins: left anti ---
def q_join_anti(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    p_orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return cust.join(p_orders, cust.c_custkey == p_orders.o_custkey, "left_anti").select(
        "c_custkey", "c_nationkey"
    )


SQL_JOIN_ANTI = """
SELECT c_custkey, c_nationkey FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
"""


# --- §2.9 joins: non-equi range join (broadcast band table) ---
_BANDS = [("low", 0.0, 100000.0), ("mid", 100000.0, 200000.0), ("high", 200000.0, 1e18)]


def q_join_range(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    bands = spark.createDataFrame(_BANDS, ["band_name", "lo", "hi"])
    return (
        range_join(orders, bands, "o_totalprice")
        .groupBy("band_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("band_total"),
        )
    )


SQL_JOIN_RANGE = """
SELECT band_name, count(*) AS n_orders,
       CAST(round(sum(o_totalprice), 4) AS DOUBLE) AS band_total
FROM orders
JOIN (VALUES ('low', 0.0, 100000.0), ('mid', 100000.0, 200000.0), ('high', 200000.0, 1e18))
     bands(band_name, lo, hi)
  ON o_totalprice >= lo AND o_totalprice < hi
GROUP BY band_name
"""


# --- §2.4 A1: group-by-key w/ value collection (task1.py:34) ---
def q_collect_list(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_custkey").agg(
        F.concat_ws(",", F.array_sort(F.collect_list("o_orderstatus"))).alias("statuses"),
        F.count(F.lit(1)).alias("n_orders"),
    )


SQL_COLLECT_LIST = """
SELECT o_custkey,
       string_agg(o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses,
       count(*) AS n_orders
FROM orders GROUP BY o_custkey
"""


# --- §2.4 A2: reduce-by-key sums (task1.py:52) — TPC-H-Q1-shaped ---
def q_agg_sums_q1(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
        F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


SQL_AGG_SUMS_Q1 = """
SELECT l_returnflag, l_linestatus,
       CAST(round(sum(l_quantity), 4) AS DOUBLE) AS sum_qty,
       CAST(round(sum(l_extendedprice), 4) AS DOUBLE) AS sum_base_price,
       CAST(round(sum(l_extendedprice * (1 - l_discount)), 4) AS DOUBLE) AS sum_disc_price,
       CAST(round(avg(l_quantity), 4) AS DOUBLE) AS avg_qty,
       CAST(round(avg(l_discount), 6) AS DOUBLE) AS avg_disc,
       count(*) AS count_order
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


# --- §2.4 A5: conditional count / accuracy aggregate (part1/main.py:66-72) ---
def q_conditional_agg(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    hi = F.when(F.col("value") > 100, 1).otherwise(0)
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(hi).cast("long").alias("n_hi"),
        F.round(F.sum(hi) / F.count(F.lit(1)), 4).alias("hi_rate"),
    )


SQL_CONDITIONAL_AGG = """
SELECT event_type, count(*) AS n,
       CAST(sum(CASE WHEN value > 100 THEN 1 ELSE 0 END) AS BIGINT) AS n_hi,
       CAST(round(sum(CASE WHEN value > 100 THEN 1 ELSE 0 END) * 1.0 / count(*), 4) AS DOUBLE) AS hi_rate
FROM events GROUP BY event_type
"""


# --- §2.4 A7: argmax over an array column (part3/main.py:73) ---
def q_argmax(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    return emb.select(
        "vec_id",
        "label",
        F.array_position(v, F.array_max(v)).cast("long").alias("argmax_pos"),
    )


SQL_ARGMAX = """
SELECT vec_id, label,
       CAST(list_position(embedding, list_max(embedding)) AS BIGINT) AS argmax_pos
FROM embeddings
"""


# --- §2.9: distinct + count distinct ---
def q_distinct_agg(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct("l_partkey", "l_suppkey").alias("n_part_supp"),
    )


SQL_DISTINCT_AGG = """
SELECT l_returnflag,
       count(DISTINCT l_partkey) AS n_parts,
       count(DISTINCT l_suppkey) AS n_supps,
       count(DISTINCT (l_partkey, l_suppkey)) AS n_part_supp
FROM lineitem GROUP BY l_returnflag
"""


# --- §2.9: approx_count_distinct (HLL++) — property-checked vs exact ---
def q_approx_distinct(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.approx_count_distinct("l_orderkey", rsd=0.05).alias("approx"),
    )
    ok = (F.abs(F.col("approx") - F.col("exact_orders")) / F.col("exact_orders")) < 0.15
    return agg.select("l_returnflag", "exact_orders", ok.alias("approx_ok"))


SQL_APPROX_DISTINCT = """
SELECT l_returnflag, count(DISTINCT l_orderkey) AS exact_orders, TRUE AS approx_ok
FROM lineitem GROUP BY l_returnflag
"""


# --- §2.9: top-k (TakeOrderedAndProject) ---
def q_topk(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    return top_k(
        orders, 10, F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    ).select("o_orderkey", "o_custkey", "o_totalprice")


SQL_TOPK = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
"""


# --- §2.9: set operations ---
def q_set_ops(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return tagged_set_ops(cust, supp)


SQL_SET_OPS = """
SELECT nationkey, 'union' AS op FROM
  (SELECT c_nationkey AS nationkey FROM customer UNION SELECT s_nationkey FROM supplier)
UNION ALL
SELECT nationkey, 'intersect' AS op FROM
  (SELECT c_nationkey AS nationkey FROM customer INTERSECT SELECT s_nationkey FROM supplier)
UNION ALL
SELECT nationkey, 'except' AS op FROM
  (SELECT c_nationkey AS nationkey FROM customer EXCEPT SELECT s_nationkey FROM supplier)
"""


# --- §2.9: rollup with grouping() ---
def q_rollup(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region")
    j = cust.join(nat, cust.c_nationkey == nat.n_nationkey).join(
        reg, nat.n_regionkey == reg.r_regionkey
    )
    return j.rollup("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n_cust"),
        F.round(F.sum("c_acctbal"), 4).alias("sum_bal"),
        F.grouping("r_name").cast("int").alias("g_region"),
        F.grouping("n_name").cast("int").alias("g_nation"),
    )


SQL_ROLLUP = """
SELECT r_name, n_name, count(*) AS n_cust,
       CAST(round(sum(c_acctbal), 4) AS DOUBLE) AS sum_bal,
       CAST(grouping(r_name) AS INT) AS g_region,
       CAST(grouping(n_name) AS INT) AS g_nation
FROM customer JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


# --- §2.9: cube ---
def q_cube(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 4).alias("sum_total"),
        F.grouping("o_orderstatus").cast("int").alias("g_status"),
        F.grouping("o_orderpriority").cast("int").alias("g_priority"),
    )


SQL_CUBE = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n,
       CAST(round(sum(o_totalprice), 4) AS DOUBLE) AS sum_total,
       CAST(grouping(o_orderstatus) AS INT) AS g_status,
       CAST(grouping(o_orderpriority) AS INT) AS g_priority
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


# --- §2.9: GROUPING SETS (Spark SQL surface) ---
def q_grouping_sets(spark, sf_dir):
    _t(spark, sf_dir, "orders").createOrReplaceTempView("v_orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM v_orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


SQL_GROUPING_SETS = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


# --- §2.9: window functions — row_number / rank / dense_rank ---
def q_window_ranks(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    w_recent = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    w_price = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc())
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.row_number().over(w_recent).alias("rn"),
            F.rank().over(w_price).alias("price_rank"),
            F.dense_rank().over(w_price).alias("price_dense_rank"),
        )
        .filter(F.col("rn") <= 3)
    )


SQL_WINDOW_RANKS = """
SELECT o_custkey, o_orderkey, rn, price_rank, price_dense_rank FROM (
  SELECT o_custkey, o_orderkey,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn,
         rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS price_rank,
         dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS price_dense_rank
  FROM orders) WHERE rn <= 3
"""


# --- §2.9: running aggregate over rowsBetween ---
def q_running_sum(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 4).alias("running_total"),
    )


SQL_RUNNING_SUM = """
SELECT o_custkey, o_orderkey,
       CAST(round(sum(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS DOUBLE) AS running_total
FROM orders
"""


# --- §2.9: lag / lead / ntile ---
def q_lag_lead_ntile(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
    w_tile = Window.orderBy(F.col("o_totalprice").asc(), F.col("o_orderkey").asc())
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.lag("o_totalprice").over(w), 4).alias("prev_total"),
        F.round(F.lead("o_totalprice").over(w), 4).alias("next_total"),
        F.ntile(4).over(w_tile).alias("price_quartile"),
    )


SQL_LAG_LEAD_NTILE = """
SELECT o_custkey, o_orderkey,
       CAST(round(lag(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 4) AS DOUBLE) AS prev_total,
       CAST(round(lead(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 4) AS DOUBLE) AS next_total,
       ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS price_quartile
FROM orders
"""


# --- §2.9: date/time function family ---
def q_date_funcs(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        F.hour("ts").alias("hr"),
        F.minute("ts").alias("minute_of_hour"),
        F.dayofweek("ts").alias("dow"),
        F.datediff(F.col("ts"), F.lit("2024-01-01").cast("timestamp")).cast("long").alias("days_since"),
    )


SQL_DATE_FUNCS = """
SELECT event_id,
       strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       CAST(hour(ts) AS INT) AS hr,
       CAST(minute(ts) AS INT) AS minute_of_hour,
       CAST(dayofweek(ts) + 1 AS INT) AS dow,
       CAST(datediff('day', TIMESTAMP '2024-01-01', date_trunc('day', ts)) AS BIGINT) AS days_since
FROM events
"""


# --- §2.9: JSON functions over events.props ---
def q_json_funcs(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_val"),
        F.from_json("props", "k INT").getField("k").cast("long").alias("k_struct"),
    )


# TRY_CAST mirrors Spark's null-on-error cast semantics (ANSI off): a
# plain CAST would make the oracle ERROR where Spark yields NULL on a
# non-numeric props.k.
SQL_JSON_FUNCS = """
SELECT event_id,
       TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
       TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_struct
FROM events
"""


# --- §2.9: SQL-defined functions (Spark 4 CREATE FUNCTION) ---
def q_sql_udf_funcs(spark, sf_dir):
    """Scalar functions defined IN SQL (CREATE OR REPLACE TEMPORARY
    FUNCTION ... RETURN expr, new in Spark 4) and used from a query —
    catalog-resolved, inlined by Catalyst into the plan (no Python
    boundary; unlike Python UDFs these stay inside codegen). The
    oracle inlines the same expressions."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("_sqludf_lineitem")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION disc_price(p DOUBLE, d DOUBLE) "
        "RETURNS DOUBLE RETURN p * (1.0 - d)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION charged(p DOUBLE, d DOUBLE, t DOUBLE) "
        "RETURNS DOUBLE RETURN p * (1.0 - d) * (1.0 + t)"
    )
    return spark.sql("""
        SELECT l_returnflag,
               count(*) AS n_rows,
               round(sum(disc_price(l_extendedprice, l_discount)), 2) AS sum_disc,
               round(sum(charged(l_extendedprice, l_discount, l_tax)), 2) AS sum_charged
        FROM _sqludf_lineitem
        GROUP BY l_returnflag
    """)


SQL_SQL_UDF_FUNCS = """
SELECT l_returnflag,
       count(*) AS n_rows,
       round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc,
       round(sum(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)), 2) AS sum_charged
FROM lineitem
GROUP BY l_returnflag
"""


# --- §2.9: LATERAL correlated subquery join (Spark 4) ---
def q_lateral_topn(spark, sf_dir):
    """Per-customer top-2 orders via a correlated LATERAL subquery —
    the SQL-front-end spelling of top-k-per-group. Catalyst rewrites
    the correlated limit into a join + per-key rank, the same physical
    shape as the window formulation (which is what the oracle uses)."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("_lat_customer")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("_lat_orders")
    return spark.sql("""
        SELECT c.c_custkey, l.o_orderkey, l.o_totalprice
        FROM _lat_customer c,
        LATERAL (
          SELECT o_orderkey, o_totalprice
          FROM _lat_orders o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey ASC
          LIMIT 2
        ) l
        WHERE c.c_custkey < 200
    """)


SQL_LATERAL_TOPN = """
SELECT c_custkey, o_orderkey, o_totalprice FROM (
  SELECT c.c_custkey, o.o_orderkey, o.o_totalprice,
         row_number() OVER (PARTITION BY c.c_custkey
                            ORDER BY o.o_totalprice DESC, o.o_orderkey ASC) AS rn
  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
  WHERE c.c_custkey < 200
) WHERE rn <= 2
"""


# --- §2.9: error-safe arithmetic (try_* family) ---
def q_try_funcs(spark, sf_dir):
    """ANSI-safe arithmetic that yields NULL instead of raising:
    try_divide (÷0), try_element_at (out-of-bounds), try_cast
    (malformed string) — the hardened-expression surface a pipeline
    uses where poisoned rows must not kill a 100 TB job. The oracle
    mirrors each with explicit CASE/TRY_CAST semantics."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.round(F.try_divide(F.col("o_totalprice"), F.col("o_custkey") % 5), 6).alias(
            "safe_div"
        ),
        F.try_element_at(F.split("o_orderpriority", "-"), F.lit(3)).alias("oob_elem"),
        F.expr("try_cast(o_orderpriority AS DOUBLE)").alias("bad_cast"),
    )


SQL_TRY_FUNCS = """
SELECT o_orderkey,
       round(CASE WHEN o_custkey % 5 = 0 THEN NULL
                  ELSE o_totalprice / (o_custkey % 5) END, 6) AS safe_div,
       string_split(o_orderpriority, '-')[3] AS oob_elem,
       TRY_CAST(o_orderpriority AS DOUBLE) AS bad_cast
FROM orders
"""


# --- §2.9: VARIANT semi-structured type (Spark 4) ---
def q_variant_extract(spark, sf_dir):
    """props parsed ONCE into Spark 4's binary VARIANT encoding, then
    field-extracted and aggregated — the modern semi-structured scale
    path (parse cost paid once per row into a shredded binary form;
    repeated `get_json_object` string probes re-parse per access).
    Distinct capability from json_funcs' string-path JSON surface."""
    ev = _t(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json("props"), "$.k", "long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum((F.col("k") > 50).cast("long")).alias("n_high"),
            F.round(F.avg("k"), 6).alias("avg_k"),
            F.max("k").alias("max_k"),
        )
    )


SQL_VARIANT_EXTRACT = """
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(CASE WHEN k > 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
       round(avg(k), 6) AS avg_k,
       max(k) AS max_k
FROM (SELECT event_type,
             TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events)
GROUP BY event_type
"""


# --- §2.9: string function family ---
def q_string_funcs(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.upper("lang").alias("lang_u"),
        F.regexp_extract("text", r"^(\w+)", 1).alias("first_word"),
        F.col("text").contains("spark").alias("has_spark"),
        F.length("text").cast("long").alias("text_len"),
        F.substring("source", 4, 10).alias("src_num"),
    )


SQL_STRING_FUNCS = """
SELECT doc_id, upper(lang) AS lang_u,
       regexp_extract(text, '^(\\w+)', 1) AS first_word,
       contains(text, 'spark') AS has_spark,
       CAST(length(text) AS BIGINT) AS text_len,
       substring(source, 4, 10) AS src_num
FROM documents
"""


# --- §2.9: array function family (transform/filter/aggregate) ---
def q_array_funcs(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    sumsq = F.aggregate(F.transform(v, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    return emb.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.round(F.element_at(v, 1), 6).alias("first_val"),
        F.round(F.sqrt(sumsq), 4).alias("l2_norm"),
        F.size(F.filter(v, lambda x: x > 0)).cast("long").alias("n_pos"),
    )


SQL_ARRAY_FUNCS = """
SELECT vec_id,
       CAST(len(embedding) AS BIGINT) AS dim,
       round(CAST(embedding[1] AS DOUBLE), 6) AS first_val,
       round(sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x))), 4) AS l2_norm,
       CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos
FROM embeddings
"""


# --- §2.9: as-of join (most recent prior purchase value per user) ---
def q_asof(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    out = asof_join_last_prior(
        ev,
        partition_col="user_id",
        time_col="ts",
        mark_cond=F.col("event_type") == "purchase",
        value_col="value",
        out_col="last_purchase_value",
        tiebreak_col="event_id",
    )
    return out.select(
        "event_id", "user_id", F.round("last_purchase_value", 4).alias("last_purchase_value")
    )


SQL_ASOF = """
SELECT event_id, user_id,
       CAST(round(last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS DOUBLE) AS last_purchase_value
FROM events
"""


# --- §2.7 R2: explode (flatMap analogue, task1.py:41-47) ---
def q_explode_tokens(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return (
        docs.select(F.explode(tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )


SQL_EXPLODE_TOKENS = """
SELECT token, count(*) AS n FROM (
  SELECT unnest(list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> '')) AS token
  FROM documents WHERE doc_id < 100
) GROUP BY token
"""


# --- §2.9: sessionization (gaps-and-islands; batch twin of streaming) ---
def q_sessionize(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    sess = sessionize(ev, gap_minutes=30)
    return sess.groupBy("user_id", "session_id").agg(
        F.unix_micros(F.min("ts")).alias("session_start_us"),
        F.count(F.lit(1)).alias("n_events"),
    )


SQL_SESSIONIZE = """
WITH marked AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
              OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 30 * 60 * 1000000
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessions AS (
  SELECT user_id, ts,
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM marked
)
SELECT user_id, session_id, epoch_us(min(ts)) AS session_start_us, count(*) AS n_events
FROM sessions GROUP BY user_id, session_id
"""


WORKLOADS = {
    "global_sort": (q_global_sort, SQL_GLOBAL_SORT),
    "filter_project": (q_filter_project, SQL_FILTER_PROJECT),
    "flagship_q3": (q_flagship_q3, SQL_FLAGSHIP_Q3),
    "flagship_q3_sql": (q_flagship_q3_sql, SQL_FLAGSHIP_Q3),
    "flagship_q5": (q_flagship_q5, SQL_FLAGSHIP_Q5),
    "flagship_q18": (q_flagship_q18, SQL_FLAGSHIP_Q18),
    "join_inner": (q_join_inner, SQL_JOIN_INNER),
    "join_left_outer": (q_join_left_outer, SQL_JOIN_LEFT_OUTER),
    "join_semi": (q_join_semi, SQL_JOIN_SEMI),
    "join_anti": (q_join_anti, SQL_JOIN_ANTI),
    "join_range": (q_join_range, SQL_JOIN_RANGE),
    "collect_list": (q_collect_list, SQL_COLLECT_LIST),
    "agg_sums_q1": (q_agg_sums_q1, SQL_AGG_SUMS_Q1),
    "conditional_agg": (q_conditional_agg, SQL_CONDITIONAL_AGG),
    "argmax": (q_argmax, SQL_ARGMAX),
    "distinct_agg": (q_distinct_agg, SQL_DISTINCT_AGG),
    "approx_distinct": (q_approx_distinct, SQL_APPROX_DISTINCT),
    "topk": (q_topk, SQL_TOPK),
    "set_ops": (q_set_ops, SQL_SET_OPS),
    "rollup": (q_rollup, SQL_ROLLUP),
    "cube": (q_cube, SQL_CUBE),
    "grouping_sets": (q_grouping_sets, SQL_GROUPING_SETS),
    "window_ranks": (q_window_ranks, SQL_WINDOW_RANKS),
    "running_sum": (q_running_sum, SQL_RUNNING_SUM),
    "lag_lead_ntile": (q_lag_lead_ntile, SQL_LAG_LEAD_NTILE),
    "date_funcs": (q_date_funcs, SQL_DATE_FUNCS),
    "json_funcs": (q_json_funcs, SQL_JSON_FUNCS),
    "variant_extract": (q_variant_extract, SQL_VARIANT_EXTRACT),
    "sql_udf_funcs": (q_sql_udf_funcs, SQL_SQL_UDF_FUNCS),
    "lateral_topn": (q_lateral_topn, SQL_LATERAL_TOPN),
    "try_funcs": (q_try_funcs, SQL_TRY_FUNCS),
    "string_funcs": (q_string_funcs, SQL_STRING_FUNCS),
    "array_funcs": (q_array_funcs, SQL_ARRAY_FUNCS),
    "asof_join": (q_asof, SQL_ASOF),
    "explode_tokens": (q_explode_tokens, SQL_EXPLODE_TOKENS),
    "sessionize": (q_sessionize, SQL_SESSIONIZE),
}
