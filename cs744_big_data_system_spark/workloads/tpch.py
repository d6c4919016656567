"""TPC-H-style decision-support family over the driver's TPC-H-ish star schema.

The reference's relational surface is scan→filter→join→agg→sort
(assignment1/part2/task.py:22-26 for scan+sort; SURVEY.md §2.3-§2.5); this
module widens it to the canonical TPC-H query shapes expressible on the
available columns (TESTDATA.md: no partsupp table, no l_commitdate /
l_receiptdate / p_container / c_phone), adapting predicates where a column
is missing and saying so per-query.

Scale posture shared by the family (each docstring notes deviations):
  * nation/region are O(25)/O(5) rows at every SF → always `F.broadcast`.
  * part/supplier/customer scale with SF → no forced broadcast; AQE picks
    broadcast vs shuffle from runtime sizes.
  * lineitem is the fact table → it shuffles at most once per distinct key
    set; aggregations are partial (map-side combine) by construction.
  * Date/number predicates sit directly on scan columns → pushed to the
    parquet reader (PushedFilters), so a 100 TB scan prunes row groups.
  * LIMIT-k results order by the *rounded* measure plus a unique tiebreak
    so both engines cut the same top-k.

Every query returns (spark, sf_dir) -> DataFrame and has a DuckDB oracle
with identical column names/rounding (see workloads/__init__.py docstring
for the shared conventions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cs744_big_data_system_spark.sources.readers import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _rev():
    # Built lazily: Column construction needs an active SparkContext.
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# --- Q4: order-priority checking (adapted: EXISTS uses l_shipdate >
#     o_orderdate as the "late line" witness; l_commitdate is absent) ---
def q_tpch_q4(spark, sf_dir):
    """Priority histogram of orders having >=1 lineitem shipped after the
    order date.

    Scale shape: left-semi join on orderkey (no row explosion however many
    matching lines), both sides pre-filtered at scan, count partial-agg'd
    over 5 priority values → near-zero shuffle width.
    """
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = _t(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


SQL_TPCH_Q4 = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# --- Q6: forecasting revenue change (verbatim shape; columns all exist) ---
def q_tpch_q6(spark, sf_dir):
    """Pure scan-aggregate: every predicate is a parquet-pushable range on
    scan columns, the result is one row — the canonical "filters must reach
    the reader" query. At 100 TB this reads only row groups whose min/max
    stats overlap [1997, 1998) x [0.03, 0.05] x [, 24)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
        & (F.col("l_discount") >= 0.03)
        & (F.col("l_discount") <= 0.05)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias("revenue")
    )


SQL_TPCH_Q6 = """
SELECT CAST(round(sum(l_extendedprice * l_discount), 4) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.03 AND 0.05 AND l_quantity < 24
"""


# --- Q7: volume shipping between two nations (verbatim shape) ---
def q_tpch_q7(spark, sf_dir):
    """Bidirectional nation-pair trade volume by ship year.

    Scale shape: lineitem joins orders on orderkey (fact-fact, one shuffle
    each), then supplier/customer (AQE-sized), then two broadcast copies of
    25-row nation; the nation-pair filter applies after the broadcasts so
    it costs nothing. Group keys are (2 nations x 2 years) → tiny shuffle.
    """
    n1 = F.broadcast(_t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(_t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")))
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") <= "1997-12-31")
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(n1, F.col("s_nationkey") == F.col("s_nkey"))
        .join(n2, F.col("c_nationkey") == F.col("c_nkey"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        joined.groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year")
        )
        .agg(F.round(F.sum(_rev()), 4).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


SQL_TPCH_Q7 = """
SELECT supp_nation, cust_nation, l_year,
       CAST(round(sum(volume), 4) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS INTEGER) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
)
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


# --- Q8: national market share (adapted: p_type is a 6-value category,
#     so the part filter is p_type = 'PROMO' instead of a 3-word type) ---
def q_tpch_q8(spark, sf_dir):
    """Share of NATION_3-supplied volume within ASIA-customer PROMO-part
    trade, by order year — conditional-sum / total-sum per group.

    Scale shape: region(5) and nation(25) broadcast; the case-when
    numerator rides the same partial aggregate as the denominator (one
    shuffle over ~7 year keys)."""
    region = F.broadcast(
        _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"))
    n_cust = F.broadcast(_t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")))
    n_supp = F.broadcast(_t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")))
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    joined = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(n_cust, F.col("c_nationkey") == F.col("c_nkey"))
        .join(region, F.col("c_rkey") == F.col("r_regionkey"))
        .join(n_supp, F.col("s_nationkey") == F.col("s_nkey"))
    )
    vol = _rev()
    return (
        joined.groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(0.0))
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


SQL_TPCH_Q8 = """
SELECT o_year,
       CAST(round(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END)
                  / sum(volume), 6) AS DOUBLE) AS mkt_share
FROM (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n2.n_name AS supp_nation
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region    ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA' AND p_type = 'PROMO'
)
GROUP BY o_year
ORDER BY o_year
"""


# --- Q9: product-type profit (adapted: no partsupp/ps_supplycost, so
#     profit is revenue l_extendedprice*(1-l_discount); part filter is
#     p_name LIKE '%bolt%') ---
def q_tpch_q9(spark, sf_dir):
    """Profit by supplier nation and order year over 'bolt' parts.

    Scale shape: the p_name LIKE filter prunes part before its join
    (substring predicates don't push to parquet row-group stats, but the
    filter still runs scan-side before the shuffle); nation broadcasts;
    group keys are (25 nations x years)."""
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").contains("bolt"))
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    li = _t(spark, sf_dir, "lineitem")
    # orders is a FACT table: co-partitioned shuffle join, never a
    # broadcast — its on-disk size sneaks under the broadcast threshold
    # at test SF, but building+shipping a 150k-row hash relation to
    # every task benched 2x slower than the shuffle join here, and at
    # 100 TB broadcasting a fact side is simply wrong. The hint pins
    # the join strategy the scale posture requires.
    orders = _t(spark, sf_dir, "orders").hint("shuffle_hash")
    supp = _t(spark, sf_dir, "supplier")
    joined = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return (
        joined.groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.round(F.sum(_rev()), 4).alias("sum_profit"))
        .orderBy(F.col("nation").asc(), F.col("o_year").desc())
    )


SQL_TPCH_Q9 = """
SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
       CAST(round(sum(l_extendedprice * (1 - l_discount)), 4) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%bolt%'
GROUP BY n_name, year(o_orderdate)
ORDER BY nation ASC, o_year DESC
"""


# --- Q10: returned-item reporting (adapted: no c_phone/c_address/c_comment
#     in the fixture customer table → projected out) ---
def q_tpch_q10(spark, sf_dir):
    """Top-20 customers by revenue lost to returns in 1997Q1.

    Scale shape: lineitem pre-filtered to returnflag='R' (pushed equality),
    orders to one quarter; the customer join is AQE-sized; nation
    broadcasts; final top-20 orders by the ROUNDED revenue with c_custkey
    tiebreak → TakeOrderedAndProject, never a global sort, and both engines
    cut the identical prefix."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
    )
    cust = _t(spark, sf_dir, "customer")
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(_rev()), 4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


SQL_TPCH_Q10 = """
SELECT c_custkey, c_name, c_acctbal, n_name,
       CAST(round(sum(l_extendedprice * (1 - l_discount)), 4) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-04-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


# --- Q13: customer order-count distribution (adapted: the o_comment
#     NOT LIKE filter becomes o_orderpriority <> '1-URGENT') ---
def q_tpch_q13(spark, sf_dir):
    """Histogram of customers by number of non-urgent orders, including
    zero-order customers via the left outer join.

    Scale shape: two chained aggregations — orders shuffles once on
    o_custkey (same key as the join, so one exchange serves both), then
    the per-customer counts collapse onto ~tens of distinct c_count keys.
    """
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


SQL_TPCH_Q13 = """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# --- Q14: promotion effect (p_type category stands in for 'PROMO%') ---
def q_tpch_q14(spark, sf_dir):
    """Percent of one month's revenue from PROMO-type parts — the
    conditional-over-total ratio on a lineitem–part join.

    Scale shape: one month of lineitem (pushed range) joins part on
    partkey; numerator and denominator share one aggregate; single row
    out."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-09-01") & (F.col("l_shipdate") < "1997-10-01")
    )
    part = _t(spark, sf_dir, "part")
    joined = li.join(part, li.l_partkey == part.p_partkey)
    return joined.agg(
        F.round(
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "PROMO", _rev()).otherwise(0.0))
            / F.sum(_rev()),
            6,
        ).alias("promo_revenue")
    )


SQL_TPCH_Q14 = """
SELECT CAST(round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                   THEN l_extendedprice * (1 - l_discount)
                                   ELSE 0 END)
                  / sum(l_extendedprice * (1 - l_discount)), 6) AS DOUBLE)
       AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01' AND l_shipdate < TIMESTAMP '1997-10-01'
"""


# --- Q15: top supplier (the CREATE VIEW revenue CTE inlined) ---
def q_tpch_q15(spark, sf_dir):
    """Supplier(s) achieving the quarter's maximum revenue.

    Scale shape: per-supplier revenue aggregates once on l_suppkey; the
    scalar max is a 1-row aggregate cross-joined (broadcast) back — no
    global-window single-partition bottleneck; equality compares the
    ROUNDED revenue on both sides so the engines pick identical winners.
    """
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(_rev()), 4).alias("total_revenue")
    )
    max_rev = rev.agg(F.max("total_revenue").alias("_max_rev"))
    supp = _t(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(max_rev), F.col("total_revenue") == F.col("_max_rev"))
        .join(supp, F.col("supplier_no") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


SQL_TPCH_Q15 = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(round(sum(l_extendedprice * (1 - l_discount)), 4) AS DOUBLE)
           AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


# --- Q17: small-quantity-order revenue (verbatim shape) ---
def q_tpch_q17(spark, sf_dir):
    """Average yearly revenue lost if Brand#9 orders below half the
    part's mean quantity were not taken.

    Scale shape: the correlated per-part AVG becomes a window over
    l_partkey on the already part-pruned join output (valid because the
    only lineitem predicate is the join key itself, so the joined rows ARE
    that part's full lineitem set); one shuffle on partkey total. The
    brand filter prunes part before the join and AQE broadcasts the
    pruned side."""
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#9")
    li = _t(spark, sf_dir, "lineitem")
    joined = li.join(part, li.l_partkey == part.p_partkey)
    w = Window.partitionBy("l_partkey")
    return (
        joined.withColumn("_avg_qty", F.avg("l_quantity").over(w))
        .filter(F.col("l_quantity") < 0.5 * F.col("_avg_qty"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"))
    )


SQL_TPCH_Q17 = """
SELECT CAST(round(sum(l_extendedprice) / 7.0, 4) AS DOUBLE) AS avg_yearly
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand = 'Brand#9'
  AND l_quantity < (SELECT 0.5 * avg(l2.l_quantity)
                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
"""


# --- Q19: discounted revenue, disjunctive brand/size/quantity bands
#     (adapted: p_container/l_shipmode absent → bands use p_size) ---
def q_tpch_q19(spark, sf_dir):
    """Sum of discounted revenue over three OR'd (brand, size-band,
    quantity-band) envelopes.

    Scale shape: the disjunction references both sides, so it applies as
    a post-join filter; the join itself stays a plain partkey equi-join
    (AQE broadcast of part). The common l_quantity <= 30 envelope is
    factored out below the OR so the fact scan still pushes a range
    predicate."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 30)
    )
    part = _t(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & (F.col("p_size").between(1, 15))
            & (F.col("l_quantity").between(1, 11))
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & (F.col("p_size").between(1, 25))
            & (F.col("l_quantity").between(10, 20))
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & (F.col("p_size").between(1, 35))
            & (F.col("l_quantity").between(20, 30))
        )
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(F.round(F.sum(_rev()), 4).alias("revenue"))
    )


SQL_TPCH_Q19 = """
SELECT CAST(round(sum(l_extendedprice * (1 - l_discount)), 4) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_quantity BETWEEN 1 AND 30
  AND ((p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
    OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
    OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30))
"""


# --- Q22: global sales opportunity (adapted: no c_phone → the country
#     code bucket is c_nationkey, list-filtered to the odd nations; every
#     fixture customer has some order, so "never ordered" becomes "no
#     order since 2000-01-01" — the anti-join shape is identical) ---
def q_tpch_q22(spark, sf_dir):
    """Rich customers (above the positive-balance mean) with no recent
    order, bucketed by nation.

    Scale shape: the scalar mean is a 1-row broadcast cross join; the
    "no recent order" test is a left-anti join on custkey (orders
    date-filtered at scan and projected to the key column only before the
    anti join); group keys are <=25 nations."""
    cust = _t(spark, sf_dir, "customer").filter(
        F.col("c_nationkey").isin(1, 3, 5, 7, 9, 11)
    )
    avg_bal = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 0.0)
        .agg(F.avg("c_acctbal").alias("_avg_bal"))
    )
    orders_keys = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "2000-01-01")
        .select("o_custkey")
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(orders_keys, cust.c_custkey == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntry"))
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 4).alias("totacctbal"),
        )
        .orderBy("cntry")
    )


SQL_TPCH_Q22 = """
SELECT c_nationkey AS cntry, CAST(count(*) AS BIGINT) AS numcust,
       CAST(round(sum(c_acctbal), 4) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_nationkey IN (1, 3, 5, 7, 9, 11)
  AND c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c_nationkey
ORDER BY cntry
"""


# --- Q2: minimum-cost supplier (adapted: no partsupp table — the
#     part-supplier supply relation is DERIVED from lineitem, with the
#     average unit price as the supply cost) ---
def q_tpch_q2(spark, sf_dir):
    """For every STANDARD size-15 part supplied from EUROPE, the
    supplier(s) offering it at the minimum derived supply cost.

    Scale shape: the derived supply table shuffles lineitem once on
    (partkey, suppkey); nation/region broadcast; the per-part minimum
    is a window over the part key riding the join's partitioning — no
    second shuffle of the fact-derived rows. The correlated-min
    subquery of the original becomes that window."""
    supply = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.round(F.avg(F.col("l_extendedprice") / F.col("l_quantity")), 4).alias("supplycost"))
    )
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    cand = (
        supply.join(p, supply.l_partkey == p.p_partkey)
        .join(s, supply.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    w = Window.partitionBy("p_partkey")
    return (
        cand.withColumn("_min_cost", F.min("supplycost").over(w))
        .filter(F.col("supplycost") == F.col("_min_cost"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "supplycost")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


SQL_TPCH_Q2 = """
WITH supply AS (
  SELECT l_partkey, l_suppkey,
         round(avg(l_extendedprice / l_quantity), 4) AS supplycost
  FROM lineitem GROUP BY 1, 2
), cand AS (
  SELECT s_acctbal, s_name, n_name, p_partkey, p_name, supplycost,
         min(supplycost) OVER (PARTITION BY p_partkey) AS min_cost
  FROM part
  JOIN supply ON l_partkey = p_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  JOIN region ON r_regionkey = n_regionkey AND r_name = 'EUROPE'
  WHERE p_size = 15 AND p_type = 'STANDARD'
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name, supplycost
FROM cand WHERE supplycost = min_cost
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


# --- Q11: important stock identification (adapted: value = shipped
#     extendedprice x quantity from lineitem; no partsupp) ---
def q_tpch_q11(spark, sf_dir):
    """Parts whose shipped value through NATION_7's suppliers exceeds
    0.2 % of that nation's total shipped value.

    Scale shape: one lineitem shuffle on partkey after the broadcast
    supplier/nation filter; the HAVING scalar subquery is a 1-row
    broadcast cross join against the same aggregate — the fact table
    is read once (ReuseExchange collapses the two consumers)."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    v = (
        li.join(F.broadcast(s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)),
                li.l_suppkey == s.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_quantity")), 2).alias("value"))
    )
    total = v.agg(F.round(F.sum("value") * 0.002, 2).alias("_thr"))
    return (
        v.join(F.broadcast(total))
        .filter(F.col("value") > F.col("_thr"))
        .select("l_partkey", "value")
        .orderBy(F.desc("value"), "l_partkey")
    )


SQL_TPCH_Q11 = """
WITH v AS (
  SELECT l_partkey, round(sum(l_extendedprice * l_quantity), 2) AS value
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey AND n_name = 'NATION_7'
  GROUP BY 1
)
SELECT l_partkey, value FROM v
WHERE value > (SELECT round(sum(value) * 0.002, 2) FROM v)
ORDER BY value DESC, l_partkey
"""


# --- Q12: shipping-mode priority histogram (adapted: no l_shipmode /
#     l_commitdate — the class is the ship-after-order delay bucket) ---
def q_tpch_q12(spark, sf_dir):
    """High- vs low-priority line counts per delay class (SLOW = shipped
    more than 90 days after the order date) for 1997 shipments.

    Scale shape: one orderkey join (AQE picks the strategy), conditional
    sums ride the 2-row group-by; the date predicate is pushed to the
    lineitem scan. Interval arithmetic (not datediff) so both engines
    compare identical timestamp semantics."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    o = _t(spark, sf_dir, "orders")
    joined = li.join(o, li.l_orderkey == o.o_orderkey)
    slow = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        joined.groupBy(F.when(slow, "SLOW").otherwise("FAST").alias("ship_class"))
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("ship_class")
    )


SQL_TPCH_Q12 = """
SELECT CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY THEN 'SLOW'
            ELSE 'FAST' END AS ship_class,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
         AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
         AS low_line_count
FROM lineitem JOIN orders ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY 1 ORDER BY 1
"""


# --- Q16: supplier counts by part attributes (adapted: the
#     part-supplier relation is the DISTINCT pairs observed in lineitem) ---
def q_tpch_q16(spark, sf_dir):
    """Distinct supplier counts per (brand, type, size) for the selected
    sizes, excluding one brand and one type family.

    Scale shape: lineitem projected to its two key columns and
    distinct'd (one shuffle, 8-byte keys), part filter broadcast-joined
    in, countDistinct over small group keys."""
    pairs = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    )
    return (
        pairs.join(p, pairs.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


SQL_TPCH_Q16 = """
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# --- Q20: potential part promotion (adapted: no partsupp availqty —
#     the surplus test is a fixed shipped-quantity threshold) ---
def q_tpch_q20(spark, sf_dir):
    """Suppliers who shipped more than 400 units of 'small%' parts
    during 1997 — the q20 semi-join chain (parts → qualifying supply →
    suppliers) without the availqty correlation the schema lacks.

    Scale shape: part filter broadcasts into the date-pruned lineitem
    scan; the HAVING aggregate shuffles on suppkey only; suppliers
    arrive by left-semi join (no duplication)."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").startswith("small"))
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    qualifying = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("_qty"))
        .filter(F.col("_qty") > 400)
    )
    s = _t(spark, sf_dir, "supplier")
    return (
        s.join(qualifying, s.s_suppkey == qualifying.l_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


SQL_TPCH_Q20 = """
SELECT s_name, s_acctbal FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem
  JOIN part ON p_partkey = l_partkey AND p_name LIKE 'small%'
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY l_suppkey HAVING sum(l_quantity) > 400
)
ORDER BY s_name
"""


# --- Q21: suppliers who kept orders waiting (adapted: "late" =
#     shipped >30 days after the order date; no l_receiptdate) ---
def q_tpch_q21(spark, sf_dir):
    """Per-supplier count of late lines on finished multi-supplier
    orders where they were the ONLY late supplier — q21's double
    correlated EXISTS / NOT EXISTS as a left-semi + left-anti pair.

    Scale shape: the late set is computed once (orderkey join, scan
    predicates pushed); both correlation probes join on orderkey with
    a supplier-inequality residual — semi/anti joins, so no row
    explosion however many sibling lines an order has."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    # NOTE (r12 negative result, A/B-killed): sharing ONE projected +
    # orderkey-repartitioned lineitem across the three probes (the
    # kfold exchange-sharing pattern) measured 1.42 s -> 1.99 s at 32
    # cores — AQE broadcast-converts the o-join and the EXISTS probe at
    # this SF, so the forced exchange sat on the critical path while
    # the scans it deduplicated were already cheap columnar reads.
    li = _t(spark, sf_dir, "lineitem")
    late = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    all_lines = li.select(
        F.col("l_orderkey").alias("o2_orderkey"), F.col("l_suppkey").alias("o2_suppkey")
    )
    late_other = late.select(
        F.col("l_orderkey").alias("l3_orderkey"), F.col("l_suppkey").alias("l3_suppkey")
    )
    l1 = (
        late.join(
            all_lines,
            (F.col("l_orderkey") == F.col("o2_orderkey"))
            & (F.col("l_suppkey") != F.col("o2_suppkey")),
            "left_semi",
        )
        .join(
            late_other,
            (F.col("l_orderkey") == F.col("l3_orderkey"))
            & (F.col("l_suppkey") != F.col("l3_suppkey")),
            "left_anti",
        )
    )
    s = _t(spark, sf_dir, "supplier")
    return (
        l1.groupBy("l_suppkey")
        .agg(F.count("*").alias("numwait"))
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .select("s_name", "numwait")
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


SQL_TPCH_Q21 = """
WITH late AS (
  SELECT l_orderkey, l_suppkey FROM lineitem
  JOIN orders ON o_orderkey = l_orderkey
  WHERE o_orderstatus = 'F'
    AND l_shipdate > o_orderdate + INTERVAL 30 DAY
)
SELECT s_name, CAST(numwait AS BIGINT) AS numwait FROM (
  SELECT l1.l_suppkey, count(*) AS numwait FROM late l1
  WHERE EXISTS (SELECT 1 FROM lineitem l2
                WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
    AND NOT EXISTS (SELECT 1 FROM late l3
                    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey)
  GROUP BY 1
) JOIN supplier ON s_suppkey = l_suppkey
ORDER BY numwait DESC, s_name
LIMIT 100
"""


WORKLOADS = {
    "tpch_q2": (q_tpch_q2, SQL_TPCH_Q2),
    "tpch_q4": (q_tpch_q4, SQL_TPCH_Q4),
    "tpch_q6": (q_tpch_q6, SQL_TPCH_Q6),
    "tpch_q7": (q_tpch_q7, SQL_TPCH_Q7),
    "tpch_q8": (q_tpch_q8, SQL_TPCH_Q8),
    "tpch_q9": (q_tpch_q9, SQL_TPCH_Q9),
    "tpch_q10": (q_tpch_q10, SQL_TPCH_Q10),
    "tpch_q13": (q_tpch_q13, SQL_TPCH_Q13),
    "tpch_q14": (q_tpch_q14, SQL_TPCH_Q14),
    "tpch_q15": (q_tpch_q15, SQL_TPCH_Q15),
    "tpch_q17": (q_tpch_q17, SQL_TPCH_Q17),
    "tpch_q11": (q_tpch_q11, SQL_TPCH_Q11),
    "tpch_q12": (q_tpch_q12, SQL_TPCH_Q12),
    "tpch_q16": (q_tpch_q16, SQL_TPCH_Q16),
    "tpch_q19": (q_tpch_q19, SQL_TPCH_Q19),
    "tpch_q20": (q_tpch_q20, SQL_TPCH_Q20),
    "tpch_q21": (q_tpch_q21, SQL_TPCH_Q21),
    "tpch_q22": (q_tpch_q22, SQL_TPCH_Q22),
}
