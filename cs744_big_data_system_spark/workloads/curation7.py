"""Round-5 fourth closing batch: the last surface gaps —

  * ``attribution_shapley`` — exact Shapley-value marketing
    attribution over channel SETS: the corpus collapses to one row
    per observed channel bitmask (≤ 16), the coalition table is a
    broadcast 16-row relation, and the Shapley sum runs entirely on
    that bounded table with integer factorial weights — the
    game-theoretic upgrade of the attribution_* family that is still
    ONE corpus pass;
  * ``join_null_safe`` — null-safe equality join (Spark ``<=>`` /
    SQL ``IS NOT DISTINCT FROM``): NULL keys match each other instead
    of vanishing — the join-family completion (inner/left/full/semi/
    anti/range/interval/asof/bloom/DPP/bucketed/salted/spatial are
    already covered);
  * ``set_ops_bag`` — bag-semantics set operations (INTERSECT ALL /
    EXCEPT ALL, plus UNION ALL for reference): multiplicity-aware
    overlap between two event slices, the relational algebra the
    DISTINCT-flavored ops can't express.

Every query is oracle-backed. Per the registry ordering invariant they
are APPENDED after the never-attested block and enter the r06+ window.

Reference scope: the reference repo (/root/reference, RDD coursework)
has none of these; they extend SURVEY.md §2.9's pipeline inventory the
same way curation1-6 did.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cs744_big_data_system_spark.sources.readers import load_table

__all__ = ["WORKLOADS"]


# --- Exact Shapley attribution over channel sets --------------------------
# Channels: click=1, view=2, signup=4, error=8 (purchase is the
# conversion event, not a channel). v(S) = conversion rate among users
# whose full touch set is CONTAINED in S (zero-user coalitions contribute
# v=0). Shapley weights for 4 players scaled by 4! = 24:
# |S|! * (4-|S|-1)! for |S| = 0..3 → 6, 2, 2, 6.
_SHAP_CHANNELS = [("click", 1), ("view", 2), ("signup", 4), ("error", 8)]


def q_attribution_shapley(spark, sf_dir):
    """Exact Shapley attribution: one corpus pass builds the per-user
    channel bitmask + converted flag, a second (16-group) aggregation
    gives per-mask user/conversion counts, and everything after —
    coalition values via subset-containment join, marginal
    contributions, factorial weighting — runs on BROADCAST ≤16-row
    relations. φ is reported in micro-units (weighted marginals in
    fixed IEEE order on both engines, scaled by 24·10⁶ and floored).

    Scale shape: the ONLY corpus-sized work is groupBy(user_id) with
    bit_or/max map-side combine; coalition math is corpus-independent
    (2^channels rows). The efficiency-axiom check Σφ = v(full)−v(∅)
    is pinned in tests."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    users = ev.groupBy("user_id").agg(
        F.expr(
            "bit_or(CASE event_type WHEN 'click' THEN 1 WHEN 'view' THEN 2 "
            "WHEN 'signup' THEN 4 WHEN 'error' THEN 8 ELSE 0 END)"
        ).alias("mask"),
        F.max((F.col("event_type") == "purchase").cast("int")).alias("conv"),
    )
    observed = users.groupBy("mask").agg(
        F.count(F.lit(1)).alias("n"), F.sum("conv").alias("c")
    )
    coalitions = spark.range(16).select(F.col("id").cast("int").alias("s"))
    v = (
        coalitions.join(
            F.broadcast(observed),
            F.expr("(mask & s) = mask"),
            "left",
        )
        .groupBy("s")
        .agg(
            F.coalesce(F.sum("n"), F.lit(0)).alias("ns"),
            F.coalesce(F.sum("c"), F.lit(0)).alias("cs"),
        )
        .select(
            "s",
            F.when(
                F.col("ns") > 0, F.col("cs").cast("double") / F.col("ns").cast("double")
            )
            .otherwise(F.lit(0.0))
            .alias("v"),
        )
    )
    # one 16-row coalition-value table, referenced exactly twice in a
    # single plan (base side + with-channel side) — the per-channel
    # fan-out rides a broadcast 4-row channel relation, so the corpus
    # pass is not re-expanded per channel
    v = v.localCheckpoint(eager=True)  # 16 rows; both phi sides read this
    channels = spark.createDataFrame(_SHAP_CHANNELS, ["channel", "bit"])
    size = sum((F.shiftright(F.col("s"), k).bitwiseAND(F.lit(1))) for k in range(4))
    weight = (
        F.when(size == 0, 6)
        .when(size == 1, 2)
        .when(size == 2, 2)
        .otherwise(6)
        .cast("double")
    )
    base = v.crossJoin(F.broadcast(channels)).filter(
        F.col("s").bitwiseAND(F.col("bit")) == 0
    )
    withi = v.select(F.col("s").alias("s2"), F.col("v").alias("v2"))
    pair = base.join(
        F.broadcast(withi), F.col("s2") == F.col("s").bitwiseOR(F.col("bit"))
    )
    return pair.groupBy("channel").agg(
        F.floor(
            F.sum(weight * (F.col("v2") - F.col("v"))) / F.lit(24.0) * 1e6
            + F.lit(0.5)
        )
        .cast("long")
        .alias("phi_micro")
    )


SQL_ATTRIBUTION_SHAPLEY = """
WITH users AS (
  SELECT user_id,
         bit_or(CASE event_type WHEN 'click' THEN 1 WHEN 'view' THEN 2
                WHEN 'signup' THEN 4 WHEN 'error' THEN 8 ELSE 0 END) AS mask,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY user_id
), observed AS (
  SELECT mask, CAST(count(*) AS BIGINT) AS n, CAST(sum(conv) AS BIGINT) AS c
  FROM users GROUP BY mask
), coalitions AS (
  SELECT CAST(t.range AS INT) AS s FROM range(16) t
), v AS (
  SELECT s,
         CASE WHEN CAST(coalesce(sum(n), 0) AS BIGINT) > 0
              THEN CAST(coalesce(sum(c), 0) AS DOUBLE)
                   / CAST(coalesce(sum(n), 0) AS DOUBLE)
              ELSE 0.0 END AS v
  FROM coalitions LEFT JOIN observed ON (mask & s) = mask
  GROUP BY s
), sized AS (
  SELECT s, v,
         ((s >> 0) & 1) + ((s >> 1) & 1) + ((s >> 2) & 1) + ((s >> 3) & 1)
           AS sz
  FROM v
), channels AS (
  SELECT 'click' AS channel, 1 AS bit UNION ALL
  SELECT 'view', 2 UNION ALL
  SELECT 'signup', 4 UNION ALL
  SELECT 'error', 8
)
SELECT ch.channel,
       CAST(floor(sum(
         CAST(CASE WHEN a.sz = 0 THEN 6 WHEN a.sz = 1 THEN 2
                   WHEN a.sz = 2 THEN 2 ELSE 6 END AS DOUBLE)
         * (b.v - a.v)) / 24.0 * 1e6 + 0.5) AS BIGINT) AS phi_micro
FROM channels ch
JOIN sized a ON (a.s & ch.bit) = 0
JOIN sized b ON b.s = (a.s | ch.bit)
GROUP BY ch.channel
"""


# --- Null-safe equality join ----------------------------------------------
def q_join_null_safe(spark, sf_dir):
    """Null-safe join (`<=>`): two event slices keyed by a column that
    is NULL for every 7th event — with plain `=` those rows silently
    vanish from the join; with null-safe equality the NULL keys match
    each other. Returns per-key pair counts with the NULL group
    surfacing as key = -1 (so the oracle's column stays integer).

    Scale shape: pair COUNTS never materialize the quadratic join —
    each side pre-aggregates to per-key counts (map-side combinable)
    and `<=>` joins the two bounded count tables, so n_pairs is a
    product of integers. The null-safe operator is exercised for
    real (the NULL groups must meet), but on key-cardinality-sized
    inputs — the shape that survives 100 TB where a materialize-
    then-count plan is O(pairs) (measured 50x super-linear on the
    10x smoke before this rewrite)."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    key = F.when(F.col("event_id") % 7 == 0, F.lit(None).cast("long")).otherwise(
        F.col("user_id") % 50
    )
    a = (
        ev.filter(F.col("event_id") % 2 == 0)
        .groupBy(key.alias("k"))
        .agg(F.count(F.lit(1)).alias("na"))
    )
    b = (
        ev.filter(F.col("event_id") % 2 == 1)
        .groupBy(key.alias("k2"))
        .agg(F.count(F.lit(1)).alias("nb"))
    )
    joined = a.join(b, F.col("k").eqNullSafe(F.col("k2")))
    return joined.select(
        F.coalesce(F.col("k"), F.lit(-1)).cast("long").alias("key"),
        (F.col("na") * F.col("nb")).cast("long").alias("n_pairs"),
    )


SQL_JOIN_NULL_SAFE = """
WITH ev AS (
  SELECT event_id,
         CASE WHEN event_id % 7 = 0 THEN NULL ELSE user_id % 50 END AS k
  FROM events
), a AS (SELECT k, CAST(count(*) AS BIGINT) AS na FROM ev
         WHERE event_id % 2 = 0 GROUP BY k),
   b AS (SELECT k AS k2, CAST(count(*) AS BIGINT) AS nb FROM ev
         WHERE event_id % 2 = 1 GROUP BY k)
SELECT CAST(coalesce(a.k, -1) AS BIGINT) AS key,
       CAST(a.na * b.nb AS BIGINT) AS n_pairs
FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k2
"""


# --- Bag-semantics set operations ------------------------------------------
def q_set_ops_bag(spark, sf_dir):
    """INTERSECT ALL / EXCEPT ALL / UNION ALL between two overlapping
    event slices, with MULTIPLICITY preserved (the DISTINCT-flavored
    ops lose duplicate counts). Result: per-op row count + an
    order-independent checksum over the surviving bag.

    Scale shape: Spark plans INTERSECT ALL / EXCEPT ALL as a single
    aggregation computing per-row min/ difference of multiplicities +
    a generate — one shuffle on the row value, no sort."""
    from cs744_big_data_system_spark.operators.dedup import md5_int60

    ev = load_table(spark, sf_dir, "events").select(
        (F.col("user_id") % 100).alias("u"), "event_type"
    )
    a = ev.filter(F.col("event_type").isin("click", "view", "purchase"))
    b = ev.filter(F.col("event_type").isin("view", "purchase", "signup"))
    a2, b2 = a.select("u"), b.select("u")

    def summarize(df, label):
        return (
            df.select(F.pmod(md5_int60(F.col("u").cast("string")), F.lit(1000000000)).alias("h"))
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.coalesce(F.sum("h"), F.lit(0)).cast("long").alias("bag_checksum"),
            )
            .select(F.lit(label).alias("op"), "n_rows", "bag_checksum")
        )

    return (
        summarize(a2.intersectAll(b2), "intersect_all")
        .unionByName(summarize(a2.exceptAll(b2), "except_all"))
        .unionByName(summarize(a2.unionAll(b2), "union_all"))
    )


SQL_SET_OPS_BAG = """
WITH ev AS (
  SELECT user_id % 100 AS u, event_type FROM events
), a AS (SELECT u FROM ev WHERE event_type IN ('click', 'view', 'purchase')),
   b AS (SELECT u FROM ev WHERE event_type IN ('view', 'purchase', 'signup'))
SELECT 'intersect_all' AS op, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(coalesce(sum(CAST(('0x' || substr(md5(CAST(u AS VARCHAR)), 1, 15))
            AS BIGINT) % 1000000000), 0) AS BIGINT) AS bag_checksum
FROM (SELECT u FROM a INTERSECT ALL SELECT u FROM b)
UNION ALL
SELECT 'except_all', CAST(count(*) AS BIGINT),
       CAST(coalesce(sum(CAST(('0x' || substr(md5(CAST(u AS VARCHAR)), 1, 15))
            AS BIGINT) % 1000000000), 0) AS BIGINT)
FROM (SELECT u FROM a EXCEPT ALL SELECT u FROM b)
UNION ALL
SELECT 'union_all', CAST(count(*) AS BIGINT),
       CAST(coalesce(sum(CAST(('0x' || substr(md5(CAST(u AS VARCHAR)), 1, 15))
            AS BIGINT) % 1000000000), 0) AS BIGINT)
FROM (SELECT u FROM a UNION ALL SELECT u FROM b)
"""


WORKLOADS = {
    "attribution_shapley": (q_attribution_shapley, SQL_ATTRIBUTION_SHAPLEY),
    "join_null_safe": (q_join_null_safe, SQL_JOIN_NULL_SAFE),
    "set_ops_bag": (q_set_ops_bag, SQL_SET_OPS_BAG),
}
