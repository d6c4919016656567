"""Pipeline-operations batch 3: data-quality auditing, small-file
compaction planning, marketing attribution, interval-sweep concurrency,
navigation-path mining, rolling correlation, item-item collaborative
filtering, Kaplan-Meier survival, A/B-test statistics, and
Page-Hinkley change detection.

These are the lakehouse-operations queries a team running a 100 TB
training-data pipeline reaches for daily: validate a landed table
before it enters the corpus (`dq_checks`), plan the compaction pass
that keeps file counts bounded (`compaction_plan`), and the
event-analytics staples (attribution, concurrency, paths, rolling
stats, recommendations, survival/conversion curves, experiment
readouts, drift monitors) that run on the serving side.

Every query returns aliased, oracle-aligned columns (see
workloads/__init__.py conventions); each has a DuckDB SQL mirror.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from cs744_big_data_system_spark.sources.readers import load_table


# --- Data-quality audit (one scan per table + one anti-join) ---
def q_dq_checks(spark, sf_dir):
    """Constraint validation before a table enters the pipeline: range,
    null, primary-key-uniqueness, and referential-integrity checks,
    reported as one (check_name, violations) row per rule.

    Scale shape: the three lineitem rules ride ONE conditional-sum scan
    (map-side partials, no shuffle beyond the single-row agg); the PK
    rule is one distinct-count over orders; the FK rule is one
    anti-join whose build side is just the orderkey column (Catalyst
    prunes it to a 1-column exchange). Nothing materializes more than
    a handful of rows on the driver.
    """
    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders")

    li_row = li.agg(
        F.sum(
            F.when((F.col("l_quantity") <= 0) | (F.col("l_quantity") > 50), 1).otherwise(0)
        ).alias("l_quantity_range"),
        F.sum(
            F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 0.10001), 1).otherwise(0)
        ).alias("l_discount_range"),
        F.sum(F.when(F.col("l_shipdate").isNull(), 1).otherwise(0)).alias(
            "l_shipdate_null"
        ),
    )
    li_checks = li_row.select(
        F.expr(
            "stack(3, 'l_quantity_range', l_quantity_range, "
            "'l_discount_range', l_discount_range, "
            "'l_shipdate_null', l_shipdate_null) AS (check_name, violations)"
        )
    )
    pk_check = od.agg(
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("violations")
    ).select(F.lit("orders_pk_unique").alias("check_name"), "violations")
    fk_check = (
        li.join(od, li.l_orderkey == od.o_orderkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("violations"))
        .select(F.lit("lineitem_fk_orders").alias("check_name"), "violations")
    )
    return (
        li_checks.unionByName(pk_check)
        .unionByName(fk_check)
        .select("check_name", F.col("violations").cast("long").alias("violations"))
        .orderBy("check_name")
    )


SQL_DQ_CHECKS = """
SELECT 'l_quantity_range' AS check_name,
       CAST(sum(CASE WHEN l_quantity <= 0 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT) AS violations
FROM lineitem
UNION ALL
SELECT 'l_discount_range',
       CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 0.10001 THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'l_shipdate_null',
       CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'orders_pk_unique', CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
FROM orders
UNION ALL
SELECT 'lineitem_fk_orders',
       CAST(count(*) AS BIGINT)
FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
ORDER BY check_name
"""


# --- Small-file compaction planner (first-fit-by-size bin packing) ---
_COMPACT_TARGET = 40_000  # target output-file size (chars as byte proxy)


def q_compaction_plan(spark, sf_dir):
    """Plan a compaction pass: treat each (lang, source) partition of
    ``documents`` as one small file (size = sum of n_chars) and assign
    files to target-size output bins with a running-sum next-fit pack —
    the maintenance job every lakehouse table needs to keep file counts
    bounded.

    Scale shape: file metadata is tiny relative to data (one row per
    file), so the per-lang running-sum window is over the CATALOG, not
    the table — exactly how real compaction planners (e.g. the public
    Delta/Iceberg OPTIMIZE designs) schedule work. Integer math end to
    end, so the plan is bit-reproducible.
    """
    docs = load_table(spark, sf_dir, "documents")
    files = docs.groupBy("lang", "source").agg(
        F.sum("n_chars").cast("long").alias("file_bytes")
    )
    w = (
        Window.partitionBy("lang")
        .orderBy(F.desc("file_bytes"), F.asc("source"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return files.select(
        "lang",
        "source",
        "file_bytes",
        (
            (F.sum("file_bytes").over(w) - F.col("file_bytes"))
            / F.lit(_COMPACT_TARGET)
        )
        .cast("long")
        .alias("bin_id"),
    ).orderBy("lang", "bin_id", F.desc("file_bytes"), "source")


SQL_COMPACTION_PLAN = f"""
WITH files AS (
  SELECT lang, source, CAST(sum(n_chars) AS BIGINT) AS file_bytes
  FROM documents GROUP BY lang, source
)
SELECT lang, source, file_bytes,
       CAST(FLOOR((sum(file_bytes) OVER (PARTITION BY lang
                     ORDER BY file_bytes DESC, source
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - file_bytes) / {_COMPACT_TARGET}.0) AS BIGINT) AS bin_id
FROM files
ORDER BY lang, bin_id, file_bytes DESC, source
"""


# --- Last-touch attribution (windowed carry-forward, no join) ---
_ATTR_WINDOW_S = 7 * 86400


def q_attribution_last_touch(spark, sf_dir):
    """Credit each purchase to the user's most recent preceding
    click/view within 7 days — the standard last-touch attribution
    model.

    Scale shape: ONE window pass over (user_id, ts) with
    last(..., ignorenulls) carrying the latest touch forward — no
    purchases-to-touches self-join (the naive plan), so the cost is a
    single user-keyed shuffle regardless of the touch:purchase ratio.
    Both carried columns derive from the same WHEN, so they always pick
    the same touch row.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view", "purchase")
    )
    is_touch = F.col("event_type").isin("click", "view")
    tagged = ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        F.when(is_touch, F.col("event_id")).alias("_touch_id"),
        F.when(is_touch, F.unix_micros("ts")).alias("_touch_ts_us"),
        F.when(is_touch, F.col("event_type")).alias("_touch_type"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    attributed = tagged.select(
        "event_id",
        "user_id",
        "event_type",
        "ts_us",
        F.last("_touch_id", ignorenulls=True).over(w).alias("touch_event_id"),
        F.last("_touch_ts_us", ignorenulls=True).over(w).alias("touch_ts_us"),
        F.last("_touch_type", ignorenulls=True).over(w).alias("touch_type"),
    )
    return (
        attributed.filter(F.col("event_type") == "purchase")
        .filter(
            F.col("touch_ts_us").isNotNull()
            & (F.col("ts_us") - F.col("touch_ts_us") <= _ATTR_WINDOW_S * 1_000_000)
        )
        .select(
            F.col("event_id").alias("purchase_event_id"),
            "user_id",
            "touch_event_id",
            "touch_type",
            ((F.col("ts_us") - F.col("touch_ts_us")) / F.lit(1_000_000))
            .cast("long")
            .alias("latency_s"),
        )
        .orderBy("purchase_event_id")
    )


SQL_ATTRIBUTION_LAST_TOUCH = f"""
WITH ev AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
         CASE WHEN event_type IN ('click','view') THEN event_id END AS _touch_id,
         CASE WHEN event_type IN ('click','view') THEN epoch_us(ts) END AS _touch_ts_us,
         CASE WHEN event_type IN ('click','view') THEN event_type END AS _touch_type
  FROM events WHERE event_type IN ('click','view','purchase')
), attributed AS (
  SELECT event_id, user_id, event_type, ts_us,
         last_value(_touch_id IGNORE NULLS) OVER w AS touch_event_id,
         last_value(_touch_ts_us IGNORE NULLS) OVER w AS touch_ts_us,
         last_value(_touch_type IGNORE NULLS) OVER w AS touch_type
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT event_id AS purchase_event_id, user_id, touch_event_id, touch_type,
       CAST(FLOOR((ts_us - touch_ts_us) / 1000000.0) AS BIGINT) AS latency_s
FROM attributed
WHERE event_type = 'purchase' AND touch_ts_us IS NOT NULL
  AND ts_us - touch_ts_us <= CAST({_ATTR_WINDOW_S} AS BIGINT) * 1000000
ORDER BY purchase_event_id
"""


# --- Peak concurrency (two-level interval sweep, no global sort) ---
_CONC_TTL_S = 300  # each event holds a session slot for 5 minutes


def q_peak_concurrency(spark, sf_dir):
    """Peak number of concurrently-active sessions per day, where each
    event opens a 5-minute activity interval — the classic +1/−1
    interval sweep, done WITHOUT a global ordered window.

    Scale shape: the textbook sweep sorts every endpoint globally (one
    single-task window at Spark scale). Here endpoints are bucketed to
    the minute: within-bucket max-prefix runs data-parallel
    (partitioned window), and only the per-bucket TOTALS (bounded:
    ≤ 1440 rows/day regardless of data size) ride the global running
    sum — a two-level prefix sum. Half-open intervals: at equal
    timestamps ends sort before starts (delta ASC).
    """
    ev = load_table(spark, sf_dir, "events")
    starts = ev.select(
        F.unix_micros("ts").alias("t_us"),
        F.lit(1).alias("delta"),
        F.col("event_id"),
    )
    ends = ev.select(
        (F.unix_micros("ts") + _CONC_TTL_S * 1_000_000).alias("t_us"),
        F.lit(-1).alias("delta"),
        F.col("event_id"),
    )
    deltas = starts.unionByName(ends).withColumn(
        "bucket", (F.col("t_us") / F.lit(60_000_000)).cast("long")
    )
    in_bucket = (
        Window.partitionBy("bucket")
        .orderBy("t_us", "delta", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    per_event = deltas.select(
        "bucket",
        F.sum("delta").over(in_bucket).alias("prefix_in_bucket"),
        "delta",
    )
    buckets = per_event.groupBy("bucket").agg(
        F.max("prefix_in_bucket").alias("max_prefix"),
        F.sum("delta").alias("bucket_total"),
    )
    carry = (
        Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    peaks = buckets.select(
        "bucket",
        (
            F.coalesce(F.sum("bucket_total").over(carry), F.lit(0))
            + F.col("max_prefix")
        ).alias("bucket_peak"),
    )
    return (
        peaks.withColumn(
            "day",
            F.date_format(
                F.timestamp_micros(F.col("bucket") * 60_000_000), "yyyy-MM-dd"
            ),
        )
        .groupBy("day")
        .agg(F.max("bucket_peak").cast("long").alias("peak_concurrency"))
        .orderBy("day")
    )


SQL_PEAK_CONCURRENCY = f"""
WITH deltas AS (
  SELECT epoch_us(ts) AS t_us, 1 AS delta, event_id FROM events
  UNION ALL
  SELECT epoch_us(ts) + {_CONC_TTL_S} * 1000000, -1, event_id FROM events
), bucketed AS (
  SELECT *, CAST(FLOOR(t_us / 60000000.0) AS BIGINT) AS bucket FROM deltas
), per_event AS (
  SELECT bucket, delta,
         sum(delta) OVER (PARTITION BY bucket ORDER BY t_us, delta, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prefix_in_bucket
  FROM bucketed
), buckets AS (
  SELECT bucket, max(prefix_in_bucket) AS max_prefix, sum(delta) AS bucket_total
  FROM per_event GROUP BY bucket
), peaks AS (
  SELECT bucket,
         COALESCE(sum(bucket_total) OVER (ORDER BY bucket
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + max_prefix AS bucket_peak
  FROM buckets
)
SELECT strftime(make_timestamp(bucket * 60000000), '%Y-%m-%d') AS day,
       CAST(max(bucket_peak) AS BIGINT) AS peak_concurrency
FROM peaks GROUP BY day ORDER BY day
"""


# --- Top navigation paths (ordered per-session event sequences) ---
def q_session_path_topk(spark, sf_dir):
    """Top-20 per-user-day navigation paths (ordered event-type
    sequences) — the session-mining query behind every "common user
    journeys" dashboard.

    Scale shape: one (user, day) shuffle builds each path via
    collect_list(struct) + array_sort (struct fields (ts_us, event_id,
    type) make the sort key explicit and deterministic); the path
    frequency count is a second, much smaller shuffle; top-20 is
    TakeOrderedAndProject, never a global sort.
    """
    ev = load_table(spark, sf_dir, "events")
    paths = (
        ev.groupBy(
            "user_id", F.date_format("ts", "yyyy-MM-dd").alias("day")
        )
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.unix_micros("ts").alias("ts_us"),
                                F.col("event_id").alias("event_id"),
                                F.col("event_type").alias("event_type"),
                            )
                        )
                    ),
                    lambda s: s.event_type,
                ),
                ">",
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), "path")
        .limit(20)
    )


SQL_SESSION_PATH_TOPK = """
WITH paths AS (
  SELECT user_id, strftime(ts, '%Y-%m-%d') AS day,
         string_agg(event_type, '>' ORDER BY epoch_us(ts), event_id) AS path
  FROM events GROUP BY user_id, strftime(ts, '%Y-%m-%d')
)
SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
FROM paths GROUP BY path
ORDER BY n_sessions DESC, path
LIMIT 20
"""


# --- Rolling correlation of two daily series ---
def q_rolling_corr(spark, sf_dir):
    """7-day rolling Pearson correlation between daily click and
    purchase counts — the co-movement monitor for any pair of business
    metrics.

    Scale shape: the raw table collapses to one row per day FIRST (one
    partial-agg shuffle), so the rolling window runs over the bounded
    daily series (≤ 366 rows/year), not the events. corr() is computed
    from the same co-moment recurrences in Spark and DuckDB; rounding
    to 4 decimals absorbs accumulation-order drift.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day")).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("double")
        .alias("clicks"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("double")
        .alias("purchases"),
    )
    w = Window.orderBy("day").rowsBetween(-6, 0)
    # NaN -> NULL: Spark's corr yields NaN on a zero-variance window
    # where DuckDB yields NULL; normalize so the hash compare can't
    # diverge on a constant-metric week.
    corr = F.corr("clicks", "purchases").over(w)
    return daily.select(
        "day",
        F.col("clicks").cast("long").alias("clicks"),
        F.col("purchases").cast("long").alias("purchases"),
        F.round(F.when(F.isnan(corr), None).otherwise(corr), 4).alias("corr7"),
    ).orderBy("day")


SQL_ROLLING_CORR = """
WITH daily AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day,
         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS DOUBLE) AS clicks,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS DOUBLE) AS purchases
  FROM events GROUP BY strftime(ts, '%Y-%m-%d')
)
SELECT day, CAST(clicks AS BIGINT) AS clicks, CAST(purchases AS BIGINT) AS purchases,
       round(corr(clicks, purchases) OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS corr7
FROM daily ORDER BY day
"""


# --- Item-item collaborative filtering (cosine top-k per item) ---
def q_item_cf_topk(spark, sf_dir):
    """Top-5 most-similar parts per part by co-purchase cosine
    (n_co / sqrt(c1*c2)) — the item-item CF recommender
    (the "customers who bought X also bought" table), complementing
    `basket_affinity`'s support/lift pairs with a normalized,
    per-item-ranked neighbor list.

    Scale shape: the pair generator is the basket-bounded self-join on
    l_orderkey (fan-out C(basket,2), independent of catalog size);
    per-part counts join back as broadcasts; ranking is rounded BEFORE
    the window so cross-engine float noise can't reorder ties, and the
    per-item top-5 is WindowGroupLimit-capped, never a global sort.
    """
    # coalesce marks both keys NON-NULLABLE (never null in lineitem):
    # no isnotnull() is inferred below the distinct's exchange by the
    # self-join / count joins, so all three consumers of ``items``
    # canonicalize identically and AQE reuses ONE scan + distinct
    # exchange (r11 plan audit: 4 separate lineitem scans).
    items = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.coalesce("l_orderkey", F.lit(-1)).alias("l_orderkey"),
            F.coalesce("l_partkey", F.lit(-1)).alias("l_partkey"),
        )
        .distinct()
    )
    a, b = items.alias("a"), items.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("p1"), F.col("b.l_partkey").alias("p2")
        )
        .agg(F.count(F.lit(1)).alias("n_co"))
        .filter(F.col("n_co") >= 2)
    )
    cnt = items.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("c"))
    scored = (
        pairs.join(
            F.broadcast(cnt.select(F.col("l_partkey").alias("p1"), F.col("c").alias("c1"))),
            "p1",
        )
        .join(
            F.broadcast(cnt.select(F.col("l_partkey").alias("p2"), F.col("c").alias("c2"))),
            "p2",
        )
        .select(
            "p1",
            "p2",
            "n_co",
            F.round(F.col("n_co") / F.sqrt(F.col("c1") * F.col("c2")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("p1").orderBy(F.desc("sim"), "p2")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("p1", "p2", "n_co", "sim", F.col("rn").cast("int").alias("rn"))
        .orderBy("p1", "rn")
    )


SQL_ITEM_CF_TOPK = """
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), pairs AS (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2, count(*) AS n_co
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey
  HAVING count(*) >= 2
), cnt AS (
  SELECT l_partkey, count(*) AS c FROM items GROUP BY l_partkey
), scored AS (
  SELECT p.p1, p.p2, CAST(p.n_co AS BIGINT) AS n_co,
         round(p.n_co / sqrt(c1.c * c2.c), 6) AS sim
  FROM pairs p
  JOIN cnt c1 ON c1.l_partkey = p.p1
  JOIN cnt c2 ON c2.l_partkey = p.p2
)
SELECT p1, p2, n_co, sim,
       CAST(rn AS INT) AS rn
FROM (
  SELECT *, row_number() OVER (PARTITION BY p1 ORDER BY sim DESC, p2) AS rn
  FROM scored
) WHERE rn <= 5
ORDER BY p1, rn
"""


# --- Kaplan-Meier survival curve (signup -> first purchase) ---
def q_survival_km(spark, sf_dir):
    """Kaplan-Meier estimate of time-to-conversion: hours from a
    user's first signup event to their first subsequent purchase,
    right-censoring users who never purchase before the stream ends —
    survival analysis done exactly, the statistically correct way to
    report conversion latency when some users haven't converted yet
    (a plain average silently drops the censored mass).

    Scale shape: users collapse to one (duration, censored) row in two
    aggregations and one user-keyed join; everything after runs on the
    BOUNDED per-duration table — at-risk counts from a running sum,
    and the product PI(1 - d/n) as exp of a running LOG sum (an
    ordered sum over distinct durations, so cross-engine accumulation
    noise is ~1e-15 against the 1e-6 rounding bucket). A duration
    where every remaining user converts drives the factor to 0;
    survival stays 0 from there via an indicator instead of ln(0),
    which Spark nulls and DuckDB rejects.
    """
    ev = load_table(spark, sf_dir, "events")
    horizon = ev.agg(F.max(F.unix_micros("ts")).alias("_end"))
    signups = ev.filter(F.col("event_type") == "signup").groupBy("user_id").agg(
        F.min(F.unix_micros("ts")).alias("s_us")
    )
    first_purchase = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", F.unix_micros("ts").alias("p_us"))
        .join(signups, "user_id")
        .filter(F.col("p_us") >= F.col("s_us"))
        .groupBy("user_id")
        .agg(F.min("p_us").alias("p_us"))
    )
    lifetimes = (
        signups.join(first_purchase, "user_id", "left")
        .crossJoin(F.broadcast(horizon))
        .select(
            F.coalesce(
                ((F.col("p_us") - F.col("s_us")) / F.lit(3_600_000_000)).cast("long"),
                ((F.col("_end") - F.col("s_us")) / F.lit(3_600_000_000)).cast("long"),
            ).alias("duration_h"),
            F.col("p_us").isNull().cast("int").alias("censored"),
        )
    )
    total = lifetimes.agg(F.count(F.lit(1)).alias("_n"))
    per_t = lifetimes.groupBy("duration_h").agg(
        F.sum(F.when(F.col("censored") == 0, 1).otherwise(0)).alias("deaths"),
        F.count(F.lit(1)).alias("leaving"),
    )
    w_prior = Window.orderBy("duration_h").rowsBetween(Window.unboundedPreceding, -1)
    w_run = Window.orderBy("duration_h").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    at_risk = per_t.crossJoin(F.broadcast(total)).select(
        "duration_h",
        F.col("deaths").cast("long").alias("deaths"),
        (F.col("_n") - F.coalesce(F.sum("leaving").over(w_prior), F.lit(0)))
        .cast("long")
        .alias("at_risk"),
    )
    log_term = F.when(
        F.col("deaths") < F.col("at_risk"),
        F.log(1.0 - F.col("deaths") / F.col("at_risk")),
    ).otherwise(F.lit(0.0))
    hit_zero = F.max((F.col("deaths") == F.col("at_risk")).cast("int")).over(w_run)
    surv = at_risk.select(
        "duration_h",
        "deaths",
        "at_risk",
        F.round(
            F.when(hit_zero == 1, F.lit(0.0)).otherwise(
                F.exp(F.sum(log_term).over(w_run))
            ),
            6,
        ).alias("survival"),
    )
    return surv.filter(F.col("deaths") > 0).orderBy("duration_h")


SQL_SURVIVAL_KM = """
WITH horizon AS (SELECT max(epoch_us(ts)) AS _end FROM events),
signups AS (
  SELECT user_id, min(epoch_us(ts)) AS s_us FROM events
  WHERE event_type = 'signup' GROUP BY user_id
), first_purchase AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS p_us
  FROM events e JOIN signups s ON s.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= s.s_us
  GROUP BY e.user_id
), lifetimes AS (
  SELECT COALESCE(CAST(FLOOR((p.p_us - s.s_us) / 3600000000.0) AS BIGINT),
                  CAST(FLOOR(((SELECT _end FROM horizon) - s.s_us) / 3600000000.0) AS BIGINT)) AS duration_h,
         CASE WHEN p.p_us IS NULL THEN 1 ELSE 0 END AS censored
  FROM signups s LEFT JOIN first_purchase p ON p.user_id = s.user_id
), total AS (SELECT CAST(count(*) AS BIGINT) AS _n FROM lifetimes),
per_t AS (
  SELECT duration_h,
         CAST(sum(CASE WHEN censored = 0 THEN 1 ELSE 0 END) AS BIGINT) AS deaths,
         CAST(count(*) AS BIGINT) AS leaving
  FROM lifetimes GROUP BY duration_h
), at_risk AS (
  SELECT duration_h, deaths,
         (SELECT _n FROM total)
           - COALESCE(sum(leaving) OVER (ORDER BY duration_h
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS at_risk
  FROM per_t
)
SELECT duration_h, deaths, at_risk, survival FROM (
  SELECT duration_h, deaths, CAST(at_risk AS BIGINT) AS at_risk,
         round(CASE WHEN max(CASE WHEN deaths = at_risk THEN 1 ELSE 0 END)
                      OVER w = 1 THEN 0.0
                ELSE exp(sum(CASE WHEN deaths < at_risk
                             THEN ln(1.0 - deaths * 1.0 / at_risk)
                             ELSE 0.0 END) OVER w) END, 6) AS survival
  FROM at_risk
  WINDOW w AS (ORDER BY duration_h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
WHERE deaths > 0
ORDER BY duration_h
"""


# --- A/B experiment analysis (deterministic assignment + z-stat) ---
def q_ab_test_zstat(spark, sf_dir):
    """Two-proportion z-test for an A/B experiment: users assign to
    variants by md5 hash (deterministic and uniform — the reproducible
    alternative to rand()-bucketing), the metric is purchase
    conversion, and the pooled z-statistic quantifies the lift. One
    row out: counts, rates, and z.

    Scale shape: users collapse to one (variant, converted) row in a
    single aggregation pass; the test statistic is arithmetic over a
    2x2 table — driver-free, shuffle count independent of event
    volume. (z is reported rather than a p-value: erf is not portable
    across engines, z is pure arithmetic.)
    """
    ev = load_table(spark, sf_dir, "events")
    users = ev.groupBy("user_id").agg(
        F.max((F.col("event_type") == "purchase").cast("int")).alias("converted")
    )
    assigned = users.select(
        (
            F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10)
            .cast("long")
            % 2
        ).alias("variant"),
        "converted",
    )
    table = assigned.groupBy().agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when((F.col("variant") == 0) & (F.col("converted") == 1), 1).otherwise(0)).alias("conv_a"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when((F.col("variant") == 1) & (F.col("converted") == 1), 1).otherwise(0)).alias("conv_b"),
    )
    p_a = F.col("conv_a") / F.col("n_a")
    p_b = F.col("conv_b") / F.col("n_b")
    pool = (F.col("conv_a") + F.col("conv_b")) / (F.col("n_a") + F.col("n_b"))
    se = F.sqrt(pool * (1.0 - pool) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b")))
    return table.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("conv_a").cast("long").alias("conv_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.col("conv_b").cast("long").alias("conv_b"),
        F.round(p_a, 6).alias("rate_a"),
        F.round(p_b, 6).alias("rate_b"),
        # try_divide: NULL on se == 0 under BOTH ANSI modes (a degenerate
        # fixture where every user converts pools to p=1.0, se=0; plain `/`
        # would throw DIVIDE_BY_ZERO under ANSI-on vanilla sessions).
        F.round(F.try_divide(p_a - p_b, se), 6).alias("z"),
    )


SQL_AB_TEST_ZSTAT = """
WITH users AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
  FROM events GROUP BY user_id
), assigned AS (
  SELECT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) % 2 AS variant,
         converted
  FROM users
), t AS (
  SELECT CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN variant = 0 AND converted = 1 THEN 1 ELSE 0 END) AS BIGINT) AS conv_a,
         CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         CAST(sum(CASE WHEN variant = 1 AND converted = 1 THEN 1 ELSE 0 END) AS BIGINT) AS conv_b
  FROM assigned
)
SELECT n_a, conv_a, n_b, conv_b,
       round(conv_a * 1.0 / n_a, 6) AS rate_a,
       round(conv_b * 1.0 / n_b, 6) AS rate_b,
       round((conv_a * 1.0 / n_a - conv_b * 1.0 / n_b)
             / sqrt(((conv_a + conv_b) * 1.0 / (n_a + n_b))
                    * (1.0 - (conv_a + conv_b) * 1.0 / (n_a + n_b))
                    * (1.0 / n_a + 1.0 / n_b)), 6) AS z
FROM t
"""


# --- Change-point detection (Page-Hinkley over daily metric series) ---
_PH_THRESHOLD = 20.0


def q_changepoint_ph(spark, sf_dir):
    """Page-Hinkley change detection per event type: cumulative
    deviation from the series mean, with the PH statistic
    cusum_t - min(cusum_0..t) flagging sustained upward shifts — the
    drift monitor for any daily business metric.

    Scale shape: raw events collapse to the bounded (type, day) series
    first; the classic CUSUM clamp max(0, ...) is a nonlinear
    recursion no window can express, but the equivalent Page-Hinkley
    form is running-sum MINUS running-min — two frames over the same
    per-type window partitioning, zero recursion. Rounded before the
    threshold so accumulation-order noise can't flip a boundary day.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.sum("value").alias("x"))
    mean_w = Window.partitionBy("event_type")
    w_run = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_dev = daily.select(
        "event_type",
        "day",
        F.round("x", 6).alias("x"),
        (F.col("x") - F.avg("x").over(mean_w)).alias("_dev"),
    )
    with_cusum = with_dev.select(
        "event_type", "day", "x", F.sum("_dev").over(w_run).alias("_cusum")
    )
    ph = with_cusum.select(
        "event_type",
        "day",
        "x",
        F.round(F.col("_cusum") - F.min("_cusum").over(w_run), 6).alias("ph"),
    )
    return ph.select(
        "event_type",
        "day",
        "x",
        "ph",
        (F.col("ph") > _PH_THRESHOLD).cast("int").alias("drift"),
    ).orderBy("event_type", "day")


SQL_CHANGEPOINT_PH = f"""
WITH daily AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, sum(value) AS x
  FROM events GROUP BY event_type, strftime(ts, '%Y-%m-%d')
), with_dev AS (
  SELECT event_type, day, round(x, 6) AS x,
         x - avg(x) OVER (PARTITION BY event_type) AS _dev
  FROM daily
), with_cusum AS (
  SELECT event_type, day, x,
         sum(_dev) OVER (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS _cusum
  FROM with_dev
), ph AS (
  SELECT event_type, day, x,
         round(_cusum - min(_cusum) OVER (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS ph
  FROM with_cusum
)
SELECT event_type, day, x, ph,
       CAST(CASE WHEN ph > {_PH_THRESHOLD!r} THEN 1 ELSE 0 END AS INT) AS drift
FROM ph ORDER BY event_type, day
"""


# --- Linear multi-touch attribution (range join, equal credit) ---
def q_attribution_linear(spark, sf_dir):
    """Linear multi-touch attribution: every click/view in the 7 days
    before a purchase shares the credit equally (1/n each) — the
    standard companion model to last-touch, and the query shape is
    deliberately different: a bounded RANGE JOIN (purchases x touches
    per user) instead of a carry-forward window.

    Scale shape: the join fans out only to touches-per-user-per-window
    (bounded by user activity, not corpus size) and runs as one
    user-keyed equi-join with the time bound as a residual predicate;
    the per-purchase touch count rides a window on the join output.
    Credit is rounded so the 1/n division can't hash-drift.
    """
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_event_id"),
        "user_id",
        F.unix_micros("ts").alias("p_us"),
    )
    touches = ev.filter(F.col("event_type").isin("click", "view")).select(
        F.col("event_id").alias("touch_event_id"),
        F.col("event_type").alias("touch_type"),
        F.col("user_id").alias("t_user"),
        F.unix_micros("ts").alias("t_us"),
    )
    joined = purchases.join(
        touches,
        (F.col("user_id") == F.col("t_user"))
        & (F.col("t_us") < F.col("p_us"))
        & (F.col("t_us") >= F.col("p_us") - F.lit(_ATTR_WINDOW_S * 1_000_000).cast("long")),
    )
    w = Window.partitionBy("purchase_event_id")
    return (
        joined.select(
            "purchase_event_id",
            "user_id",
            "touch_event_id",
            "touch_type",
            F.round(1.0 / F.count(F.lit(1)).over(w), 6).alias("credit"),
        )
        .orderBy("purchase_event_id", "touch_event_id")
    )


SQL_ATTRIBUTION_LINEAR = f"""
WITH purchases AS (
  SELECT event_id AS purchase_event_id, user_id, epoch_us(ts) AS p_us
  FROM events WHERE event_type = 'purchase'
), touches AS (
  SELECT event_id AS touch_event_id, event_type AS touch_type,
         user_id AS t_user, epoch_us(ts) AS t_us
  FROM events WHERE event_type IN ('click', 'view')
), joined AS (
  SELECT p.purchase_event_id, p.user_id, t.touch_event_id, t.touch_type
  FROM purchases p JOIN touches t
    ON t.t_user = p.user_id
   AND t.t_us < p.p_us
   AND t.t_us >= p.p_us - CAST({_ATTR_WINDOW_S} AS BIGINT) * 1000000
)
SELECT purchase_event_id, user_id, touch_event_id, touch_type,
       round(1.0 / count(*) OVER (PARTITION BY purchase_event_id), 6) AS credit
FROM joined
ORDER BY purchase_event_id, touch_event_id
"""


# --- Position-based (U-shaped) attribution ---
def q_attribution_ushaped(spark, sf_dir):
    """Position-based attribution: 40% to the first touch, 40% to the
    last, 20% split across the middles (100% / 50-50 for 1- and
    2-touch paths) — the third standard model beside last-touch and
    linear, and the one that needs BOTH endpoint ranks.

    Scale shape: same bounded user-keyed range join as the linear
    model; the position logic is two row_numbers (asc + desc) over the
    per-purchase window — no extra shuffle beyond the join's.
    """
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_event_id"),
        "user_id",
        F.unix_micros("ts").alias("p_us"),
    )
    touches = ev.filter(F.col("event_type").isin("click", "view")).select(
        F.col("event_id").alias("touch_event_id"),
        F.col("event_type").alias("touch_type"),
        F.col("user_id").alias("t_user"),
        F.unix_micros("ts").alias("t_us"),
    )
    joined = purchases.join(
        touches,
        (F.col("user_id") == F.col("t_user"))
        & (F.col("t_us") < F.col("p_us"))
        & (F.col("t_us") >= F.col("p_us") - F.lit(_ATTR_WINDOW_S * 1_000_000).cast("long")),
    )
    w = Window.partitionBy("purchase_event_id")
    asc = w.orderBy("t_us", "touch_event_id")
    desc = w.orderBy(F.desc("t_us"), F.desc("touch_event_id"))
    ranked = joined.select(
        "purchase_event_id",
        "user_id",
        "touch_event_id",
        "touch_type",
        F.row_number().over(asc).alias("rn_first"),
        F.row_number().over(desc).alias("rn_last"),
        F.count(F.lit(1)).over(w).alias("n"),
    )
    credit = (
        F.when(F.col("n") == 1, F.lit(1.0))
        .when(F.col("n") == 2, F.lit(0.5))
        .when(F.col("rn_first") == 1, F.lit(0.4))
        .when(F.col("rn_last") == 1, F.lit(0.4))
        .otherwise(F.lit(0.2) / (F.col("n") - 2))
    )
    return ranked.select(
        "purchase_event_id",
        "user_id",
        "touch_event_id",
        "touch_type",
        F.round(credit, 6).alias("credit"),
    ).orderBy("purchase_event_id", "touch_event_id")


SQL_ATTRIBUTION_USHAPED = f"""
WITH purchases AS (
  SELECT event_id AS purchase_event_id, user_id, epoch_us(ts) AS p_us
  FROM events WHERE event_type = 'purchase'
), touches AS (
  SELECT event_id AS touch_event_id, event_type AS touch_type,
         user_id AS t_user, epoch_us(ts) AS t_us
  FROM events WHERE event_type IN ('click', 'view')
), joined AS (
  SELECT p.purchase_event_id, p.user_id, t.touch_event_id, t.touch_type, t.t_us
  FROM purchases p JOIN touches t
    ON t.t_user = p.user_id
   AND t.t_us < p.p_us
   AND t.t_us >= p.p_us - CAST({_ATTR_WINDOW_S} AS BIGINT) * 1000000
), ranked AS (
  SELECT purchase_event_id, user_id, touch_event_id, touch_type,
         row_number() OVER (PARTITION BY purchase_event_id
                            ORDER BY t_us, touch_event_id) AS rn_first,
         row_number() OVER (PARTITION BY purchase_event_id
                            ORDER BY t_us DESC, touch_event_id DESC) AS rn_last,
         count(*) OVER (PARTITION BY purchase_event_id) AS n
  FROM joined
)
SELECT purchase_event_id, user_id, touch_event_id, touch_type,
       round(CASE WHEN n = 1 THEN 1.0
                  WHEN n = 2 THEN 0.5
                  WHEN rn_first = 1 THEN 0.4
                  WHEN rn_last = 1 THEN 0.4
                  ELSE 0.2 / (n - 2) END, 6) AS credit
FROM ranked
ORDER BY purchase_event_id, touch_event_id
"""


# --- Day-of-week seasonality index ---
def q_seasonality_dow(spark, sf_dir):
    """Per-event-type day-of-week seasonality index: mean daily count
    on that weekday divided by the overall mean daily count — the
    multiplicative seasonal profile behind staffing/capacity planning
    (index > 1 = busier-than-average weekday).

    Scale shape: events collapse to the bounded (type, day) table
    once; both means are integer-count ratios computed per group, so
    the only float is the final division (rounded).
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.date_format("ts", "E").alias("dow"),
    ).agg(F.count(F.lit(1)).alias("n"))
    per_dow = daily.groupBy("event_type", "dow").agg(
        F.sum("n").alias("n_events"), F.count(F.lit(1)).alias("n_days")
    )
    overall = daily.groupBy("event_type").agg(
        F.sum("n").alias("tot_events"), F.count(F.lit(1)).alias("tot_days")
    )
    return (
        per_dow.join(F.broadcast(overall), "event_type")
        .select(
            "event_type",
            "dow",
            F.col("n_events").cast("long").alias("n_events"),
            F.round(
                (F.col("n_events") / F.col("n_days"))
                / (F.col("tot_events") / F.col("tot_days")),
                6,
            ).alias("seasonal_index"),
        )
        .orderBy("event_type", "dow")
    )


SQL_SEASONALITY_DOW = """
WITH daily AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
         strftime(ts, '%a') AS dow, count(*) AS n
  FROM events GROUP BY 1, 2, 3
), per_dow AS (
  SELECT event_type, dow, CAST(sum(n) AS BIGINT) AS n_events,
         count(*) AS n_days
  FROM daily GROUP BY event_type, dow
), overall AS (
  SELECT event_type, CAST(sum(n) AS BIGINT) AS tot_events,
         count(*) AS tot_days
  FROM daily GROUP BY event_type
)
SELECT p.event_type, p.dow, p.n_events,
       round((p.n_events * 1.0 / p.n_days) / (o.tot_events * 1.0 / o.tot_days), 6) AS seasonal_index
FROM per_dow p JOIN overall o ON o.event_type = p.event_type
ORDER BY p.event_type, p.dow
"""


# --- Gini coefficient of revenue concentration ---
def q_revenue_gini(spark, sf_dir):
    """Gini coefficient of per-part revenue concentration (0 = equal,
    → 1 = concentrated) via the rank formula
    G = (2·Σ i·x_i) / (n·Σ x) − (n+1)/n over revenue sorted ascending
    — the one-number inequality summary beside `pareto_abc`'s banded
    view.

    Scale shape: parts collapse to one revenue row each; the rank is
    ONE ordered window over the bounded per-part table, and the final
    statistic is a single aggregation. Revenue is rounded BEFORE
    ranking so cross-engine float noise cannot permute equal ranks.
    """
    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1.0 - F.col("l_discount"))), 4).alias(
            "revenue"
        )
    )
    w = Window.orderBy("revenue", "l_partkey")
    ranked = rev.select(
        "revenue", F.row_number().over(w).cast("double").alias("i")
    )
    return ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.round(F.sum("revenue"), 4).alias("total_revenue"),
        F.round(
            (2.0 * F.sum(F.col("i") * F.col("revenue")))
            / (F.count(F.lit(1)) * F.sum("revenue"))
            - (F.count(F.lit(1)) + 1.0) / F.count(F.lit(1)),
            6,
        ).alias("gini"),
    )


SQL_REVENUE_GINI = """
WITH rev AS (
  SELECT l_partkey, round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue
  FROM lineitem GROUP BY l_partkey
), ranked AS (
  SELECT revenue,
         CAST(row_number() OVER (ORDER BY revenue, l_partkey) AS DOUBLE) AS i
  FROM rev
)
SELECT CAST(count(*) AS BIGINT) AS n_parts,
       round(sum(revenue), 4) AS total_revenue,
       round((2.0 * sum(i * revenue)) / (count(*) * sum(revenue))
             - (count(*) + 1.0) / count(*), 6) AS gini
FROM ranked
"""


# --- Forecast backtest: naive vs seasonal-naive sMAPE ---
def q_forecast_backtest(spark, sf_dir):
    """Backtest the two standard no-model forecasters on each daily
    metric: naive (yesterday's value) and seasonal-naive (same weekday
    last week), scored by sMAPE — the baseline every real forecasting
    model must beat, and the honest way to report it (sMAPE is
    symmetric and scale-free).

    Scale shape: events collapse to the bounded (type, day) series;
    both forecasts are lag windows (1 and 7) per type, and the score
    is one aggregation — no model state anywhere.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).cast("double").alias("x"))
    w = Window.partitionBy("event_type").orderBy("day")
    with_fc = daily.select(
        "event_type",
        "day",
        "x",
        F.lag("x", 1).over(w).alias("fc_naive"),
        F.lag("x", 7).over(w).alias("fc_snaive"),
    )

    def smape(fc):
        return F.round(
            F.avg(
                F.when(
                    fc.isNotNull(),
                    2.0 * F.abs(F.col("x") - fc) / (F.abs(F.col("x")) + F.abs(fc)),
                )
            ),
            6,
        )

    return (
        with_fc.groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("fc_naive").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_scored"),
            smape(F.col("fc_naive")).alias("smape_naive"),
            smape(F.col("fc_snaive")).alias("smape_seasonal_naive"),
        )
        .orderBy("event_type")
    )


SQL_FORECAST_BACKTEST = """
WITH daily AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
         CAST(count(*) AS DOUBLE) AS x
  FROM events GROUP BY 1, 2
), with_fc AS (
  SELECT event_type, day, x,
         lag(x, 1) OVER (PARTITION BY event_type ORDER BY day) AS fc_naive,
         lag(x, 7) OVER (PARTITION BY event_type ORDER BY day) AS fc_snaive
  FROM daily
)
SELECT event_type,
       CAST(sum(CASE WHEN fc_naive IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_scored,
       round(avg(CASE WHEN fc_naive IS NOT NULL
                 THEN 2.0 * abs(x - fc_naive) / (abs(x) + abs(fc_naive)) END), 6) AS smape_naive,
       round(avg(CASE WHEN fc_snaive IS NOT NULL
                 THEN 2.0 * abs(x - fc_snaive) / (abs(x) + abs(fc_snaive)) END), 6) AS smape_seasonal_naive
FROM with_fc
GROUP BY event_type ORDER BY event_type
"""


WORKLOADS = {
    "dq_checks": (q_dq_checks, SQL_DQ_CHECKS),
    "compaction_plan": (q_compaction_plan, SQL_COMPACTION_PLAN),
    "attribution_last_touch": (q_attribution_last_touch, SQL_ATTRIBUTION_LAST_TOUCH),
    "peak_concurrency": (q_peak_concurrency, SQL_PEAK_CONCURRENCY),
    "session_path_topk": (q_session_path_topk, SQL_SESSION_PATH_TOPK),
    "rolling_corr": (q_rolling_corr, SQL_ROLLING_CORR),
    "item_cf_topk": (q_item_cf_topk, SQL_ITEM_CF_TOPK),
    "survival_km": (q_survival_km, SQL_SURVIVAL_KM),
    "ab_test_zstat": (q_ab_test_zstat, SQL_AB_TEST_ZSTAT),
    "changepoint_ph": (q_changepoint_ph, SQL_CHANGEPOINT_PH),
    "attribution_linear": (q_attribution_linear, SQL_ATTRIBUTION_LINEAR),
    "attribution_ushaped": (q_attribution_ushaped, SQL_ATTRIBUTION_USHAPED),
    "seasonality_dow": (q_seasonality_dow, SQL_SEASONALITY_DOW),
    "revenue_gini": (q_revenue_gini, SQL_REVENUE_GINI),
    "forecast_backtest": (q_forecast_backtest, SQL_FORECAST_BACKTEST),
}
