"""Round-5 second closing batch: operator families the r01-r05 registry
still lacked, each in its 100 TB-safe shape —

  * ``weblog_parse_agg`` — regex log-line parsing (the classic
    scan-side ETL primitive): synthesize an Apache-combined-format
    line per event, then ``regexp_extract`` the fields back out and
    aggregate — the whole parse stays inside whole-stage codegen
    (JVM regex, no Python);
  * ``spatial_join_blocked`` — nearest-neighbor spatial join with
    grid-cell blocking: 3x3 neighbor-cell candidate join (small side
    exploded), planar metric chosen so blocking is provably lossless,
    per-probe argmin via a packed-integer min (map-side combinable);
  * ``decision_stump_fit`` — distributed decision-stump training:
    one pass collapses the corpus to per-bin integer sufficient
    statistics (bounded by the VALUE range, not the row count), then
    every split candidate's weighted Gini is scored from prefix sums;
  * ``column_entropy_profile`` — per-column profiling (distinct
    count, deterministic mode, Shannon entropy in integer
    micro-nats) across three categorical columns of two tables;
  * ``bootstrap_ci`` — 100-replicate hash-bootstrap confidence
    interval for a mean: replicate membership is md5-derived (never
    ``rand()``, so it is reproducible and oracle-checkable), sums are
    integer cents, the percentile pick is a window over exactly 100
    replicate rows;
  * ``mode_impute`` — per-group mode imputation of a masked
    categorical column (deterministic most-frequent-then-smallest
    tie-break via min-of-struct, no window over the corpus).

Every query is oracle-backed. Per the registry ordering invariant they
are APPENDED after the never-attested block and enter the r06+ window.

Reference scope: the reference repo (/root/reference, RDD coursework)
has no regex-ETL/spatial/stump/bootstrap surface; these extend
SURVEY.md §2.9's pipeline inventory the same way curation1-4 did.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cs744_big_data_system_spark.operators.dedup import md5_int60
from cs744_big_data_system_spark.sources.readers import load_table

__all__ = ["WORKLOADS"]


# --- Regex log parsing -------------------------------------------------
# The synthetic line is built from event integers only (no timestamp
# formatting, which could diverge between engines); the literal bracket
# timestamp keeps the combined-log shape honest for the regex.
_LOG_RE = r'^(\S+) \S+ \S+ \[[^\]]+\] "(\S+) (\S+) [^"]*" (\d+) (\d+)$'


def q_weblog_parse_agg(spark, sf_dir):
    """Scan-side regex ETL: render each event as an Apache
    combined-log line, parse it back with ``regexp_extract``, and
    aggregate request count + bytes by method and status class.

    Scale shape: build + parse + aggregate is ONE scan with zero
    shuffles before the 10-group aggregation; the regex runs in the
    JVM inside whole-stage codegen (never a Python UDF). The same
    pattern string drives Spark's Java regex and DuckDB's RE2 — the
    capture groups used here are in the common dialect."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "event_type")
    line = F.concat(
        (F.col("user_id") % 224 + 10).cast("string"),
        F.lit("."),
        (F.col("user_id") % 256).cast("string"),
        F.lit("."),
        (F.col("event_id") % 256).cast("string"),
        F.lit(".1 - - [01/Jan/2026:00:00:00 +0000] \""),
        F.when(F.col("event_type") == "click", "GET")
        .when(F.col("event_type") == "view", "HEAD")
        .when(F.col("event_type") == "purchase", "POST")
        .when(F.col("event_type") == "signup", "PUT")
        .otherwise("DELETE"),
        F.lit(" /page/"),
        (F.col("event_id") % 50).cast("string"),
        F.lit(" HTTP/1.1\" "),
        F.when(F.col("event_id") % 10 == 0, 404)
        .when(F.col("event_id") % 10 == 1, 500)
        .otherwise(200)
        .cast("string"),
        F.lit(" "),
        (F.col("event_id") % 10000).cast("string"),
    )
    parsed = ev.select(line.alias("line")).select(
        F.regexp_extract("line", _LOG_RE, 2).alias("method"),
        F.regexp_extract("line", _LOG_RE, 4).cast("long").alias("status"),
        F.regexp_extract("line", _LOG_RE, 5).cast("long").alias("bytes"),
    )
    return (
        parsed.groupBy("method", (F.col("status") - F.col("status") % 100).alias("status_class"))
        .agg(
            F.count(F.lit(1)).alias("n_req"),
            F.sum("bytes").alias("bytes_sum"),
        )
        .select(
            "method",
            F.col("status_class").cast("long").alias("status_class"),
            F.col("n_req").cast("long").alias("n_req"),
            F.col("bytes_sum").cast("long").alias("bytes_sum"),
        )
    )


SQL_WEBLOG_PARSE_AGG = r"""
WITH lines AS (
  SELECT CAST(user_id % 224 + 10 AS VARCHAR) || '.' ||
         CAST(user_id % 256 AS VARCHAR) || '.' ||
         CAST(event_id % 256 AS VARCHAR) ||
         '.1 - - [01/Jan/2026:00:00:00 +0000] "' ||
         CASE event_type WHEN 'click' THEN 'GET' WHEN 'view' THEN 'HEAD'
              WHEN 'purchase' THEN 'POST' WHEN 'signup' THEN 'PUT'
              ELSE 'DELETE' END ||
         ' /page/' || CAST(event_id % 50 AS VARCHAR) || ' HTTP/1.1" ' ||
         CAST(CASE WHEN event_id % 10 = 0 THEN 404
                   WHEN event_id % 10 = 1 THEN 500 ELSE 200 END AS VARCHAR) ||
         ' ' || CAST(event_id % 10000 AS VARCHAR) AS line
  FROM events
), parsed AS (
  SELECT regexp_extract(line,
           '^(\S+) \S+ \S+ \[[^\]]+\] "(\S+) (\S+) [^"]*" (\d+) (\d+)$', 2)
           AS method,
         CAST(regexp_extract(line,
           '^(\S+) \S+ \S+ \[[^\]]+\] "(\S+) (\S+) [^"]*" (\d+) (\d+)$', 4)
           AS BIGINT) AS status,
         CAST(regexp_extract(line,
           '^(\S+) \S+ \S+ \[[^\]]+\] "(\S+) (\S+) [^"]*" (\d+) (\d+)$', 5)
           AS BIGINT) AS bytes
  FROM lines
)
SELECT method, status - status % 100 AS status_class,
       CAST(count(*) AS BIGINT) AS n_req,
       CAST(sum(bytes) AS BIGINT) AS bytes_sum
FROM parsed
GROUP BY method, status_class
"""


# --- Grid-blocked nearest-neighbor spatial join -------------------------
# Synthetic coordinates are md5-derived from the keys (deterministic in
# both engines, TESTDATA has no geo columns). The metric is PLANAR
# (dlat² + (0.7·dlon)²) — pure multiply/add, so Spark and DuckDB produce
# bit-identical doubles (no libm trig). Match radius d ≤ 0.7 guarantees
# |dlat| ≤ 0.7 < 1 and |dlon| ≤ 1, and two points with |Δ| ≤ 1 can
# never be more than one 1°-grid cell apart (⌊b⌋ ≥ ⌊a⌋ + 2 ⇒ b − a > 1
# strictly) — so the 3x3 neighbor-cell candidate join is LOSSLESS and
# the blocked plan equals the oracle's exhaustive cross join.
_SPATIAL_D2_MAX = 0.49  # d ≤ 0.7 in the scaled planar metric


def _lat_expr(key_col):
    return (F.pmod(md5_int60(F.concat(F.lit("lat#"), key_col.cast("string"))), F.lit(1800000)) / 10000.0 - 90.0)


def _lon_expr(key_col):
    return (F.pmod(md5_int60(F.concat(F.lit("lon#"), key_col.cast("string"))), F.lit(3600000)) / 10000.0 - 180.0)


def q_spatial_join_blocked(spark, sf_dir):
    """Nearest supplier within radius for every customer, via grid
    blocking: suppliers (small side) are exploded to their 3x3
    neighbor cells and broadcast; customers probe with ONE narrow
    scan; per-customer argmin is a packed-BIGINT ``min`` (map-side
    combinable — no window, no shuffle of the probe side beyond the
    final small aggregation).

    At 100 TB the same plan holds with the explode on whichever side
    is smaller and a repartition on cell for the probe side; the
    candidate set per probe is bounded by cell occupancy, never by
    corpus size."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        _lat_expr(F.col("c_custkey")).alias("lat"),
        _lon_expr(F.col("c_custkey")).alias("lon"),
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        _lat_expr(F.col("s_suppkey") + 1000000).alias("lat"),
        _lon_expr(F.col("s_suppkey") + 1000000).alias("lon"),
    )
    offsets = spark.range(3).select((F.col("id") - 1).alias("dx")).crossJoin(
        spark.range(3).select((F.col("id") - 1).alias("dy"))
    )
    supp_cells = supp.crossJoin(F.broadcast(offsets)).select(
        "s_suppkey",
        F.col("lat").alias("s_lat"),
        F.col("lon").alias("s_lon"),
        (F.floor("lat") + F.col("dy")).alias("cell_y"),
        (F.floor("lon") + F.col("dx")).alias("cell_x"),
    )
    probe = cust.select(
        "c_custkey",
        "lat",
        "lon",
        F.floor("lat").alias("cell_y"),
        F.floor("lon").alias("cell_x"),
    )
    d2 = (F.col("lat") - F.col("s_lat")) * (F.col("lat") - F.col("s_lat")) + (
        (F.col("lon") - F.col("s_lon")) * 0.7
    ) * ((F.col("lon") - F.col("s_lon")) * 0.7)
    cand = (
        probe.join(F.broadcast(supp_cells), ["cell_y", "cell_x"])
        .select("c_custkey", "s_suppkey", d2.alias("d2"))
        .filter(F.col("d2") <= F.lit(_SPATIAL_D2_MAX))
    )
    packed = (
        F.floor(F.col("d2") * 1e6 + F.lit(0.5)).cast("long") * F.lit(1000000)
        + F.col("s_suppkey")
    )
    return (
        cand.groupBy("c_custkey")
        .agg(F.min(packed).alias("packed"))
        .select(
            "c_custkey",
            (F.col("packed") % 1000000).cast("long").alias("nearest_suppkey"),
            (F.col("packed") / 1000000).cast("long").alias("d2_ppm"),
        )
    )


SQL_SPATIAL_JOIN_BLOCKED = f"""
WITH cust AS (
  SELECT c_custkey,
         CAST(('0x' || substr(md5('lat#' || CAST(c_custkey AS VARCHAR)), 1, 15)) AS BIGINT)
           % 1800000 / 10000.0 - 90.0 AS lat,
         CAST(('0x' || substr(md5('lon#' || CAST(c_custkey AS VARCHAR)), 1, 15)) AS BIGINT)
           % 3600000 / 10000.0 - 180.0 AS lon
  FROM customer
), supp AS (
  SELECT s_suppkey,
         CAST(('0x' || substr(md5('lat#' || CAST(s_suppkey + 1000000 AS VARCHAR)), 1, 15)) AS BIGINT)
           % 1800000 / 10000.0 - 90.0 AS lat,
         CAST(('0x' || substr(md5('lon#' || CAST(s_suppkey + 1000000 AS VARCHAR)), 1, 15)) AS BIGINT)
           % 3600000 / 10000.0 - 180.0 AS lon
  FROM supplier
), cand AS (
  SELECT c.c_custkey, s.s_suppkey,
         (c.lat - s.lat) * (c.lat - s.lat)
         + ((c.lon - s.lon) * 0.7) * ((c.lon - s.lon) * 0.7) AS d2
  FROM cust c CROSS JOIN supp s
)
SELECT c_custkey,
       CAST(min(CAST(floor(d2 * 1e6 + 0.5) AS BIGINT) * 1000000 + s_suppkey)
            % 1000000 AS BIGINT) AS nearest_suppkey,
       CAST(min(CAST(floor(d2 * 1e6 + 0.5) AS BIGINT) * 1000000 + s_suppkey)
            // 1000000 AS BIGINT) AS d2_ppm
FROM cand
WHERE d2 <= {_SPATIAL_D2_MAX}
GROUP BY c_custkey
"""


# --- Decision-stump training from sufficient statistics -----------------
def q_decision_stump_fit(spark, sf_dir):
    """Train a decision stump (best single threshold on ``value``
    predicting ``event_type = 'purchase'``) the distributed way: ONE
    scan collapses the corpus to per-bin integer counts (bin = ⌊value⌋,
    bounded by the value RANGE), prefix sums over the bins give every
    split's left/right sufficient statistics, and the weighted Gini is
    scored per candidate row. Returns all viable split candidates with
    their impurity, so the argmin — and the whole search trajectory —
    is hash-checked.

    Numerics: every count is a BIGINT; the Gini expression divides
    identical integers in the same order in both engines, and the
    result is floored to integer ppm — bit-stable. Splits with an
    empty side are excluded BEFORE any division (ANSI-safe).

    Scale shape: the corpus-sized work is one groupBy on a bounded
    integer key with map-side combine; the window runs over the
    ~330-row bin table (the peak_concurrency adjudication)."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").select(
        F.floor("value").cast("long").alias("bin"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("pos"),
    )
    bins = ev.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"), F.sum("pos").alias("p")
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pref = bins.select(
        "bin",
        F.sum("n").over(w).alias("nl"),
        F.sum("p").over(w).alias("pl"),
    )
    tot = bins.agg(F.sum("n").alias("nt"), F.sum("p").alias("pt"))
    cand = (
        pref.crossJoin(F.broadcast(tot))
        .select(
            F.col("bin").alias("split_bin"),
            "nl",
            "pl",
            (F.col("nt") - F.col("nl")).alias("nr"),
            (F.col("pt") - F.col("pl")).alias("pr"),
            "nt",
        )
        .filter((F.col("nl") > 0) & (F.col("nr") > 0))
    )
    nl, pl, nr, pr, nt = (F.col(c).cast("double") for c in ("nl", "pl", "nr", "pr", "nt"))
    gini = (
        (nl - (pl * pl + (nl - pl) * (nl - pl)) / nl)
        + (nr - (pr * pr + (nr - pr) * (nr - pr)) / nr)
    ) / nt
    return cand.select(
        "split_bin",
        F.col("nl").cast("long").alias("n_left"),
        F.col("pl").cast("long").alias("pos_left"),
        F.col("nr").cast("long").alias("n_right"),
        F.col("pr").cast("long").alias("pos_right"),
        F.floor(gini * 1e6 + F.lit(0.5)).cast("long").alias("gini_ppm"),
    )


SQL_DECISION_STUMP_FIT = """
WITH ev AS (
  SELECT CAST(floor(value) AS BIGINT) AS bin,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
  FROM events
), bins AS (
  SELECT bin, CAST(count(*) AS BIGINT) AS n, CAST(sum(pos) AS BIGINT) AS p
  FROM ev GROUP BY bin
), pref AS (
  SELECT bin,
         CAST(sum(n) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING
              AND CURRENT ROW) AS BIGINT) AS nl,
         CAST(sum(p) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING
              AND CURRENT ROW) AS BIGINT) AS pl
  FROM bins
), tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS nt, CAST(sum(p) AS BIGINT) AS pt FROM bins
), cand AS (
  SELECT bin AS split_bin, nl, pl, nt - nl AS nr, pt - pl AS pr, nt
  FROM pref CROSS JOIN tot
  WHERE nl > 0 AND nt - nl > 0
)
SELECT split_bin, nl AS n_left, pl AS pos_left, nr AS n_right, pr AS pos_right,
       CAST(floor((
         (CAST(nl AS DOUBLE)
          - (CAST(pl AS DOUBLE) * CAST(pl AS DOUBLE)
             + (CAST(nl AS DOUBLE) - CAST(pl AS DOUBLE))
               * (CAST(nl AS DOUBLE) - CAST(pl AS DOUBLE))) / CAST(nl AS DOUBLE))
         + (CAST(nr AS DOUBLE)
          - (CAST(pr AS DOUBLE) * CAST(pr AS DOUBLE)
             + (CAST(nr AS DOUBLE) - CAST(pr AS DOUBLE))
               * (CAST(nr AS DOUBLE) - CAST(pr AS DOUBLE))) / CAST(nr AS DOUBLE))
       ) / CAST(nt AS DOUBLE) * 1e6 + 0.5) AS BIGINT) AS gini_ppm
FROM cand
"""


# --- Per-column categorical profiling -----------------------------------
def _entropy_profile(df, col_name, label):
    """(column, n_total, n_distinct, mode value, Σ cnt·qln(p) micro-nats)
    for one categorical column — counts exact, ln quantized via
    ml/naive_bayes._q_ln so the entropy lands in a BIGINT."""
    from cs744_big_data_system_spark.ml.naive_bayes import _q_ln

    cnts = df.groupBy(F.col(col_name).alias("v")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    tot = cnts.agg(F.sum("cnt").alias("n_total"))
    return (
        cnts.crossJoin(F.broadcast(tot))
        .agg(
            F.min(F.col("n_total")).alias("n_total"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.min(F.struct((-F.col("cnt")).alias("nc"), F.col("v").alias("v"))).alias(
                "m"
            ),
            (-F.sum(F.col("cnt") * _q_ln(F.col("cnt") / F.col("n_total")))).alias(
                "entropy_micro_sum"
            ),
        )
        .select(
            F.lit(label).alias("column_name"),
            F.col("n_total").cast("long").alias("n_total"),
            F.col("n_distinct").cast("long").alias("n_distinct"),
            F.col("m.v").alias("mode_value"),
            F.col("entropy_micro_sum").cast("long").alias("entropy_micro_sum"),
        )
    )


def q_column_entropy_profile(spark, sf_dir):
    """Data-profiling sweep: distinct count, deterministic mode
    (most-frequent, then smallest value — min-of-struct, no window),
    and Shannon entropy (integer micro-nats, count-weighted) for three
    categorical columns across two tables.

    Scale shape: each column is one map-side-combinable groupBy on a
    low-cardinality key plus a scalar aggregate — the profile of a
    100 TB table costs one scan per table (the three single-column
    passes here keep the oracle simple; a production profile fuses
    them into one pass of grouping-sets)."""
    docs = load_table(spark, sf_dir, "documents")
    ev = load_table(spark, sf_dir, "events")
    return (
        _entropy_profile(docs, "lang", "documents.lang")
        .unionByName(_entropy_profile(docs, "source", "documents.source"))
        .unionByName(_entropy_profile(ev, "event_type", "events.event_type"))
    )


SQL_COLUMN_ENTROPY_PROFILE = """
WITH profile AS (
  SELECT 'documents.lang' AS column_name, lang AS v, count(*) AS cnt FROM documents GROUP BY lang
  UNION ALL
  SELECT 'documents.source', source, count(*) FROM documents GROUP BY source
  UNION ALL
  SELECT 'events.event_type', event_type, count(*) FROM events GROUP BY event_type
), tot AS (
  SELECT column_name, CAST(sum(cnt) AS BIGINT) AS n_total FROM profile GROUP BY column_name
), modes AS (
  SELECT column_name, v AS mode_value
  FROM (
    SELECT column_name, v,
           row_number() OVER (PARTITION BY column_name
                              ORDER BY cnt DESC, v) AS rn
    FROM profile
  ) WHERE rn = 1
)
SELECT p.column_name,
       any_value(t.n_total) AS n_total,
       CAST(count(*) AS BIGINT) AS n_distinct,
       any_value(m.mode_value) AS mode_value,
       CAST(-sum(p.cnt * CAST(floor(ln(p.cnt * 1.0 / t.n_total) * 1000000 + 0.5 + 1e-9)
            AS BIGINT)) AS BIGINT) AS entropy_micro_sum
FROM profile p JOIN tot t USING (column_name) JOIN modes m USING (column_name)
GROUP BY p.column_name
"""


# --- Hash-bootstrap confidence interval ----------------------------------
_BOOT_B = 100


def q_bootstrap_ci(spark, sf_dir):
    """95% bootstrap CI for mean(o_totalprice): each of the 100
    replicates keeps an md5-selected half-sample (reproducible across
    runs/engines — ``rand()`` bootstraps can't be oracle-checked),
    replicate sums are integer CENTS, and the percentile pick is a
    row_number over exactly 100 replicate rows.

    Scale shape: the 100x expansion is a flatMap feeding a partial
    aggregation — the combiner collapses it to 100 partial sums per
    task before any shuffle (at 100 TB one would fold the replicate
    loop into per-partition accumulator arrays; the Spark plan here
    already has that shape via hash-agg map-side combine). Each row
    is hashed ONCE into a 120-bit pool (two md5s); replicate b's
    membership is bit b of the pool — hashing cost is per row, not
    per (row × replicate) (measured 10x on the expanded join)."""
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long").alias("cents"),
        md5_int60(F.concat(F.col("o_orderkey").cast("string"), F.lit("#A"))).alias("h1"),
        md5_int60(F.concat(F.col("o_orderkey").cast("string"), F.lit("#B"))).alias("h2"),
    )
    reps = orders.crossJoin(
        F.broadcast(spark.range(_BOOT_B).select(F.col("id").alias("b")))
    ).filter(
        F.expr(
            "CASE WHEN b < 60 THEN shiftright(h1, CAST(b AS INT)) "
            "ELSE shiftright(h2, CAST(b AS INT) - 60) END % 2 = 0"
        )
    )
    means = reps.groupBy("b").agg(
        F.floor(
            F.sum("cents").cast("double") / F.count(F.lit(1)).cast("double") * 10.0
            + F.lit(0.5)
        )
        .cast("long")
        .alias("mean_milli")
    )
    w = Window.orderBy("mean_milli", "b")
    ranked = means.select("mean_milli", F.row_number().over(w).alias("r"))
    point = orders.agg(
        F.floor(
            F.sum("cents").cast("double") / F.count(F.lit(1)).cast("double") * 10.0
            + F.lit(0.5)
        )
        .cast("long")
        .alias("point_mean_milli")
    )
    ci = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_replicates"),
        F.min(F.when(F.col("r") == 3, F.col("mean_milli"))).alias("ci_lo_milli"),
        F.min(F.when(F.col("r") == 98, F.col("mean_milli"))).alias("ci_hi_milli"),
    )
    return ci.crossJoin(F.broadcast(point)).select(
        "n_replicates", "point_mean_milli", "ci_lo_milli", "ci_hi_milli"
    )


SQL_BOOTSTRAP_CI = f"""
WITH o AS (
  SELECT o_orderkey, CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
         CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || '#A'), 1, 15))
              AS BIGINT) AS h1,
         CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || '#B'), 1, 15))
              AS BIGINT) AS h2
  FROM orders
), reps AS (
  SELECT b.range AS b, o.cents
  FROM o CROSS JOIN range({_BOOT_B}) b
  WHERE (CASE WHEN b.range < 60 THEN (h1 >> CAST(b.range AS INT))
         ELSE (h2 >> (CAST(b.range AS INT) - 60)) END) % 2 = 0
), means AS (
  SELECT b, CAST(floor(sum(cents) * 1.0 / count(*) * 10.0 + 0.5) AS BIGINT)
            AS mean_milli
  FROM reps GROUP BY b
), ranked AS (
  SELECT mean_milli, row_number() OVER (ORDER BY mean_milli, b) AS r FROM means
), point AS (
  SELECT CAST(floor(sum(cents) * 1.0 / count(*) * 10.0 + 0.5) AS BIGINT)
         AS point_mean_milli
  FROM o
)
SELECT CAST(count(*) AS BIGINT) AS n_replicates,
       any_value(point.point_mean_milli) AS point_mean_milli,
       min(CASE WHEN r = 3 THEN mean_milli END) AS ci_lo_milli,
       min(CASE WHEN r = 98 THEN mean_milli END) AS ci_hi_milli
FROM ranked CROSS JOIN point
"""


# --- Per-group mode imputation -------------------------------------------
def q_mode_impute(spark, sf_dir):
    """Impute a masked categorical: documents whose ``n_chars % 7 = 0``
    have ``lang`` treated as missing and receive their source's mode
    lang from the observed remainder (most-frequent, then smallest —
    min-of-struct, map-side combinable, the window-free argmax).
    Returns per-source imputation audit rows.

    Scale shape: one groupBy(source, lang) on the observed slice, one
    min-of-struct per source (both combiner-friendly), one broadcast
    join back — the missing slice is never shuffled."""
    docs = load_table(spark, sf_dir, "documents").select(
        "source", "lang", (F.col("n_chars") % 7 == 0).alias("missing")
    )
    observed = docs.filter(~F.col("missing"))
    modes = (
        observed.groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("source")
        .agg(
            F.min(
                F.struct((-F.col("cnt")).alias("nc"), F.col("lang").alias("lang"))
            ).alias("m"),
            F.sum("cnt").alias("n_observed"),
        )
        .select("source", F.col("m.lang").alias("mode_lang"), "n_observed")
    )
    missing = docs.filter("missing").groupBy("source").agg(
        F.count(F.lit(1)).alias("n_missing")
    )
    return (
        missing.join(F.broadcast(modes), "source")
        .select(
            "source",
            "mode_lang",
            F.col("n_missing").cast("long").alias("n_missing"),
            F.col("n_observed").cast("long").alias("n_observed"),
        )
    )


SQL_MODE_IMPUTE = """
WITH docs AS (
  SELECT source, lang, n_chars % 7 = 0 AS missing FROM documents
), cnts AS (
  SELECT source, lang, CAST(count(*) AS BIGINT) AS cnt FROM docs
  WHERE NOT missing GROUP BY source, lang
), modes AS (
  SELECT c.source, c.lang AS mode_lang, t.n_observed
  FROM (
    SELECT source, lang,
           row_number() OVER (PARTITION BY source ORDER BY cnt DESC, lang) AS rn
    FROM cnts
  ) c
  JOIN (SELECT source, CAST(sum(cnt) AS BIGINT) AS n_observed FROM cnts
        GROUP BY source) t USING (source)
  WHERE c.rn = 1
), missing AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_missing FROM docs WHERE missing
  GROUP BY source
)
SELECT m.source, modes.mode_lang, m.n_missing, modes.n_observed
FROM missing m JOIN modes USING (source)
"""


WORKLOADS = {
    "weblog_parse_agg": (q_weblog_parse_agg, SQL_WEBLOG_PARSE_AGG),
    "spatial_join_blocked": (q_spatial_join_blocked, SQL_SPATIAL_JOIN_BLOCKED),
    "decision_stump_fit": (q_decision_stump_fit, SQL_DECISION_STUMP_FIT),
    "column_entropy_profile": (q_column_entropy_profile, SQL_COLUMN_ENTROPY_PROFILE),
    "bootstrap_ci": (q_bootstrap_ci, SQL_BOOTSTRAP_CI),
    "mode_impute": (q_mode_impute, SQL_MODE_IMPUTE),
}
