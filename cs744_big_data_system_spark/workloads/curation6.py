"""Round-5 third closing batch: diagnostics and robust-statistics
operators a production 100 TB engine ships —

  * ``skew_report`` — join-key skew diagnosis: per-key cardinality
    profile, top heavy hitters, and an integer-ppm skew factor — the
    report that decides between plain shuffle join, AQE skew split,
    and salting BEFORE the expensive join runs;
  * ``graph_connected_components`` — explicit connected components
    over a planted-islands graph via the engine's min-label
    propagation operator (graph/connected_components.py, the same
    kernel that closes dedup candidate pairs into clusters); the
    island construction gives the oracle a CLOSED-FORM ground truth,
    so the iterative algorithm is checked against planted truth
    rather than against another iterative implementation;
  * ``robust_outlier_mad`` — median-absolute-deviation outlier audit
    (the robust alternative to z-scores, immune to the outliers it
    hunts): two exact-percentile passes, integer-micro outputs;
  * ``segmented_ab_welch`` — Welch's unequal-variance t statistic per
    segment in ONE aggregation pass (the many-segments-at-once A/B
    readout; ab_test_zstat is the single-population proportion twin):
    integer-cents sufficient statistics, derived moments in fixed
    IEEE expression order on both engines;
  * ``table_checksum_audit`` — order-independent table fingerprints
    (row-hash sums + null-cell counts) proving two physical layouts
    of the same data are identical without any join — the O(scan)
    migration-validation alternative to table_diff.

Every query is oracle-backed. Per the registry ordering invariant they
are APPENDED after the never-attested block and enter the r06+ window.

Reference scope: the reference repo (/root/reference, RDD coursework)
has no diagnostics/robust-stats surface; these extend SURVEY.md §2.9's
pipeline inventory the same way curation1-5 did.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cs744_big_data_system_spark.operators.dedup import md5_int60
from cs744_big_data_system_spark.sources.readers import load_table

__all__ = ["WORKLOADS"]


# --- Join-key skew diagnosis --------------------------------------------
_SKEW_TOPK = 5


def q_skew_report(spark, sf_dir):
    """Skew profile of the events⋈users join key: per-key counts, the
    top heavy hitters, and skew_ppm = max/avg in parts-per-million —
    computed entirely from integer counts, so the report is
    bit-reproducible.

    Scale shape: ONE map-side-combinable groupBy on the join key, a
    7-row scalar aggregate over the key histogram, and a top-k that
    plans as TakeOrderedAndProject — no window, no sort of the
    histogram. This is the probe a planner runs BEFORE a 100 TB join
    to pick shuffle vs AQE-skew-split vs salting."""
    keys = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    stats = keys.agg(
        F.sum("cnt").alias("total_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("cnt").alias("max_cnt"),
    )
    top = keys.orderBy(F.desc("cnt"), "user_id").limit(_SKEW_TOPK)
    return (
        top.crossJoin(F.broadcast(stats))
        .select(
            F.col("user_id").cast("long").alias("hot_key"),
            F.col("cnt").cast("long").alias("hot_cnt"),
            F.col("total_rows").cast("long").alias("total_rows"),
            F.col("n_keys").cast("long").alias("n_keys"),
            F.floor(
                F.col("max_cnt") * F.lit(1000000) * F.col("n_keys") / F.col("total_rows")
            )
            .cast("long")
            .alias("skew_ppm"),
        )
    )


SQL_SKEW_REPORT = f"""
WITH keys AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS cnt FROM events GROUP BY user_id
), stats AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS total_rows,
         CAST(count(*) AS BIGINT) AS n_keys,
         CAST(max(cnt) AS BIGINT) AS max_cnt
  FROM keys
), top AS (
  SELECT user_id, cnt FROM keys ORDER BY cnt DESC, user_id LIMIT {_SKEW_TOPK}
)
SELECT user_id AS hot_key, cnt AS hot_cnt, total_rows, n_keys,
       CAST(floor(max_cnt * 1000000.0 * n_keys / total_rows) AS BIGINT) AS skew_ppm
FROM top CROSS JOIN stats
"""


# --- Connected components on a planted-islands graph ---------------------
# Node i starts a new island iff i = 0 or md5(i) % 10 = 0, giving ~200
# islands of varying size (incl. singletons) over CC_N nodes. Edges are
# the +1 chain and +5 chords WITHIN an island, so the true component of
# node i is exactly its island head — a CLOSED-FORM oracle the
# iterative Spark kernel must reproduce. The graph is fixed-size
# (algorithm-parity entry, like graph_bfs_sql/graph_random_walks): its
# cost is corpus-independent by design.
CC_N = 2000


def _cc_boundary(col):
    return (col == 0) | (F.pmod(md5_int60(col.cast("string")), F.lit(10)) == 0)


def q_graph_connected_components(spark, sf_dir):
    """Explicit CC via graph/connected_components.py (min-label
    propagation with checkpointed supersteps and convergence
    early-stop — the kernel that closes dedup candidate pairs into
    clusters). Returns per-component size and min/max node, plus
    singleton islands (no edges) passed through untouched.

    Scale shape: the kernel's per-superstep cost is one edge-keyed
    join + min aggregation; converges within island diameter (≤ 19
    here, bound asserted by max_iterations=30 — the operator raises
    if it fails to converge)."""
    from cs744_big_data_system_spark.graph.connected_components import (
        connected_components,
    )

    nodes = spark.range(CC_N).select(F.col("id").alias("node"))
    heads = nodes.select(
        "node", _cc_boundary(F.col("node")).alias("is_head")
    )
    from pyspark.sql.window import Window

    w = Window.orderBy("node").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    comp_truth = heads.select(
        "node",
        F.max(F.when(F.col("is_head"), F.col("node"))).over(w).alias("island"),
    )
    a = comp_truth.alias("a")
    b1 = comp_truth.alias("b")
    edges = None
    for step in (1, 5):
        e = a.join(
            b1,
            (F.col("b.node") == F.col("a.node") + step)
            & (F.col("b.island") == F.col("a.island")),
        ).select(F.col("a.node").alias("src"), F.col("b.node").alias("dst"))
        edges = e if edges is None else edges.unionByName(e)

    cc = connected_components(edges, max_iterations=30)
    labeled = (
        nodes.join(cc, "node", "left")
        .select("node", F.coalesce("component", "node").alias("component"))
    )
    return (
        labeled.groupBy("component")
        .agg(
            F.count(F.lit(1)).alias("size"),
            F.max("node").alias("max_node"),
        )
        .select(
            F.col("component").cast("long").alias("component"),
            F.col("size").cast("long").alias("size"),
            F.col("max_node").cast("long").alias("max_node"),
        )
    )


SQL_GRAPH_CONNECTED_COMPONENTS = f"""
WITH nodes AS (
  SELECT t.range AS node FROM range({CC_N}) t
), comp AS (
  SELECT node,
         max(CASE WHEN node = 0 OR
                  CAST(('0x' || substr(md5(CAST(node AS VARCHAR)), 1, 15)) AS BIGINT)
                  % 10 = 0 THEN node END)
           OVER (ORDER BY node ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS component
  FROM nodes
)
SELECT CAST(component AS BIGINT) AS component,
       CAST(count(*) AS BIGINT) AS size,
       CAST(max(node) AS BIGINT) AS max_node
FROM comp GROUP BY component
"""


# --- Robust outliers via median absolute deviation -----------------------
def q_robust_outlier_mad(spark, sf_dir):
    """Per-event-type MAD outlier audit: median and MAD are EXACT
    percentiles (two passes), a row is an outlier when
    |x − med| > 3 · 1.4826 · MAD — the robust z-score that, unlike
    anomaly_zscore's mean/stddev, is not dragged by the outliers it
    hunts.

    Numerics: Spark ``percentile`` and DuckDB ``quantile_cont`` share
    the (n−1)·q interpolation rule, the threshold is the same IEEE
    expression on both engines, and outputs are integer micro-units.

    Scale shape: two group aggregations and one broadcast join back —
    at 100 TB the exact percentile swaps for approx_percentile with
    everything else unchanged."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", "value", "med", F.abs(F.col("value") - F.col("med")).alias("adev")
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad"),
        F.min("med").alias("med"),
        F.count(F.lit(1)).alias("n"),
    )
    flagged = dev.drop("med").join(F.broadcast(mad), "event_type").select(
        "event_type",
        "med",
        "mad",
        "n",
        (F.col("adev") > F.lit(3.0) * F.lit(1.4826) * F.col("mad")).alias("is_out"),
    )
    return (
        flagged.groupBy("event_type")
        .agg(
            F.min(F.floor(F.col("med") * 1e6 + F.lit(0.5)).cast("long")).alias(
                "med_micro"
            ),
            F.min(F.floor(F.col("mad") * 1e6 + F.lit(0.5)).cast("long")).alias(
                "mad_micro"
            ),
            F.min("n").cast("long").alias("n"),
            F.sum(F.col("is_out").cast("long")).cast("long").alias(
                "n_outliers"
            ),
        )
    )


SQL_ROBUST_OUTLIER_MAD = """
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY event_type
), dev AS (
  SELECT e.event_type, e.value, m.med, abs(e.value - m.med) AS adev
  FROM events e JOIN med m USING (event_type)
), mad AS (
  SELECT event_type, quantile_cont(adev, 0.5) AS mad,
         min(med) AS med, CAST(count(*) AS BIGINT) AS n
  FROM dev GROUP BY event_type
)
SELECT d.event_type,
       CAST(floor(min(m.med) * 1e6 + 0.5) AS BIGINT) AS med_micro,
       CAST(floor(min(m.mad) * 1e6 + 0.5) AS BIGINT) AS mad_micro,
       min(m.n) AS n,
       CAST(sum(CASE WHEN d.adev > 3.0 * 1.4826 * m.mad THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers
FROM dev d JOIN mad m USING (event_type)
GROUP BY d.event_type
"""


# --- Per-segment Welch t-test --------------------------------------------
def q_segmented_ab_welch(spark, sf_dir):
    """Welch's unequal-variance t statistic for value between two
    md5-assigned arms, PER SEGMENT — the many-segments-at-once A/B
    readout (ab_test_zstat is the single-population proportion twin).

    Numerics: sufficient statistics are integer CENTS (n, Σx, Σx²) so
    the per-segment moments derive from identical BIGINTs; the t
    expression is written in the same IEEE order on both engines and
    rounded to 6 dp with signed-zero normalization. Segments where
    either arm has n ≤ 1 are excluded BEFORE any division (ANSI-safe).

    Scale shape: ONE map-side-combinable groupBy(segment, arm) over
    the corpus; everything after runs on the 2·segments-row table."""
    ev = load_table(spark, sf_dir, "events").select(
        (F.col("user_id") % 8).alias("segment"),
        F.pmod(md5_int60(F.concat(F.lit("arm#"), F.col("user_id").cast("string"))), F.lit(2)).alias("arm"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    suff = ev.groupBy("segment", "arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("s1"),
        F.sum(F.col("cents") * F.col("cents")).alias("s2"),
    )
    a = suff.filter("arm = 0").select(
        "segment",
        F.col("n").alias("na"),
        F.col("s1").alias("sa"),
        F.col("s2").alias("qa"),
    )
    b = suff.filter("arm = 1").select(
        "segment",
        F.col("n").alias("nb"),
        F.col("s1").alias("sb"),
        F.col("s2").alias("qb"),
    )
    j = a.join(b, "segment").filter((F.col("na") > 1) & (F.col("nb") > 1))
    na, sa, qa = (F.col(c).cast("double") for c in ("na", "sa", "qa"))
    nb, sb, qb = (F.col(c).cast("double") for c in ("nb", "sb", "qb"))
    va = (qa - sa * sa / na) / (na - 1.0)
    vb = (qb - sb * sb / nb) / (nb - 1.0)
    se2 = va / na + vb / nb
    t = (sa / na - sb / nb) / F.sqrt(se2)
    return (
        j.filter(se2 > F.lit(0.0))  # degenerate zero-variance segments out pre-division
        .select(
            F.col("segment").cast("long").alias("segment"),
            F.col("na").cast("long").alias("n_a"),
            F.col("nb").cast("long").alias("n_b"),
            (F.round(t, 6) + F.lit(0.0)).alias("t_stat"),
        )
    )


SQL_SEGMENTED_AB_WELCH = """
WITH ev AS (
  SELECT user_id % 8 AS segment,
         CAST(('0x' || substr(md5('arm#' || CAST(user_id AS VARCHAR)), 1, 15))
              AS BIGINT) % 2 AS arm,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
), suff AS (
  SELECT segment, arm, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(cents) AS BIGINT) AS s1,
         CAST(sum(cents * cents) AS BIGINT) AS s2
  FROM ev GROUP BY segment, arm
), j AS (
  SELECT a.segment, a.n AS na, a.s1 AS sa, a.s2 AS qa,
         b.n AS nb, b.s1 AS sb, b.s2 AS qb
  FROM (SELECT * FROM suff WHERE arm = 0) a
  JOIN (SELECT * FROM suff WHERE arm = 1) b USING (segment)
  WHERE a.n > 1 AND b.n > 1
), m AS (
  SELECT segment, na, nb,
         CAST(sa AS DOUBLE) / CAST(na AS DOUBLE)
           - CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE) AS dmean,
         ((CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)
           / CAST(na AS DOUBLE)) / (CAST(na AS DOUBLE) - 1.0))
           / CAST(na AS DOUBLE)
         + ((CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)
           / CAST(nb AS DOUBLE)) / (CAST(nb AS DOUBLE) - 1.0))
           / CAST(nb AS DOUBLE) AS se2
  FROM j
)
SELECT CAST(segment AS BIGINT) AS segment, na AS n_a, nb AS n_b,
       round(dmean / sqrt(se2), 6) + 0.0 AS t_stat
FROM m WHERE se2 > 0.0
"""


# --- Order-independent table fingerprints ---------------------------------
def _fingerprint(df, label, row_str):
    """(table, n_rows, hash_sum) — md5-row-hash (mod 1e12 so a 100 TB
    row count can't overflow the BIGINT sum) summed order-independently."""
    return (
        df.select((F.pmod(md5_int60(row_str), F.lit(1000000000000))).alias("h"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("h").cast("long").alias("hash_sum"),
        )
        .select(F.lit(label).alias("table_name"), "n_rows", "hash_sum")
    )


def q_table_checksum_audit(spark, sf_dir):
    """Order-independent fingerprints for three tables, each computed
    TWICE — once from the natural scan and once from a reshuffled,
    column-reordered scan — proving the fingerprint sees data, not
    layout (`layout_invariant` = 1). The O(scan) migration-validation
    alternative to table_diff's full-outer join: no join, no sort,
    one commutative aggregation per scan.

    Numerics: doubles enter the row string as integer cents and
    timestamps as unix microseconds, so both engines hash identical
    bytes."""
    cust = load_table(spark, sf_dir, "customer")
    cust_str = F.concat_ws(
        "|",
        F.col("c_custkey").cast("string"),
        F.col("c_name"),
        F.col("c_nationkey").cast("string"),
        F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("long").cast("string"),
        F.col("c_mktsegment"),
    )
    orders = load_table(spark, sf_dir, "orders")
    ord_str = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.col("o_orderstatus"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long").cast("string"),
        # NTZ under a vanilla session → cast first (wall-clock identity
        # in the UTC container, same as readers.normalize_event_ts)
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).cast("string"),
        F.col("o_orderpriority"),
    )
    ev = load_table(spark, sf_dir, "events")
    ev_str = F.concat_ws(
        "|",
        F.col("event_id").cast("string"),
        F.unix_micros(F.col("ts")).cast("string"),
        F.col("user_id").cast("string"),
        F.col("event_type"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").cast("string"),
        F.col("props"),
    )
    base = (
        _fingerprint(cust, "customer", cust_str)
        .unionByName(_fingerprint(orders, "orders", ord_str))
        .unionByName(_fingerprint(ev, "events", ev_str))
    )
    # layout twin: different partitioning + column order, same data
    relaid = (
        _fingerprint(
            cust.repartition(7, "c_nationkey").select(
                "c_mktsegment", "c_acctbal", "c_name", "c_custkey", "c_nationkey"
            ),
            "customer",
            cust_str,
        )
        .unionByName(
            _fingerprint(
                orders.repartition(5, "o_custkey").select(
                    "o_orderpriority",
                    "o_orderdate",
                    "o_totalprice",
                    "o_orderstatus",
                    "o_custkey",
                    "o_orderkey",
                ),
                "orders",
                ord_str,
            )
        )
        .unionByName(
            _fingerprint(
                ev.repartition(9, "user_id").select(
                    "props", "value", "event_type", "user_id", "ts", "event_id"
                ),
                "events",
                ev_str,
            )
        )
    )
    r = relaid.select(
        "table_name",
        F.col("n_rows").alias("n_rows2"),
        F.col("hash_sum").alias("hash_sum2"),
    )
    return base.join(r, "table_name").select(
        "table_name",
        "n_rows",
        "hash_sum",
        (
            (F.col("n_rows") == F.col("n_rows2"))
            & (F.col("hash_sum") == F.col("hash_sum2"))
        )
        .cast("long")
        .alias("layout_invariant"),
    )


SQL_TABLE_CHECKSUM_AUDIT = """
WITH fp AS (
  SELECT 'customer' AS table_name, CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(CAST(('0x' || substr(md5(
             CAST(c_custkey AS VARCHAR) || '|' || c_name || '|' ||
             CAST(c_nationkey AS VARCHAR) || '|' ||
             CAST(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS VARCHAR) || '|' ||
             c_mktsegment), 1, 15)) AS BIGINT) % 1000000000000) AS BIGINT) AS hash_sum
  FROM customer
  UNION ALL
  SELECT 'orders', CAST(count(*) AS BIGINT),
         CAST(sum(CAST(('0x' || substr(md5(
             CAST(o_orderkey AS VARCHAR) || '|' || CAST(o_custkey AS VARCHAR) || '|' ||
             o_orderstatus || '|' ||
             CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS VARCHAR) || '|' ||
             CAST(epoch_us(o_orderdate) AS VARCHAR) || '|' ||
             o_orderpriority), 1, 15)) AS BIGINT) % 1000000000000) AS BIGINT)
  FROM orders
  UNION ALL
  SELECT 'events', CAST(count(*) AS BIGINT),
         CAST(sum(CAST(('0x' || substr(md5(
             CAST(event_id AS VARCHAR) || '|' ||
             CAST(epoch_us(ts) AS VARCHAR) || '|' ||
             CAST(user_id AS VARCHAR) || '|' || event_type || '|' ||
             CAST(CAST(floor(value * 100 + 0.5) AS BIGINT) AS VARCHAR) || '|' ||
             props), 1, 15)) AS BIGINT) % 1000000000000) AS BIGINT)
  FROM events
)
SELECT table_name, n_rows, hash_sum, CAST(1 AS BIGINT) AS layout_invariant
FROM fp
"""


WORKLOADS = {
    "skew_report": (q_skew_report, SQL_SKEW_REPORT),
    "graph_connected_components": (
        q_graph_connected_components,
        SQL_GRAPH_CONNECTED_COMPONENTS,
    ),
    "robust_outlier_mad": (q_robust_outlier_mad, SQL_ROBUST_OUTLIER_MAD),
    "segmented_ab_welch": (q_segmented_ab_welch, SQL_SEGMENTED_AB_WELCH),
    "table_checksum_audit": (q_table_checksum_audit, SQL_TABLE_CHECKSUM_AUDIT),
}
