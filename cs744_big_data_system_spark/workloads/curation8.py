"""Round-5 fifth closing batch: incremental view maintenance —

  * ``ivm_agg_maintenance`` — maintain a grouped aggregate view under
    a batch of inserts AND deletes by merging DELTA aggregates into
    the materialized state, never rescanning the base data — the
    classic IVM delta rule (ΔV = γ(ΔR) merged on the group key) that
    turns a 100 TB view refresh into work proportional to the delta.
    The query materializes the base view, applies the delta the IVM
    way, recomputes ground truth from scratch, and emits both plus an
    in-query equality flag per group — so the driver hash-checks the
    maintained state AND the proof that it equals the recompute.

Oracle-backed. Per the registry ordering invariant it is APPENDED
after the never-attested block and enters the r06+ window.

Reference scope: the reference repo (/root/reference, RDD coursework)
has no view-maintenance surface; this extends SURVEY.md §2.9's
pipeline inventory the same way curation1-7 did.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cs744_big_data_system_spark.sources.readers import load_table

__all__ = ["WORKLOADS"]

_IVM_CUT = "2024-01-15 00:00:00"


def q_ivm_agg_maintenance(spark, sf_dir):
    """Grouped (n, sum_cents) view per event_type, maintained under a
    delta batch: inserts = events at/after the cut, deletes = every
    13th pre-cut event (synthetic retention purge). The maintained
    state is base ⟗ delta with coalesced signed sums; groups whose
    count reaches zero drop out of the view (the IVM delete rule).

    Scale shape: the base view is ONE combinable aggregation
    (materialized once at 100 TB); maintenance touches ONLY the delta
    — a second small aggregation — plus a group-key merge join of two
    aggregate relations. The ground-truth recompute exists here only
    to prove equality in-query; production IVM never runs it."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        (F.col("ts") < F.lit(_IVM_CUT).cast("timestamp")).alias("is_base"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    base = (
        ev.filter("is_base")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s"))
    )
    # delta: +1 rows (post-cut inserts), -1 rows (purged base rows)
    inserts = ev.filter(~F.col("is_base")).select(
        "event_type", F.lit(1).alias("sign"), "cents"
    )
    deletes = ev.filter(F.col("is_base") & (F.col("event_id") % 13 == 0)).select(
        "event_type", F.lit(-1).alias("sign"), "cents"
    )
    delta = (
        inserts.unionByName(deletes)
        .groupBy("event_type")
        .agg(
            F.sum("sign").alias("dn"),
            F.sum(F.col("sign") * F.col("cents")).alias("ds"),
        )
    )
    maintained = (
        base.join(delta, "event_type", "full_outer")
        .select(
            "event_type",
            (F.coalesce(F.col("n"), F.lit(0)) + F.coalesce(F.col("dn"), F.lit(0))).alias(
                "n"
            ),
            (F.coalesce(F.col("s"), F.lit(0)) + F.coalesce(F.col("ds"), F.lit(0))).alias(
                "s"
            ),
        )
        .filter(F.col("n") > 0)
    )
    # ground truth: recompute from the post-maintenance row set
    truth = (
        ev.filter(
            (~F.col("is_base")) | (F.col("event_id") % 13 != 0)
        )
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("tn"), F.sum("cents").alias("ts_"))
    )
    return (
        maintained.join(truth, "event_type", "full_outer")
        .select(
            "event_type",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"),
            F.coalesce(F.col("s"), F.lit(0)).cast("long").alias("sum_cents"),
            (
                (F.coalesce(F.col("n"), F.lit(0)) == F.coalesce(F.col("tn"), F.lit(0)))
                & (F.coalesce(F.col("s"), F.lit(0)) == F.coalesce(F.col("ts_"), F.lit(0)))
            )
            .cast("long")
            .alias("ivm_matches_recompute"),
        )
    )


SQL_IVM_AGG_MAINTENANCE = f"""
WITH ev AS (
  SELECT event_id, event_type,
         ts < TIMESTAMP '{_IVM_CUT}' AS is_base,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
), base AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS s
  FROM ev WHERE is_base GROUP BY event_type
), delta AS (
  SELECT event_type, CAST(sum(sign) AS BIGINT) AS dn,
         CAST(sum(sign * cents) AS BIGINT) AS ds
  FROM (
    SELECT event_type, 1 AS sign, cents FROM ev WHERE NOT is_base
    UNION ALL
    SELECT event_type, -1 AS sign, cents FROM ev WHERE is_base AND event_id % 13 = 0
  ) GROUP BY event_type
), maintained AS (
  SELECT coalesce(b.event_type, d.event_type) AS event_type,
         coalesce(b.n, 0) + coalesce(d.dn, 0) AS n,
         coalesce(b.s, 0) + coalesce(d.ds, 0) AS s
  FROM base b FULL OUTER JOIN delta d USING (event_type)
), kept AS (
  SELECT * FROM maintained WHERE n > 0
), truth AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS tn, CAST(sum(cents) AS BIGINT) AS ts_
  FROM ev WHERE NOT is_base OR event_id % 13 <> 0
  GROUP BY event_type
)
SELECT coalesce(k.event_type, t.event_type) AS event_type,
       CAST(coalesce(k.n, 0) AS BIGINT) AS n,
       CAST(coalesce(k.s, 0) AS BIGINT) AS sum_cents,
       CAST(CASE WHEN coalesce(k.n, 0) = coalesce(t.tn, 0)
                  AND coalesce(k.s, 0) = coalesce(t.ts_, 0)
            THEN 1 ELSE 0 END AS BIGINT) AS ivm_matches_recompute
FROM kept k FULL OUTER JOIN truth t USING (event_type)
"""


WORKLOADS = {
    "ivm_agg_maintenance": (q_ivm_agg_maintenance, SQL_IVM_AGG_MAINTENANCE),
}
