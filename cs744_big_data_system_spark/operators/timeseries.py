"""Time-series gap-fill: densify a bucketed series onto a complete
time spine and forward-fill carried values (SURVEY.md §2.9 — the
hypertable/rollup operator family the reference lacks; semantics follow
the standard SQL spine + LAST_VALUE IGNORE NULLS idiom, e.g.
TimescaleDB's time_bucket_gapfill / locf).

Scale design: the spine is generated per key from that key's own
[min, max] bucket range (sequence + explode — no driver-side range
materialization, no cross join against a global calendar), so the
row-explosion is bounded by each key's span. Spine build, left join,
and forward-fill all share the key partitioning — one shuffle total
plus the window sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gapfill_forward(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    bucket: str = "10 minutes",
) -> DataFrame:
    """Bucket ``events`` per (key, bucket), densify each key's series
    onto its full bucket range, and forward-fill the per-bucket sum
    into the gaps. Output: (key, bucket_start, n_events, filled_sum)
    where gap rows have n_events = 0 and carry the previous bucket's
    sum."""
    agg = events.groupBy(
        key, F.window(ts_col, bucket).getField("start").alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(value_col), 4).alias("s"),
    )
    spine = (
        agg.groupBy(key)
        .agg(F.min("bucket").alias("mn"), F.max("bucket").alias("mx"))
        .select(
            key,
            F.explode(
                F.sequence("mn", "mx", F.expr(f"interval {bucket}"))
            ).alias("bucket"),
        )
    )
    w = (
        Window.partitionBy(key)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(agg, [key, "bucket"], "left")
        .select(
            key,
            F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket_start"),
            F.coalesce("n", F.lit(0)).cast("long").alias("n_events"),
            F.last("s", ignorenulls=True).over(w).alias("filled_sum"),
        )
    )
