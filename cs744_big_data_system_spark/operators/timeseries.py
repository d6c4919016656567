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


def interpolate_linear(
    events: DataFrame,
    key: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Densify per-key HOURLY series and linearly interpolate the gap
    buckets between the surrounding observations — the other half of
    the hypertable gap story (gapfill_forward carries, this one
    interpolates; TimescaleDB's ``interpolate()``).

    Output: (key, bucket_hour, n_events, value_micro, is_interp) where
    value_micro is the observed bucket sum in integer 1e-4 units, or
    the linear interpolation between the neighboring observed buckets.
    All arithmetic after the one rounded sum is INTEGER (and the one
    division is floor(a·b/c + ½) of integer-valued doubles), so the
    result is bit-reproducible and hash-checkable cross-engine.

    Scale shape: identical to gapfill_forward — per-key spine bounded
    by each key's own span, one shuffle on the key, two window passes
    (backward carry + forward probe) over the same sort. Edges never
    extrapolate: the spine starts/ends at observed buckets by
    construction."""
    hour_us = 3_600 * 1_000_000
    agg = events.groupBy(
        key, F.floor(F.unix_micros(ts_col) / hour_us).cast("long").alias("h")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(value_col), 4).alias("s"),
    )
    obs = agg.select(
        key,
        "h",
        "n",
        F.floor(F.col("s") * 10000.0 + 0.5).cast("long").alias("v"),
    )
    spine = (
        obs.groupBy(key)
        .agg(F.min("h").alias("mn"), F.max("h").alias("mx"))
        .select(key, F.explode(F.sequence("mn", "mx")).alias("h"))
    )
    j = spine.join(obs, [key, "h"], "left")
    wp = Window.partitionBy(key).orderBy("h").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wn = Window.partitionBy(key).orderBy("h").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    h_obs = F.when(F.col("v").isNotNull(), F.col("h"))
    pv, ph = F.last("v", True).over(wp), F.last(h_obs, True).over(wp)
    nv, nh = F.first("v", True).over(wn), F.first(h_obs, True).over(wn)
    interp = pv + F.floor(
        (nv - pv) * (F.col("h") - ph) / (nh - ph) + 0.5
    ).cast("long")
    return j.select(
        key,
        F.col("h").alias("bucket_hour"),
        F.coalesce("n", F.lit(0)).cast("long").alias("n_events"),
        F.when(F.col("v").isNotNull(), F.col("v"))
        .otherwise(interp)
        .cast("long")
        .alias("value_micro"),
        F.when(F.col("v").isNull(), 1).otherwise(0).cast("int").alias("is_interp"),
    )


def ewma(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    alpha: float = 0.3,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Per-key exponentially weighted moving average (recursive form
    y_t = (1−α)·y_{t−1} + α·x_t, y_0 = x_0) — computed WITHOUT a
    sequential recurrence, via the prefix-sum identity

        y_t = c^t · (x_0 + α·Σ_{i=1..t} c^{−i}·x_i),   c = 1−α

    so one ordered window (running sum) keyed on ``key_col`` does the
    whole series: same shuffle shape as running_sum, no per-row Python
    and no iterative loop. The rescaled terms grow like c^{−i}
    (≈ 2.4e10 at i=67 for α=0.3) — far inside double range for the
    bounded per-key series a watermarked pipeline produces; for
    unbounded series the standard fix is chunked re-basing, which
    changes constants, not the plan.

    Deterministic given data + α (fixed expression order, ordered
    prefix sum), so the workload entry is hash-checked. Quantized to
    4 dp with the explicit floor(y·10⁴+0.5)/10⁴ form (the
    quantize_int8 convention): engine round() implementations disagree
    on decimal-half ties (JVM HALF_UP over decimals vs C floor over
    doubles), while the floor form is the identical double expression
    on both engines — measured cross-engine |Δy| ≤ 6e-14. The +1e-9
    epsilon shifts the bucket boundary off the data's own decimal
    grid: fixture values quantized at ≤6 decimals land EXACTLY on
    x.xxxx5 half-points (e.g. an i=0 row passing value straight
    through), where a 6e-14 disagreement flips the floor; no data
    value sits within 1e-13 of boundary−1e-9, so the nudged floor is
    engine-stable.
    """
    from pyspark.sql import Window

    c = 1.0 - alpha
    order = [F.col(ts_col).asc()]
    if order_tiebreak:
        order.append(F.col(order_tiebreak).asc())
    w = Window.partitionBy(key_col).orderBy(*order)
    wsum = w.rowsBetween(Window.unboundedPreceding, 0)
    keep = [key_col, ts_col] + ([order_tiebreak] if order_tiebreak else [])
    x = F.col(value_col)
    # staged: window functions cannot nest, so rank first, then the
    # rescaled term, then the ordered prefix sum (one sort serves all
    # three — same partition+order spec).
    base = df.select(*keep, x.alias("_x")).withColumn(
        "_i", F.row_number().over(w) - 1
    )
    base = base.withColumn(
        "_term",
        F.when(F.col("_i") == 0, F.col("_x")).otherwise(
            alpha * F.col("_x") * F.pow(F.lit(c), -F.col("_i"))
        ),
    )
    return base.select(
        *keep,
        (
            F.floor(
                F.sum("_term").over(wsum) * F.pow(F.lit(c), F.col("_i")) * 10000
                + F.lit(0.5 + 1e-9)
            )
            / 10000
        ).alias("ewma"),
    )
