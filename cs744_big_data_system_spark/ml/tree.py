"""Histogram-based decision-stump split finding — the distributed
GBDT/random-forest building block (the approximate split algorithm of
XGBoost/LightGBM: bin each feature, aggregate per-bin label
histograms, score every bin edge as a candidate split), expressed as
pure relational algebra.

Why this shape at 100 TB: the data is touched exactly twice — once for
per-feature min/max, once to build the (feature, bin, label) histogram
— and everything after runs on the DENSE GRID whose size is
dim × bins × classes, independent of row count. No per-row sorting (the
exact-split algorithm's cost), no driver-side data movement beyond the
grid. This is precisely how the distributed tree libraries scale, and
the reason they bin.

Determinism: bins derive from exact min/max (order-independent
aggregates), the bin index uses one fixed expression order, and the
Gini score is computed from INTEGER histogram counts with a single
float division layout — so the whole operator is oracle-reproducible,
unlike sort-based exact split finding whose tie handling is
engine-specific.

Reference anchor: the reference's models train dense networks
(assignment2/part1/model.py); trees have no counterpart there — this
operator exists for the engine's training-data/feature-pipeline
surface (SURVEY.md §2.9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def best_stump_splits(
    df: DataFrame,
    dim: int,
    bins: int = 16,
    vec_col: str = "embedding",
    label_col: str = "label",
    topk: int = 5,
) -> DataFrame:
    """Top-k (feature, threshold) stump splits by weighted Gini.

    Returns (s, split_bin, threshold, gini) — feature index, last bin
    of the left side, the corresponding threshold value, weighted Gini
    impurity after the split (rounded to 6 dp), ranked ascending with
    (s, bin) tiebreaks.
    """
    ex = df.select(
        F.col(label_col).alias("y"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("s", "x"),
    )
    stats = ex.groupBy("s").agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
    span = F.col("hi") - F.col("lo")
    bin_idx = F.when(
        span > 0,
        F.least(
            F.floor((F.col("x") - F.col("lo")) * bins / span), F.lit(bins - 1)
        ),
    ).otherwise(F.lit(0))
    counts = (
        ex.join(F.broadcast(stats), "s")
        .select("s", "y", bin_idx.cast("int").alias("b"))
        .groupBy("s", "y", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # Dense (s, y, b) grid so the left-cumulative window sees every bin
    # even where a (feature, label) pair has no mass — grid size is
    # dim × classes × bins, row-count independent.
    grid = (
        stats.select("s")
        .crossJoin(df.select(F.col(label_col).alias("y")).distinct())
        .crossJoin(
            df.sparkSession.range(bins).select(F.col("id").cast("int").alias("b"))
        )
    )
    dense = grid.join(counts, ["s", "y", "b"], "left").select(
        "s", "y", "b", F.coalesce("c", F.lit(0)).alias("c")
    )
    wcum = Window.partitionBy("s", "y").orderBy("b").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = dense.withColumn("cl", F.sum("c").over(wcum))
    tot = dense.groupBy("s", "y").agg(F.sum("c").alias("tl"))
    per_bin = (
        cum.join(tot, ["s", "y"])
        .groupBy("s", "b")
        .agg(
            F.sum("cl").alias("nl"),
            F.sum(F.col("cl") * F.col("cl")).alias("ssl"),
            F.sum(F.col("tl") - F.col("cl")).alias("nr"),
            F.sum((F.col("tl") - F.col("cl")) * (F.col("tl") - F.col("cl"))).alias("ssr"),
        )
    )
    n_total = F.col("nl") + F.col("nr")
    gini = F.round(
        (
            (F.col("nl") - F.col("ssl") / F.col("nl"))
            + (F.col("nr") - F.col("ssr") / F.col("nr"))
        )
        / n_total,
        6,
    )
    scored = (
        per_bin.filter((F.col("nl") > 0) & (F.col("nr") > 0))
        .join(F.broadcast(stats), "s")
        .select(
            "s",
            F.col("b").alias("split_bin"),
            F.round(
                F.col("lo") + (F.col("b") + 1) * (F.col("hi") - F.col("lo")) / bins, 6
            ).alias("threshold"),
            gini.alias("gini"),
        )
    )
    w = Window.orderBy(F.col("gini").asc(), F.col("s").asc(), F.col("split_bin").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= topk)
    )
