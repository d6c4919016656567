"""Alternating Least Squares matrix factorization — the canonical
distributed recommender trainer (the public Spark MLlib flagship
workload), expressed block-style: both factor sides live as
DataFrames end-to-end and are JOINED to the ratings per half-step,
so NOTHING the size of the user or item set ever visits the driver
(MLlib's block-partitioned ALS regime; the earlier broadcast-dict
variant collapsed at user counts beyond broadcast reach).

Each half-iteration solves, for every user u (then every item i), the
ridge-regularized normal equations

    ( Yᵤᵀ Yᵤ + λ·n_u·I ) xᵤ = Yᵤᵀ rᵤ

where Yᵤ stacks the factors of the items u rated. The fixed side's
factors reach the solving side through one hash join on the rating
table (co-partitioned with the groupBy that follows when AQE keeps
the partitioning), and the solve is ONE applyInPandas pass grouped by
entity: each group's normal equations are rank × rank (8×8 here) —
constant work per entity, Arrow-batched. Factor DataFrames are
eagerly localCheckpointed per half-step, so lineage stays flat across
iterations and each solve reads materialized blocks.

Determinism: factors init from md5-derived pseudo-randoms (computed
distributed, per entity row); every solve sorts its group by the
fixed-side id before stacking, so the float accumulation order is
fixed and runs are bit-reproducible. Training quality is asserted by
a decreasing train-RMSE curve (rows-only in the driver gate, like the
other float training loops)."""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _seed_factors(ids: DataFrame, rank: int) -> DataFrame:
    """Deterministic unit-scale init, computed WHERE THE IDS LIVE:
    md5(id, j) → uniform [-0.5, 0.5) per factor slot — one mapInPandas
    pass over the distinct-entity table, no driver round-trip."""

    def seed(batches: Iterator) -> Iterator:
        import hashlib  # noqa: PLC0415 — worker-side

        import pandas as pd  # noqa: PLC0415

        for pdf in batches:
            fs = [
                [
                    int.from_bytes(
                        hashlib.md5(f"{i}:{j}".encode()).digest()[:8], "big"
                    )
                    / 2**64
                    - 0.5
                    for j in range(rank)
                ]
                for i in pdf["id"]
            ]
            yield pd.DataFrame({"id": pdf["id"], "f": fs})

    return ids.mapInPandas(seed, schema="id long, f array<double>")


def _solve_side(
    r: DataFrame, side: str, other: str, fixed: DataFrame, rank: int, reg: float
) -> DataFrame:
    """One ALS half-step: join the fixed side's factors onto the
    ratings, then per-`side`-entity ridge normal equations in a single
    grouped Arrow pass. Returns a (id, f) factor DataFrame."""

    def solve(pdf):
        import numpy as np  # noqa: PLC0415 — worker-side
        import pandas as pd  # noqa: PLC0415

        # fixed-order accumulation: group rows arrive in shuffle order,
        # sort by the fixed-side id so ysᵀys sums identically every run
        pdf = pdf.sort_values(other).reset_index(drop=True)
        ys = np.stack(pdf["f"].to_numpy())
        rv = pdf["r"].to_numpy()
        A = ys.T @ ys + reg * len(rv) * np.eye(rank)
        x = np.linalg.solve(A, ys.T @ rv)
        return pd.DataFrame({"id": [int(pdf[side].iloc[0])], "f": [x.tolist()]})

    joined = r.select(side, other, "r").join(
        fixed.withColumnRenamed("id", other), other
    )
    out = joined.groupBy(side).applyInPandas(solve, schema="id long, f array<double>")
    # flat lineage across iterations + each consumer reads blocks, not
    # a recursively-deepening plan (same idiom as graph/hits.py)
    return out.localCheckpoint(eager=True)


def _dot(a, b):
    """JVM-side dot product of two array<double> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def als_fit(
    ratings: DataFrame,
    rank: int = 8,
    iterations: int = 3,
    reg: float = 0.1,
    user_col: str = "user",
    item_col: str = "item",
    rating_col: str = "rating",
) -> DataFrame:
    """Returns one row per iteration: (iteration, rmse) over the
    training ratings — the decreasing loss curve the convergence test
    pins (mirroring the reference's per-epoch loss table)."""
    spark = ratings.sparkSession
    r = ratings.select(
        F.col(user_col).alias("u"),
        F.col(item_col).alias("i"),
        F.col(rating_col).cast("double").alias("r"),
    ).persist()

    item_f = _seed_factors(r.select(F.col("i").alias("id")).distinct(), rank)
    item_f = item_f.localCheckpoint(eager=True)

    curve = []
    for it in range(1, iterations + 1):
        user_f = _solve_side(r, "u", "i", item_f, rank, reg)
        item_f = _solve_side(r, "i", "u", user_f, rank, reg)

        # train RMSE: both factor sides join back onto the ratings and
        # the dot product runs JVM-side — the only driver-bound result
        # is the 1-row mean, never a factor matrix
        scored = (
            r.join(user_f.select(F.col("id").alias("u"), F.col("f").alias("uf")), "u")
            .join(item_f.select(F.col("id").alias("i"), F.col("f").alias("vf")), "i")
            .select(((_dot("uf", "vf") - F.col("r")) ** 2).alias("e2"))
        )
        mse = scored.agg(F.avg("e2").alias("mse")).first().mse
        curve.append((it, float(mse) ** 0.5))
    r.unpersist()
    return spark.createDataFrame(curve, "iteration int, rmse double").select(
        "iteration", F.round("rmse", 6).alias("rmse")
    )
