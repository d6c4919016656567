"""Alternating Least Squares matrix factorization — the canonical
distributed recommender trainer (the public Spark MLlib flagship
workload), expressed through the engine's superstep idiom.

Each half-iteration solves, for every user u (then every item i), the
ridge-regularized normal equations

    ( Yᵤᵀ Yᵤ + λ·n_u·I ) xᵤ = Yᵤᵀ rᵤ

where Yᵤ stacks the factors of the items u rated. The fixed side's
factor matrix is BROADCAST (rank × entities doubles — megabytes at
rank 8 even for millions of entities, the standard ALS regime; MLlib's
block-partitioned variant is the documented beyond-broadcast path),
and the solving side is ONE applyInPandas pass grouped by entity:
each group's normal equations are rank × rank (8×8 here) — constant
work per entity, Arrow-batched. The only driver-side data movement is
the factor collect between half-steps (entities × rank doubles, the
same size as the broadcast).

Determinism: factors init from md5-derived pseudo-randoms and every
solve is a fixed-order numpy solve on deterministic inputs, so runs
are bit-reproducible; training quality is asserted by a decreasing
train-RMSE curve (rows-only in the driver gate, like the other float
training loops)."""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _seed_factors(ids: list, rank: int) -> dict:
    """Deterministic unit-scale init: md5(id, j) → uniform [-0.5, 0.5)."""
    out = {}
    for i in ids:
        row = np.empty(rank)
        for j in range(rank):
            h = hashlib.md5(f"{i}:{j}".encode()).digest()
            row[j] = int.from_bytes(h[:8], "big") / 2**64 - 0.5
        out[i] = row
    return out


def _solve_side(r: DataFrame, side: str, other: str, fixed: dict, rank: int, reg: float):
    """One ALS half-step: per-`side`-entity ridge normal equations
    against the broadcast `fixed` factors. Returns {id: factor}."""
    b = r.sparkSession.sparkContext.broadcast(fixed)

    def solve(pdf):
        import numpy as np  # noqa: PLC0415 — worker-side
        import pandas as pd  # noqa: PLC0415

        fm = b.value
        ys = np.stack([fm[k] for k in pdf[other]])
        rv = pdf["r"].to_numpy()
        A = ys.T @ ys + reg * len(rv) * np.eye(rank)
        x = np.linalg.solve(A, ys.T @ rv)
        return pd.DataFrame({"id": [int(pdf[side].iloc[0])], "f": [x.tolist()]})

    rows = (
        r.select(side, other, "r")
        .groupBy(side)
        .applyInPandas(solve, schema="id long, f array<double>")
        .collect()
    )
    b.destroy()
    return {row.id: np.array(row.f) for row in rows}


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

    item_f = _seed_factors([row.i for row in r.select("i").distinct().collect()], rank)

    sc = spark.sparkContext
    curve = []
    for it in range(1, iterations + 1):
        user_f = _solve_side(r, "u", "i", item_f, rank, reg)
        item_f = _solve_side(r, "i", "u", user_f, rank, reg)

        bu, bi = sc.broadcast(user_f), sc.broadcast(item_f)

        @F.pandas_udf("double")
        def pred(u, i):
            import numpy as np  # noqa: PLC0415
            import pandas as pd  # noqa: PLC0415

            U, I = bu.value, bi.value
            return pd.Series([float(np.dot(U[a], I[b])) for a, b in zip(u, i)])

        mse = (
            r.select(((pred("u", "i") - F.col("r")) ** 2).alias("e2"))
            .agg(F.avg("e2").alias("mse"))
            .first()
            .mse
        )
        curve.append((it, float(np.sqrt(mse))))
        bu.destroy()
        bi.destroy()
    r.unpersist()
    return spark.createDataFrame(curve, "iteration int, rmse double").select(
        "iteration", F.round("rmse", 6).alias("rmse")
    )
