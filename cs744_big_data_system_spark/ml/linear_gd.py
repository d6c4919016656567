"""Full-batch gradient-descent linear regression, hash-verifiable.

The oracle-checkable sibling of ml/linear_sgd.py (which remains the
throughput path with Arrow-batched shards): the SAME superstep schema
the reference's data-parallel training uses — broadcast parameters
down, one aggregated gradient up per step (assignment2/part2b/main.py's
all-reduce round, as one Spark agg) — but with every nondeterminism
source pinned so the whole training loop hash-checks against an
unrolled-CTE DuckDB oracle (the 7th hash-verified iterative kernel):

  * full-batch GD (no sampling), fixed steps, fixed learning rate;
  * each gradient component is quantized with the engine-stable
    floor(g·10⁹ + 0.5 + 1e-12)/10⁹ form before the update (engine
    round() half-tie rules differ; cross-engine disagreement on the
    unquantized avg is ~1e-16 relative, six orders inside the grid);
  * the weight update w − η·ĝ is then exact IEEE arithmetic on
    identical inputs, so both engines walk the identical trajectory.

Per step: ONE aggregation job over the data (p+1 avg columns riding a
single map-side-combinable pass) and a p+1-float driver update — the
collective traffic is O(p) per step, independent of row count, exactly
the DDP lesson.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _q9(g: float) -> float:
    """Engine-stable 9-dp quantizer (same convention as the EWMA and
    PQ operators): floor(g·1e9 + 0.5 + 1e-12)/1e9 — identical double
    expression on both engines, no round() half-tie drift."""
    return math.floor(g * 1e9 + 0.5 + 1e-12) / 1e9


def linear_gd_fit(
    df: DataFrame,
    feature_dims: int = 4,
    steps: int = 6,
    lr: float = 0.1,
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Fit y ≈ w·[1, x₁..x_p] by ``steps`` full-batch GD rounds from
    w = 0. Returns (j, weight) — p+1 rows, j=0 the bias — with weights
    quantized at 9 dp (they already are, by construction: each is a
    sum of quantized gradient steps)."""
    x = [F.lit(1.0)] + [
        F.element_at(F.col(vec_col).cast("array<double>"), j + 1)
        for j in range(feature_dims)
    ]
    y = F.col(label_col).cast("double")
    w = [0.0] * (feature_dims + 1)
    for _ in range(steps):
        pred = sum((F.lit(wj) * xj for wj, xj in zip(w, x)), F.lit(0.0))
        resid = pred - y
        row = df.agg(
            *[F.avg(resid * xj).alias(f"g{j}") for j, xj in enumerate(x)]
        ).collect()[0]
        grads = [_q9(2.0 * row[f"g{j}"]) for j in range(feature_dims + 1)]
        w = [wj - lr * gj for wj, gj in zip(w, grads)]
    spark = df.sparkSession
    return spark.createDataFrame(
        [(j, wj) for j, wj in enumerate(w)], "j int, weight double"
    )


def sql_linear_gd(
    feature_dims: int = 4, steps: int = 6, lr: float = 0.1
) -> str:
    """Unrolled DuckDB mirror: per step one CTE of p+1 quantized avg
    gradients and one CTE applying the update — the same trajectory,
    computed inside SQL."""
    p = feature_dims
    xs = ["1.0"] + [f"CAST(embedding[{j + 1}] AS DOUBLE)" for j in range(p)]
    parts = [
        "s0 AS (SELECT " + ", ".join(f"0.0 AS w{j}" for j in range(p + 1)) + ")"
    ]
    for t in range(1, steps + 1):
        pred = " + ".join(f"s.w{j} * {xs[j]}" for j in range(p + 1))
        grads = ", ".join(
            f"floor(2.0 * avg((({pred}) - CAST(label AS DOUBLE)) * {xs[j]}) * 1e9"
            f" + 0.5 + 1e-12) / 1e9 AS g{j}"
            for j in range(p + 1)
        )
        parts.append(f"g{t} AS (SELECT {grads} FROM embeddings, s{t - 1} s)")
        upd = ", ".join(f"s.w{j} - {lr!r} * g.g{j} AS w{j}" for j in range(p + 1))
        parts.append(f"s{t} AS (SELECT {upd} FROM s{t - 1} s, g{t} g)")
    sel = " UNION ALL ".join(
        f"SELECT {j} AS j, w{j} AS weight FROM s{steps}" for j in range(p + 1)
    )
    return "WITH " + ",\n".join(parts) + "\n" + sel


def logreg_gd_fit(
    df: DataFrame,
    feature_dims: int = 4,
    steps: int = 6,
    lr: float = 0.5,
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Logistic-regression GD under the same hash-verifiable contract
    as linear_gd_fit — the NONLINEAR gradient case: per step, one agg
    computes avg((sigmoid(w·x) − y)·x_j) for all components; libm vs
    JVM exp() differ by ~1 ulp, which the 1e-9 gradient quantization
    absorbs, so the trajectory stays engine-identical. y is the
    label's parity (a balanced binary target over the fixture)."""
    x = [F.lit(1.0)] + [
        F.element_at(F.col(vec_col).cast("array<double>"), j + 1)
        for j in range(feature_dims)
    ]
    y = (F.col(label_col) % 2).cast("double")
    w = [0.0] * (feature_dims + 1)
    for _ in range(steps):
        pred = sum((F.lit(wj) * xj for wj, xj in zip(w, x)), F.lit(0.0))
        sig = F.lit(1.0) / (F.lit(1.0) + F.exp(-pred))
        row = df.agg(
            *[F.avg((sig - y) * xj).alias(f"g{j}") for j, xj in enumerate(x)]
        ).collect()[0]
        grads = [_q9(row[f"g{j}"]) for j in range(feature_dims + 1)]
        w = [wj - lr * gj for wj, gj in zip(w, grads)]
    spark = df.sparkSession
    return spark.createDataFrame(
        [(j, wj) for j, wj in enumerate(w)], "j int, weight double"
    )


def sql_logreg_gd(
    feature_dims: int = 4, steps: int = 6, lr: float = 0.5
) -> str:
    p = feature_dims
    xs = ["1.0"] + [f"CAST(embedding[{j + 1}] AS DOUBLE)" for j in range(p)]
    parts = [
        "s0 AS (SELECT " + ", ".join(f"0.0 AS w{j}" for j in range(p + 1)) + ")"
    ]
    for t in range(1, steps + 1):
        pred = " + ".join(f"s.w{j} * {xs[j]}" for j in range(p + 1))
        sig = f"(1.0 / (1.0 + exp(-({pred}))))"
        grads = ", ".join(
            f"floor(avg(({sig} - CAST(label % 2 AS DOUBLE)) * {xs[j]}) * 1e9"
            f" + 0.5 + 1e-12) / 1e9 AS g{j}"
            for j in range(p + 1)
        )
        parts.append(f"g{t} AS (SELECT {grads} FROM embeddings, s{t - 1} s)")
        upd = ", ".join(f"s.w{j} - {lr!r} * g.g{j} AS w{j}" for j in range(p + 1))
        parts.append(f"s{t} AS (SELECT {upd} FROM s{t - 1} s, g{t} g)")
    sel = " UNION ALL ".join(
        f"SELECT {j} AS j, w{j} AS weight FROM s{steps}" for j in range(p + 1)
    )
    return "WITH " + ",\n".join(parts) + "\n" + sel
