"""Data-parallel k-means (Lloyd's algorithm) — the unsupervised member
of the superstep family (ml/linear_sgd.py, ml/mlp.py share the schema).

Per iteration, the same all-reduce communication pattern as the
reference's training loop (assignment2/part2b/main.py:35-49):
  broadcast centroids            → scatter, k·dim floats down
  per-partition (sum, count)     → local assignment over the shard
  treeAggregate merge            → all-reduce(SUM), log-depth
  driver recomputes centroids    → optimizer.step() analogue

Traffic per superstep is k·dim, independent of rows — the property
that makes this run at 100 TB (the corpus never moves; only the tiny
centroid matrix does). Deterministic: init = first-k vectors by id
(the same training-free seed as operators/similarity.cosine_topk_ivf,
whose coarse quantizer these centroids can replace for a learned IVF).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cs744_big_data_system_spark.ml.superstep import arrow_superstep, list_matrix


def fit_kmeans(
    df: DataFrame,
    k: int = 8,
    feature_col: str = "embedding",
    id_col: str = "vec_id",
    iterations: int = 10,
) -> tuple[np.ndarray, list[float]]:
    """Lloyd's k-means on a vector column. Returns (centroids [k, dim],
    per-iteration mean squared distance curve).

    Assignment is by squared Euclidean distance, ties to the lower
    centroid index; an emptied cluster keeps its previous centroid
    (standard deterministic fallback). The loop is driver-side (R4);
    each iteration is ONE job — no shuffle of the data, ever.
    """
    init_rows = (
        df.select(id_col, feature_col)
        .orderBy(F.col(id_col).asc())
        .limit(k)
        .collect()
    )
    if len(init_rows) < k:
        raise ValueError(f"fit_kmeans: need >= {k} rows, got {len(init_rows)}")
    centroids = np.asarray([list(r[1]) for r in init_rows], dtype=np.float64)
    dim = centroids.shape[1]
    sc = df.sparkSession.sparkContext
    # JVM-side columnar cache + per-iteration Arrow streaming — Python
    # cost scales with bytes, not rows (superstep.arrow_superstep).
    data = df.select(feature_col).cache()
    curve: list[float] = []

    try:
        for _ in range(iterations):
            bc = sc.broadcast(centroids)

            def local_stats(batches, _bc=bc):
                C = _bc.value
                sums = np.zeros_like(C)
                counts = np.zeros(C.shape[0], dtype=np.int64)
                sq_err = 0.0
                X_parts = [list_matrix(rb.column(0)) for rb in batches if rb.num_rows]
                if X_parts:
                    X = np.vstack(X_parts)
                    # ||x-c||² = ||x||² - 2x·c + ||c||²; argmin over c
                    d2 = (
                        (X * X).sum(axis=1, keepdims=True)
                        - 2.0 * X @ C.T
                        + (C * C).sum(axis=1)
                    )
                    asn = d2.argmin(axis=1)  # ties → lower index
                    sq_err = float(d2[np.arange(len(asn)), asn].sum())
                    np.add.at(sums, asn, X)
                    np.add.at(counts, asn, 1)
                return sums, counts, sq_err

            sums, counts, sq_err = arrow_superstep(
                data,
                local_stats,
                lambda a, b: (a[0] + b[0], a[1] + b[1], a[2] + b[2]),
                (np.zeros((k, dim)), np.zeros(k, dtype=np.int64), 0.0),
            )
            bc.destroy()
            n = int(counts.sum())
            if n == 0:
                break
            curve.append(sq_err / n)
            nonempty = counts > 0
            centroids = centroids.copy()
            centroids[nonempty] = sums[nonempty] / counts[nonempty, None]
    finally:
        data.unpersist()
    return centroids, curve


def kmeans_df(spark, centroids: np.ndarray, curve: list[float]) -> DataFrame:
    """(cluster, pos, value) centroid components + (-1, i, mse_i) curve
    rows — tiny driver-side result for the query contract."""
    rows = [
        (int(c), int(p), float(round(v, 6)))
        for c, row in enumerate(centroids)
        for p, v in enumerate(row)
    ] + [(-1, i, float(round(m, 6))) for i, m in enumerate(curve)]
    return spark.createDataFrame(rows, ["cluster", "pos", "value"])
