"""Data-parallel linear-model training — the reference's assignment-2
training loop (minus torch) as Spark supersteps.

Per iteration, exactly the reference's part2b all-reduce schema
(assignment2/part2b/main.py:35-49):
  broadcast w                  → scatter   (part2a/main.py:66-72, D3)
  per-partition gradient sums  → local backward over the shard (D1)
  treeAggregate merge          → all-reduce(SUM), log-depth — no rank-0
                                 bottleneck (part2b/main.py:47-49, D4)
  driver applies lr·grad/n     → optimizer.step() (part2a/main.py:74)

Full-batch gradient descent on ½‖Xw − y‖² (+ L2): deterministic given
the seed-fixed fixtures, convergence-tested against a closed-form
solution on exactly-linear synthetic data. NumPy only inside
partitions (vectorized per-batch math — the Arrow/ndarray analogue of
the reference's per-batch tensor ops).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

from cs744_big_data_system_spark.ml.superstep import arrow_superstep, list_matrix


def fit_linear(
    df: DataFrame,
    feature_col: str = "embedding",
    label_col: str = "label",
    lr: float = 0.5,
    iterations: int = 20,
    l2: float = 0.0,
) -> np.ndarray:
    """Fit w (including a trailing bias term) minimizing
    ½·mean((x·w − y)²) + ½·l2·‖w‖². Returns the weight vector.

    The loop is driver-side (R4 — the reference's epoch loop); each
    iteration is ONE Spark job whose only cross-node traffic is the
    broadcast of w down and the log-depth gradient merge up — the
    all-reduce communication pattern, sized |w|, independent of rows.

    The shard pass is Arrow-transported (superstep.arrow_superstep):
    the dataset stays cached JVM-side in columnar Tungsten form and
    each epoch streams it to numpy as Arrow batches — per-epoch Python
    cost scales with bytes, not rows, and no pickled Row copy of the
    corpus lives in the Python workers.
    """
    first = df.select(feature_col).first()
    if first is None or first[0] is None:
        raise ValueError("fit_linear: input has no rows (or a null first feature)")
    dim = len(first[0]) + 1  # + bias
    w = np.zeros(dim, dtype=np.float64)
    sc = df.sparkSession.sparkContext
    data = df.select(feature_col, label_col).cache()

    try:
        for _ in range(iterations):
            bw = sc.broadcast(w)

            def local_grad(batches, _bw=bw):
                wv = _bw.value
                X_parts, y_parts = [], []
                for rb in batches:
                    if rb.num_rows:
                        X_parts.append(list_matrix(rb.column(0)))
                        y_parts.append(np.asarray(rb.column(1), dtype=np.float64))
                if not X_parts:
                    return np.zeros_like(wv), 0
                X = np.vstack(X_parts)
                X = np.hstack([X, np.ones((X.shape[0], 1))])  # bias
                y = np.concatenate(y_parts)
                resid = X @ wv - y
                return X.T @ resid, X.shape[0]

            grad, n = arrow_superstep(
                data, local_grad, lambda a, b: (a[0] + b[0], a[1] + b[1]), (np.zeros(dim), 0)
            )
            # Each epoch's weights are superseded — release the
            # broadcast deterministically instead of waiting on GC.
            bw.destroy()
            if n == 0:
                break
            w = w - lr * (grad / n + l2 * w)
    finally:
        data.unpersist()  # w is a materialized ndarray; safe to release
    return w


def weights_df(spark, w: np.ndarray) -> DataFrame:
    """(pos, weight) rows — driver-side tiny result, parallelized for
    the DataFrame-returning query contract."""
    rows = [(i, float(round(v, 6))) for i, v in enumerate(w)]
    return spark.createDataFrame(rows, ["pos", "weight"])
