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

from cs744_big_data_system_spark.ml.superstep import synchronized_superstep


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
    """
    first = df.select(feature_col).first()
    if first is None or first[0] is None:
        raise ValueError("fit_linear: input has no rows (or a null first feature)")
    dim = len(first[0]) + 1  # + bias
    w = np.zeros(dim, dtype=np.float64)
    sc = df.sparkSession.sparkContext
    # Cache the CONVERTED RDD, not the DataFrame: the loop's per-
    # iteration cost is the JVM→Python row conversion, which caching a
    # DataFrame would re-pay every epoch (df.rdd converts on each
    # walk); caching post-conversion pays it once — the task3.py:37
    # cache-the-loop-invariant lesson applied at the right layer.
    data_rdd = df.select(feature_col, label_col).rdd.persist()

    try:
        for _ in range(iterations):
            bw = sc.broadcast(w)

            def local_grad(rows, _bw=bw):
                wv = _bw.value
                g = np.zeros_like(wv)
                n = 0
                X_rows, y_rows = [], []
                for r in rows:
                    X_rows.append(r[0])
                    y_rows.append(r[1])
                if X_rows:
                    X = np.asarray(X_rows, dtype=np.float64)
                    X = np.hstack([X, np.ones((X.shape[0], 1))])  # bias
                    y = np.asarray(y_rows, dtype=np.float64)
                    resid = X @ wv - y
                    g = X.T @ resid
                    n = X.shape[0]
                return g, n

            grad, n = synchronized_superstep(
                data_rdd, local_grad, lambda a, b: (a[0] + b[0], a[1] + b[1]), (np.zeros(dim), 0)
            )
            # Each epoch's weights are superseded — release the
            # broadcast deterministically instead of waiting on GC.
            bw.destroy()
            if n == 0:
                break
            w = w - lr * (grad / n + l2 * w)
    finally:
        data_rdd.unpersist()  # w is a materialized ndarray; safe to release
    return w


def weights_df(spark, w: np.ndarray) -> DataFrame:
    """(pos, weight) rows — driver-side tiny result, parallelized for
    the DataFrame-returning query contract."""
    rows = [(i, float(round(v, 6))) for i, v in enumerate(w)]
    return spark.createDataFrame(rows, ["pos", "weight"])
