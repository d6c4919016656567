"""Data-parallel LOGISTIC regression — the classification member of
the superstep family, mirroring the reference's train-then-measure-
accuracy loop (assignment2/part1/main.py evaluates test accuracy per
epoch; parts 2a/2b/3 distribute the same loop).

Identical distribution schema to ml/linear_sgd.py (broadcast w down,
per-partition batch gradient, ONE log-depth treeAggregate up, driver
step) with two classification additions merged into the SAME
collective: the log-loss sum and the correct-prediction count ride the
gradient's tuple, so accuracy costs zero extra jobs — the bucketing
lesson applied to metrics, not just gradients.

Full-batch gradient descent on mean cross-entropy; deterministic
(zero init, fixed iterations). Arrow shard transport, like the rest
of ml/.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

from cs744_big_data_system_spark.ml.superstep import arrow_superstep, list_matrix


def _sigmoid(z: np.ndarray) -> np.ndarray:
    # Numerically stable piecewise form.
    out = np.empty_like(z)
    pos = z >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-z[pos]))
    ez = np.exp(z[~pos])
    out[~pos] = ez / (1.0 + ez)
    return out


def fit_logreg(
    df: DataFrame,
    feature_col: str = "embedding",
    label_col: str = "label",
    lr: float = 0.5,
    iterations: int = 20,
    l2: float = 0.0,
) -> tuple[np.ndarray, list[float], list[float]]:
    """Fit w (with trailing bias) minimizing mean cross-entropy of
    sigmoid(x·w) against a binary label. Returns (w, per-epoch log-loss
    curve, per-epoch training-accuracy curve).

    Per epoch: ONE Spark job; traffic |w| down, |w|+3 up (gradient sum,
    loss sum, correct count, n) — row-count independent.
    """
    first = df.select(feature_col).first()
    if first is None or first[0] is None:
        raise ValueError("fit_logreg: input has no rows (or a null first feature)")
    dim = len(first[0]) + 1
    w = np.zeros(dim, dtype=np.float64)
    sc = df.sparkSession.sparkContext
    data = df.select(feature_col, label_col).cache()
    losses: list[float] = []
    accs: list[float] = []

    try:
        for _ in range(iterations):
            bw = sc.broadcast(w)

            def local_stats(batches, _bw=bw):
                wv = _bw.value
                X_parts, y_parts = [], []
                for rb in batches:
                    if rb.num_rows:
                        X_parts.append(list_matrix(rb.column(0)))
                        y_parts.append(np.asarray(rb.column(1), dtype=np.float64))
                if not X_parts:
                    return np.zeros_like(wv), 0.0, 0, 0
                X = np.vstack(X_parts)
                X = np.hstack([X, np.ones((X.shape[0], 1))])
                y = np.concatenate(y_parts)
                z = X @ wv
                p = _sigmoid(z)
                grad = X.T @ (p - y)
                # Stable cross-entropy: log(1+e^z) - y·z, computed via
                # logaddexp so z = ±40 doesn't overflow.
                loss = float(np.sum(np.logaddexp(0.0, z) - y * z))
                correct = int(np.sum((p >= 0.5) == (y >= 0.5)))
                return grad, loss, correct, X.shape[0]

            grad, loss, correct, n = arrow_superstep(
                data,
                local_stats,
                lambda a, b: (a[0] + b[0], a[1] + b[1], a[2] + b[2], a[3] + b[3]),
                (np.zeros(dim), 0.0, 0, 0),
            )
            bw.destroy()
            if n == 0:
                break
            losses.append(loss / n)
            accs.append(correct / n)
            w = w - lr * (grad / n + l2 * w)
    finally:
        data.unpersist()
    return w, losses, accs


def metrics_df(spark, losses: list[float], accs: list[float]) -> DataFrame:
    """(epoch, log_loss, accuracy) rows — the reference's per-epoch
    loss/accuracy table, tiny and deterministic."""
    rows = [
        (i, float(round(ll, 6)), float(round(a, 6)))
        for i, (ll, a) in enumerate(zip(losses, accs))
    ]
    return spark.createDataFrame(rows, ["epoch", "log_loss", "accuracy"])
