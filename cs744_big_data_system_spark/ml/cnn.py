"""Data-parallel CONVOLUTIONAL training — one step closer to the
reference's VGG-11 (assignment2/part1/model.py:30-46) than ml/mlp.py,
with an IDENTICAL distribution schema (the point of the analogue):

  broadcast flat θ down           → scatter (D3)
  per-partition conv fwd+bwd      → local batch math over the shard (D1)
  ONE log-depth treeAggregate     → bucketed all-reduce: every layer's
                                    gradient travels in one collective
                                    (the DDP lesson, part3/main.py:105)
  driver applies the step         → optimizer.step() (part2a/main.py:74)

Model: embedding (64) viewed as an 8×8 single-channel image → 3×3
valid convolution with ``n_filters`` kernels → tanh → flatten → linear
regression head. The convolution is vectorized as 9 shifted-slice
multiply-adds (an unrolled im2col — no Python per pixel), the gradient
likewise. Deterministic: seed-fixed init, full-batch, fixed epochs.

Shard transport is Arrow (ml/superstep.arrow_superstep): JVM columnar
cache, per-epoch Arrow streaming — byte-scaled, like mlp/linear_sgd.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

from cs744_big_data_system_spark.ml.superstep import arrow_superstep, list_matrix

SIDE = 8          # 64-dim embedding viewed as SIDE×SIDE
KSIZE = 3         # conv kernel size (valid padding)
OUT = SIDE - KSIZE + 1  # spatial output side


def _init_params(n_filters: int, seed: int = 744) -> np.ndarray:
    """Flat θ = [K (f·3·3) | conv bias (f) | w2 (f·OUT²) | b2 (1)],
    Xavier-ish, deterministic under ``seed``."""
    rng = np.random.RandomState(seed)
    k = rng.normal(0.0, 1.0 / KSIZE, size=n_filters * KSIZE * KSIZE)
    cb = np.zeros(n_filters)
    w2 = rng.normal(0.0, 1.0 / np.sqrt(n_filters * OUT * OUT), size=n_filters * OUT * OUT)
    return np.concatenate([k, cb, w2, [0.0]])


def _split(theta: np.ndarray, n_filters: int):
    i = n_filters * KSIZE * KSIZE
    k = theta[:i].reshape(n_filters, KSIZE, KSIZE)
    cb = theta[i : i + n_filters]
    w2 = theta[i + n_filters : i + n_filters + n_filters * OUT * OUT]
    b2 = theta[-1]
    return k, cb, w2, b2


def _forward_backward(X: np.ndarray, y: np.ndarray, theta: np.ndarray, n_filters: int):
    """Full conv forward + backward for ½·Σ(ŷ−y)² on the local batch.
    Returns (flat gradient SUM, squared-error SUM, n)."""
    n = X.shape[0]
    k, cb, w2, b2 = _split(theta, n_filters)
    img = X.reshape(n, SIDE, SIDE)
    # Valid conv as ONE BLAS contraction over im2col patch views:
    # patches[n,i,j,a,b] is a zero-copy strided view; tensordot folds
    # the (a,b) axes against the kernel — no 9-pass temporary chain.
    patches = np.lib.stride_tricks.sliding_window_view(img, (KSIZE, KSIZE), axis=(1, 2))
    z = np.tensordot(patches, k, axes=([3, 4], [1, 2]))  # (n, OUT, OUT, f)
    z = np.moveaxis(z, 3, 1) + cb[None, :, None, None]   # (n, f, OUT, OUT)
    h = np.tanh(z)
    flat = h.reshape(n, -1)
    yhat = flat @ w2 + b2
    resid = yhat - y

    g_w2 = flat.T @ resid
    g_b2 = resid.sum()
    dflat = np.outer(resid, w2)                       # (n, f·OUT²)
    dz = dflat.reshape(n, n_filters, OUT, OUT) * (1.0 - h * h)
    g_cb = dz.sum(axis=(0, 2, 3))
    # g_k[f,a,b] = Σ_nij dz[n,f,i,j]·patches[n,i,j,a,b] — same strided
    # view, one contraction.
    g_k = np.tensordot(dz, patches, axes=([0, 2, 3], [0, 1, 2]))  # (f, 3, 3)
    grad = np.concatenate([g_k.ravel(), g_cb, g_w2, [g_b2]])
    return grad, float(resid @ resid), n


def fit_cnn(
    df: DataFrame,
    feature_col: str = "embedding",
    label_col: str = "label",
    n_filters: int = 4,
    lr: float = 0.05,
    iterations: int = 20,
) -> tuple[np.ndarray, list[float]]:
    """Train the conv net by full-batch gradient descent; returns
    (flat parameters, per-epoch MSE curve). Per epoch: ONE Spark job;
    cross-node traffic is |θ| down + |θ|+2 up, independent of rows."""
    first = df.select(feature_col).first()
    if first is None or first[0] is None:
        raise ValueError("fit_cnn: input has no rows (or a null first feature)")
    if len(first[0]) != SIDE * SIDE:
        raise ValueError(f"fit_cnn: expected dim {SIDE * SIDE}, got {len(first[0])}")
    theta = _init_params(n_filters)
    sc = df.sparkSession.sparkContext
    data = df.select(feature_col, label_col).cache()
    losses: list[float] = []

    try:
        for _ in range(iterations):
            bt = sc.broadcast(theta)

            def local_grad(batches, _bt=bt):
                X_parts, y_parts = [], []
                for rb in batches:
                    if rb.num_rows:
                        X_parts.append(list_matrix(rb.column(0)))
                        y_parts.append(np.asarray(rb.column(1), dtype=np.float64))
                if not X_parts:
                    return np.zeros_like(_bt.value), 0.0, 0
                X = np.vstack(X_parts)
                y = np.concatenate(y_parts)
                return _forward_backward(X, y, _bt.value, n_filters)

            grad, sq_err, n = arrow_superstep(
                data,
                local_grad,
                lambda a, b: (a[0] + b[0], a[1] + b[1], a[2] + b[2]),
                (np.zeros_like(theta), 0.0, 0),
            )
            bt.destroy()
            if n == 0:
                break
            losses.append(sq_err / n)
            theta = theta - lr * grad / n
    finally:
        data.unpersist()
    return theta, losses
