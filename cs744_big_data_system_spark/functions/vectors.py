"""Vector math over ``array<float>`` embedding columns — pure Column
expressions (JVM-side, codegen'd), no Python UDFs in the hot path.

The reference's only vector math is per-parameter tensor averaging and
argmax over a class dimension (assignment2/part1/main.py:66,
part3/main.py:73); the engine generalizes to the similarity-search ops
the 100 TB pipeline needs. ``F.aggregate``/``F.zip_with`` fold happens
inside whole-stage codegen; a 64-dim dot product is ~64 fused multiply
adds per row, no Arrow round-trip.

All math is done in double precision (inputs are float32 arrays; the
cast is explicit) so results are stable vs. the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column | str) -> Column:
    v = F.col(v) if isinstance(v, str) else v
    return v.cast("array<double>")


def dot(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ — zip_with multiply, aggregate sum, left-to-right fold
    (same accumulation order as the DuckDB oracle's list fold)."""
    prods = F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    v = _as_double(a)
    sq = F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x)
    return F.sqrt(sq)


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """dot(a,b) / (‖a‖·‖b‖); NULL when either norm is 0."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot(a, b) / denom)


def quantize_int8(a: Column | str) -> Column:
    """Symmetric int8 quantization of a vector: scale = 127/max|x|,
    q_i = floor(x_i·scale + 0.5) ∈ [−127, 127] (explicit floor(+0.5)
    so both engines round identically — no HALF_UP/HALF_EVEN drift).
    Returns struct(scale, q: array<int>); dequantize ≈ q/scale. The
    4× size cut is what makes billion-vector ANN shards fit in RAM;
    all native array ops, codegen'd."""
    v = _as_double(a)
    absmax = F.array_max(F.transform(v, lambda x: F.abs(x)))
    scale = F.when(absmax > 0, F.lit(127.0) / absmax).otherwise(F.lit(0.0))
    q = F.transform(v, lambda x: F.floor(x * scale + F.lit(0.5)).cast("int"))
    return F.struct(F.round(scale, 6).alias("scale"), q.alias("q"))


def vec_argmax(a: Column | str) -> Column:
    """1-based index of the max element (first occurrence) — the
    reference's `output.argmax(dim=1)` (assignment2/part3/main.py:73)
    as a native array op."""
    v = _as_double(a)
    return F.array_position(v, F.array_max(v))
