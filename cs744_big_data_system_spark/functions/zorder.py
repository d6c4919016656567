"""Z-order (Morton) clustering keys — the lakehouse data-layout
primitive behind multi-dimensional file skipping (Delta OPTIMIZE
ZORDER BY, Iceberg sort orders). No reference file to cite (the
reference has no storage-layout story); the bit-interleaving follows
the standard Morton-code construction.

Why it matters at 100 TB: parquet readers prune files on per-file
min/max statistics, which only helps for the leading sort column.
Sorting by the interleaved key gives EVERY participating dimension
locality inside each file, so predicates on any of them prune — the
difference between scanning 1 % and 100 % of a petabyte table when
the filter isn't on the partition column.

The key is a pure JVM-side expression tree (shift/and/or — fully
codegen'd, no UDF), and deterministic, so it is oracle-checkable
bit-for-bit in DuckDB with the same integer ops.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_key(x: Column, y: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative integer
    columns: bit i of x lands at position 2i, bit i of y at 2i+1.
    Static expression tree of 2·bits shift/mask terms — constant-folded
    per row inside whole-stage codegen."""
    z: Column = F.lit(0).cast("long")
    for i in range(bits):
        xb = F.shiftright(x.cast("long"), i).bitwiseAND(F.lit(1))
        yb = F.shiftright(y.cast("long"), i).bitwiseAND(F.lit(1))
        z = z.bitwiseOR(F.shiftleft(xb, 2 * i)).bitwiseOR(F.shiftleft(yb, 2 * i + 1))
    return z


def zorder_key_sql(x: str, y: str, bits: int = 16) -> str:
    """The identical Morton code as an ANSI-SQL expression string (for
    the DuckDB oracle)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"


def zordered(df, xcol: str, ycol: str, bits: int = 16, key_col: str = "zkey"):
    """``df`` + a ``key_col`` Morton key over ``xcol``/``ycol`` with
    each dimension first min-max normalized onto [0, 2^bits) — raw
    interleaving is worthless when ranges differ (a 0..9 dimension
    contributes only 4 low bits while a 0..10⁶ one owns every high
    bit, so range-splitting on the raw key degenerates to a one-column
    sort). Real Z-ORDER writers normalize exactly this way.

    The min/max stats are ONE tiny scalar aggregate broadcast back via
    cross join (map-side, no shuffle of df), so the whole key build
    adds one metadata-sized job — scale-safe."""
    stats = df.agg(
        F.min(xcol).alias("_xmin"),
        F.max(xcol).alias("_xmax"),
        F.min(ycol).alias("_ymin"),
        F.max(ycol).alias("_ymax"),
    )
    scale = 1 << bits
    with_stats = df.crossJoin(F.broadcast(stats))
    xn = F.expr(f"(({xcol} - _xmin) * {scale}) div (_xmax - _xmin + 1)")
    yn = F.expr(f"(({ycol} - _ymin) * {scale}) div (_ymax - _ymin + 1)")
    return with_stats.withColumn(key_col, zorder_key(xn, yn, bits)).drop(
        "_xmin", "_xmax", "_ymin", "_ymax"
    )


def zordered_sql(table: str, x: str, y: str, bits: int = 16) -> str:
    """DuckDB mirror of :func:`zordered`'s normalized key (as a scalar
    expression usable in a SELECT over ``table`` CROSS JOIN stats)."""
    scale = 1 << bits
    xn = f"((({x} - _xmin) * {scale}) // (_xmax - _xmin + 1))"
    yn = f"((({y} - _ymin) * {scale}) // (_ymax - _ymin + 1))"
    return zorder_key_sql(xn, yn, bits)
