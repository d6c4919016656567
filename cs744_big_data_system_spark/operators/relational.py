"""Reusable relational operators beyond plain df.join/groupBy:
range join, top-k, tagged set ops, as-of join, sessionization.

These fill the §2.9 gaps (the reference only ever does one inner
equi-join — assignment1/part3/task1/task1.py:51); everything here is
declarative so Catalyst/AQE pick the physical strategy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def range_join(
    facts: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
) -> DataFrame:
    """Non-equi join: fact.value ∈ [band.lo, band.hi).

    The band table is broadcast — a range join against a small
    dimension must never shuffle the fact side (at 100 TB the fact
    scan is the whole cost; the broadcast-nested-loop adds ~nothing).
    """
    cond = (F.col(value_col) >= bands[lo_col]) & (F.col(value_col) < bands[hi_col])
    return facts.join(F.broadcast(bands), cond, "inner")


def top_k(df: DataFrame, k: int, *order_cols) -> DataFrame:
    """orderBy + limit — Spark plans TakeOrderedAndProject: each
    partition keeps a k-heap, the driver merges k·p rows, no global
    sort. Callers must include a unique tiebreak column."""
    return df.orderBy(*order_cols).limit(k)


def grouped_top_k(df: DataFrame, partition_cols: list[str], k: int, *order_cols) -> DataFrame:
    """Per-group top-k via window row_number (one shuffle on the
    partition cols; AQE handles group skew)."""
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    return df.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)


def tagged_set_ops(a: DataFrame, b: DataFrame, tag_col: str = "op") -> DataFrame:
    """UNION / INTERSECT / EXCEPT of two same-schema relations, stacked
    with a tag column — exercises all three set ops in one result."""
    u = a.union(b).distinct().withColumn(tag_col, F.lit("union"))
    i = a.intersect(b).withColumn(tag_col, F.lit("intersect"))
    e = a.subtract(b).withColumn(tag_col, F.lit("except"))  # EXCEPT DISTINCT
    return u.unionByName(i).unionByName(e)


def asof_join_last_prior(
    df: DataFrame,
    partition_col: str,
    time_col: str,
    mark_cond,
    value_col: str,
    out_col: str = "asof_value",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Self as-of join: for every row, the most recent value of
    ``value_col`` from a prior-or-current row satisfying ``mark_cond``
    within the same partition.

    Implemented as last(ignorenulls) over an ordered running window —
    one shuffle on the partition key, no join at all. This is the
    Spark-idiomatic as-of (the union+window trick from SURVEY.md §2.9).
    """
    order = [F.col(time_col).asc()] + ([F.col(tiebreak_col).asc()] if tiebreak_col else [])
    w = (
        Window.partitionBy(partition_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = F.when(mark_cond, F.col(value_col))
    return df.withColumn(out_col, F.last(marked, ignorenulls=True).over(w))


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    time_col: str = "ts",
    gap_minutes: int = 30,
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Gaps-and-islands sessionization: a new session starts when the
    gap to the previous event of the same user exceeds ``gap_minutes``.

    Adds ``session_id`` (running count of session starts per user).
    Two window passes over one shuffle on the user key — identical
    algorithm to the DuckDB oracle, so batch results are
    hash-comparable; the streaming analogue is
    streaming/windows.py::session_window_counts.
    """
    w = Window.partitionBy(user_col).orderBy(F.col(time_col).asc(), F.col(tiebreak_col).asc())
    prev_ts = F.lag(time_col).over(w)
    # Microsecond gap arithmetic: cast("long") would truncate to whole
    # seconds and disagree with the µs-precision oracle on gaps that
    # straddle the boundary by sub-second amounts.
    gap_us = F.unix_micros(F.col(time_col)) - F.unix_micros(prev_ts)
    is_new = F.when(prev_ts.isNull() | (gap_us > gap_minutes * 60 * 1_000_000), 1).otherwise(0)
    run = (
        Window.partitionBy(user_col)
        .orderBy(F.col(time_col).asc(), F.col(tiebreak_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return events.withColumn("session_id", F.sum(is_new).over(run))
