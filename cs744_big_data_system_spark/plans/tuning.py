"""Runtime plan tuning helpers shared by the iterative kernels.

Spark fixes a stateful/iterative loop's shuffle width from
``spark.sql.shuffle.partitions`` at submission, and the session default
(sized for corpus-scale batch shuffles) is pure per-task scheduling
overhead when the loop's working set is a small derived table — a
frontier, a label table, a candidate-pair graph. Measured on the r06/07
heavy tail: connected components on a 697-node label table ran 6.7 s at
32 partitions vs 3.2 s at 2; multi-source BFS on a 12k-edge graph spent
~10 of its 12.6 s scheduling empty tasks.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import SparkSession


@contextmanager
def loop_shuffle_partitions(
    spark: SparkSession, n_rows: int, rows_per_partition: int = 250_000
):
    """Scope ``spark.sql.shuffle.partitions`` to the loop's WORKING-SET
    row count: one partition per ``rows_per_partition`` rows, floor 2,
    the session value as the ceiling (a wide cluster config is capped,
    never raised — at a billion rows a real cluster keeps its thousands
    of partitions). Every DataFrame the caller wants at full session
    width must be materialized OUTSIDE this scope; results produced
    inside should be checkpointed inside so no lazy stage escapes to
    run narrow... or wide.

    NOT reentrant / thread-safe for the same reason as
    streaming/windows._drain_stream: it mutates the session-global
    conf and restores it in ``finally``. The harness is single-
    threaded; nesting restores the outer value correctly only if the
    inner scope exits first (which `with` guarantees), but concurrent
    jobs in another thread would observe the narrowed value.
    """
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    scoped = min(int(prev), max(2, n_rows // rows_per_partition))
    spark.conf.set("spark.sql.shuffle.partitions", str(scoped))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
