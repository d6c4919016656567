"""Sinks: Parquet (engine standard), CSV and text (reference parity).

SURVEY.md §2.1 S5 (CSV sink w/ header — assignment1/part2/task.py:26) and
S6 (text sink — assignment1/part3/task1/task1.py:54).

At scale: one output file per partition; callers control file count via
``df.repartition(n)`` / ``df.coalesce(n)`` before writing, never by
collecting to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite", partition_by: list[str] | None = None) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = True) -> None:
    """CSV sink with header (reference parity: task.py:26)."""
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 16,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed (hash-partitioned-at-rest) managed table — the
    co-located-join path: two tables bucketed the same way on the join
    key join with NO exchange on either side, which at 100 TB removes
    the dominant cost of every fact⋈fact join. Sorted buckets
    additionally skip the sort of a sort-merge join.

    Plan proof: tests/test_plans.py::test_bucketed_join_has_no_shuffle.
    """
    writer = df.write.mode(mode).bucketBy(num_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.format("parquet").saveAsTable(table)


def write_sharded(
    df: DataFrame,
    path: str,
    shard_col: str,
    num_shards: int,
    order_col: str,
    mode: str = "overwrite",
) -> None:
    """Deterministic training-shard layout: one directory per shard
    value (``partitionBy``), rows clustered so each shard is written by
    one task (``repartition(num_shards, shard_col)``) and internally
    sorted on ``order_col`` — the reproducible-shard contract a
    training dataloader needs (same data → same shard files, same
    in-file order, no cross-run nondeterminism from task scheduling).
    At scale the shard column should be a content/id hash so shard
    sizes stay balanced regardless of ingest order."""
    (
        df.repartition(num_shards, F.col(shard_col))
        .sortWithinPartitions(shard_col, order_col)
        .write.mode(mode)
        .partitionBy(shard_col)
        .parquet(path)
    )


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines sink — the interchange format training-data tooling
    speaks. One JSON object per row, one file per partition."""
    df.write.mode(mode).json(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink — the other columnar-at-rest format Spark ships
    natively; types and values round-trip exactly like Parquet."""
    df.write.mode(mode).orc(path)


def write_text(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Text sink. The reference stringified (node, rank) tuples
    (task1.py:54); here any DataFrame is concat-serialized to one
    string column JVM-side, then written."""
    cols = [F.col(c).cast("string") for c in df.columns]
    line = F.concat_ws("\t", *cols).alias("value")
    df.select(line).write.mode(mode).text(path)


def write_xml(
    df: DataFrame, path: str, mode: str = "overwrite", row_tag: str = "row"
) -> None:
    """XML sink via Spark 4's native XML source (no external package) —
    the fourth interchange format beside CSV/JSONL/ORC; one file per
    partition like every other sink here."""
    df.write.mode(mode).format("xml").option("rowTag", row_tag).save(path)
