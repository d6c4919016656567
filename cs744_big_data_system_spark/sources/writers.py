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


def write_text(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Text sink. The reference stringified (node, rank) tuples
    (task1.py:54); here any DataFrame is concat-serialized to one
    string column JVM-side, then written."""
    cols = [F.col(c).cast("string") for c in df.columns]
    line = F.concat_ws("\t", *cols).alias("value")
    df.select(line).write.mode(mode).text(path)
