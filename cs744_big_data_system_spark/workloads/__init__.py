"""Workload registry: every operator from SURVEY.md §2 (and the §2.9 /
LLM-pipeline extensions) as a named query with, where SQL-expressible,
a DuckDB oracle that must hash-match.

Each entry is (fn: (spark, sf_dir) -> DataFrame, oracle: str | None).
Column names/types are aligned between the Spark result and the oracle
(the driver sorts columns by name and hashes values — SURVEY.md §5.2).

Conventions shared by both sides:
  * timestamps → ``unix_micros(ts)`` / ``epoch_us(ts)`` (bigint) or
    date-formatted strings — never raw timestamp objects;
  * float aggregates → round(x, 4..6) with identical accumulation order;
  * DuckDB integer sums → CAST(... AS BIGINT) (DuckDB widens to INT128);
  * every computed column aliased identically in Spark and SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from cs744_big_data_system_spark.workloads import (
    llm,
    relational,
    relational_ext,
    streaming_graph,
    tpch,
)


def all_workloads() -> dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]]:
    # Registration order matters: the driver's correctness harness verifies a
    # bounded window of entries in registry order, so the differentiating
    # families (LLM-pipeline, streaming, graph) come first, then the relational
    # core, then the long tail of relational extensions.
    reg: dict = {}
    reg.update(llm.WORKLOADS)
    reg.update(streaming_graph.WORKLOADS)
    reg.update(relational.WORKLOADS)
    reg.update(tpch.WORKLOADS)
    reg.update(relational_ext.WORKLOADS)
    return reg


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in all_workloads().items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in all_workloads().items() if sql is not None}
