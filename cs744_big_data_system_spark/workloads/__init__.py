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


# Queries never yet inside the driver's bounded verification window
# (r01 covered the relational/relational_ext prefix; r02 covered the
# llm/streaming_graph prefix).  They go first this round so every
# registry entry has at least one driver-attested CORRECTNESS row;
# the round-1 relational core follows to refresh its green rows.
_R3_PREFIX = [
    "flagship_q18",
    "approx_percentile",
    "jsonl_roundtrip_sort",
    "orc_roundtrip_sort",
    "partitioned_prune_agg",
    "salted_join_agg",
    "pagerank_synthetic_broadcast",
    "ml_linear_fit",
    "tpch_q2",
    "tpch_q4",
    "tpch_q6",
    "tpch_q7",
    "tpch_q8",
    "tpch_q9",
    "tpch_q10",
    "tpch_q11",
    "tpch_q12",
    "tpch_q13",
    "tpch_q14",
    "tpch_q15",
    "tpch_q16",
    "tpch_q17",
    "tpch_q19",
    "tpch_q20",
    "tpch_q21",
    "tpch_q22",
]


def all_workloads() -> dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]]:
    # Registration order matters: the driver's correctness harness verifies a
    # bounded window of entries in registry order.  Round 3 rotation: the
    # never-attested queries first (see _R3_PREFIX), then the relational
    # core, then the families already attested in r01/r02.
    reg: dict = {}
    reg.update(relational.WORKLOADS)
    reg.update(tpch.WORKLOADS)
    reg.update(relational_ext.WORKLOADS)
    reg.update(llm.WORKLOADS)
    reg.update(streaming_graph.WORKLOADS)
    ordered = {name: reg[name] for name in _R3_PREFIX if name in reg}
    ordered.update(reg)
    return ordered


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in all_workloads().items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in all_workloads().items() if sql is not None}
