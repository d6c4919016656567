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
    warehouse,
)


def all_workloads() -> dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]]:
    # Registration order matters: the driver's correctness harness verifies a
    # bounded window (50 entries in r01) in registry order.  Only
    # CORRECTNESS_r01 exists, and it covered the relational/relational_ext
    # prefix — so the LLM-pipeline, streaming, and graph families (the
    # differentiating operators) have never received a driver-attested row.
    # This round they go first, oracle-backed entries ahead of rows-only
    # ones, padded to exactly 50 with the strongest never-attested TPC-H /
    # relational additions.  The r01-attested relational core follows.
    reg: dict = {}
    reg.update(llm.WORKLOADS)
    reg.update(streaming_graph.WORKLOADS)
    reg.update(warehouse.WORKLOADS)
    reg.update(relational.WORKLOADS)
    reg.update(tpch.WORKLOADS)
    reg.update(relational_ext.WORKLOADS)

    oracle_llm_sg = [
        name
        for fam in (llm.WORKLOADS, streaming_graph.WORKLOADS)
        for name, (_, sql) in fam.items()
        if sql is not None
    ]
    pad = [
        "flagship_q18",
        "approx_percentile",
        "merge_upsert",
        "scd2_history",
        "topk_per_group_salted",
        "timeseries_gapfill",
        "zorder_layout",
        "incremental_agg_merge",
        "skew_diagnostics",
        "window_dist",
        "table_profile",
        "join_null_safe",
        "fk_orphans",
        "basket_affinity",
        "dataset_split",
        "fuzzy_match",
        "quantile_bins",
        "feature_scale",
        "latest_by_key",
        "cumulative_reach",
        "funnel_latency",
        "event_transitions",
        "pareto_abc",
        "weighted_sample",
        "stream_outer_join_replay",
        "graph_two_hop",
        "histogram_width",
        "embedding_norms",
        "tpch_q4",
        "tpch_q6",
        "tpch_q9",
        "tpch_q10",
        "tpch_q14",
        "tpch_q19",
        "tpch_q22",
        # beyond slot 50: the rest of the never-attested additions
        "tpch_q7",
        "tpch_q8",
        "tpch_q13",
        "tpch_q15",
        "tpch_q17",
        "jsonl_roundtrip_sort",
        "orc_roundtrip_sort",
        "partitioned_prune_agg",
        "salted_join_agg",
    ]
    ordered = {name: reg[name] for name in oracle_llm_sg + pad if name in reg}
    ordered.update(reg)
    return ordered


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in all_workloads().items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in all_workloads().items() if sql is not None}
