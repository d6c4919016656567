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
    pipeline_ext,
    relational,
    relational_ext,
    streaming_graph,
    tpch,
    warehouse,
)


def all_workloads() -> dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]]:
    # ORDERING INVARIANT (keep this rule every round): the driver's
    # correctness harness verifies only the FIRST ~50 registry entries in
    # order.  Rounds r01+r02 attested 100 distinct entries (see
    # CORRECTNESS_r01/r02.json); the 51 entries never inside a window go
    # first this round — oracle-backed ahead of rows-only.  Any NEW query
    # added mid-round must be APPENDED AFTER the never-attested block (never
    # inserted before it) until it has a driver-attested green row, so each
    # round's window retires the oldest unattested prefix.
    reg: dict = {}
    reg.update(llm.WORKLOADS)
    reg.update(streaming_graph.WORKLOADS)
    reg.update(warehouse.WORKLOADS)
    reg.update(relational.WORKLOADS)
    reg.update(tpch.WORKLOADS)
    reg.update(relational_ext.WORKLOADS)
    # Appended AFTER the never-attested block per the ordering invariant:
    # these earn their first driver-attested row in a later window.
    reg.update(pipeline_ext.WORKLOADS)

    # NEXT ROTATION (round 4): after CORRECTNESS_r03 lands, move into
    # the window (oracle-backed, selfcheck-green, never attested):
    # the overflow of never_attested_rest below slot 50, plus this
    # round's additions — dq_checks, compaction_plan,
    # attribution_last_touch, attribution_linear, peak_concurrency,
    # session_path_topk, rolling_corr, item_cf_topk, survival_km,
    # ab_test_zstat, changepoint_ph, ml_naive_bayes, feature_hash_bow,
    # stream_attribution_replay, graph_hits, graph_modularity,
    # kmv_jaccard, udf_grouped_arrow (rows-only ml_als_fit stays in
    # the tail).
    # Slots 1-37: oracle-backed, never driver-attested (selfcheck-green).
    never_attested_oracle = [
        "tpch_q4",
        "tpch_q6",
        "tpch_q7",
        "tpch_q8",
        "tpch_q9",
        "tpch_q10",
        "tpch_q13",
        "tpch_q14",
        "tpch_q15",
        "tpch_q17",
        "tpch_q19",
        "tpch_q22",
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
        "fuzzy_match",
        "quantile_bins",
        "feature_scale",
        "latest_by_key",
        "cumulative_reach",
        "funnel_latency",
        "event_transitions",
        "pareto_abc",
        "weighted_sample",
        "histogram_width",
        "embedding_norms",
        "jsonl_roundtrip_sort",
        "orc_roundtrip_sort",
        "partitioned_prune_agg",
        "salted_join_agg",
    ]
    # Slots 38-40: the LSH scale paths, oracle-upgraded this round so
    # they hash-match rather than record the weaker rows-only check.
    # Slots 41-50: this session's NEW oracle-backed operators — every
    # window slot now earns a hash-verified green row (rows-only
    # entries yield only a row-count check, so they queue BEHIND any
    # oracle-backed never-attested entry; the BPE/ML/pagerank
    # rows-only family follows in the tail for a later round).
    never_attested_rest = [
        "dedup_minhash_lsh",
        "dedup_embedding_cosine_lsh",
        "sim_cosine_topk_lsh",
        "dedup_substring",
        "sim_cosine_topk_pq",
        "ngram_topk",
        "cms_heavy_hitters",
        "kmv_distinct",
        "stream_cms_replay",
        "graph_sssp",
        "graph_label_propagation",
        "anomaly_zscore",
        "ml_tree_split",
        # below the 50-entry window line: queued for the next rotation
        "sample_per_group",
        "text_bpe_merges",
        "text_bpe_tokenize",
        "pagerank_events",
        "graph_kcore",
        "ml_kmeans_fit",
        "ml_mlp_fit",
        "ml_linear_fit",
        "multimodal_features",
        "hll_rollup",
        "pagerank_synthetic",
        "pagerank_synthetic_broadcast",
    ]
    ordered = {
        name: reg[name]
        for name in never_attested_oracle + never_attested_rest
        if name in reg
    }
    ordered.update(reg)
    return ordered


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in all_workloads().items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in all_workloads().items() if sql is not None}
