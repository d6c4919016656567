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
    curation,
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
    # order.  Rounds r01–r03 attested 150 distinct entries (see
    # CORRECTNESS_r0*.json); the 68 never-attested go first — oracle-backed
    # ahead of rows-only.  Any NEW query added mid-round must be APPENDED
    # AFTER the never-attested block (never inserted before it) until it
    # has a driver-attested green row, so each round's window retires the
    # oldest unattested prefix.  NEXT ROTATION (round 5): after
    # CORRECTNESS_r04 lands, promote the 4 oracle-backed overflow entries
    # (stream_full_outer_join_replay, synthdocs_stream_profile,
    # stream_window_topk, stream_attribution_replay) plus the 14
    # rows-only entries in never_attested_rest to the front; that retires
    # the whole backlog (18 < 50) and frees the rest of the window for
    # any round-4/5 additions.  The round-4 session added 19 more
    # never-attested entries (dedup_containment, train_test_split,
    # stream_minhash_dedup_replay, dedup_semantic, bucketed_join_agg,
    # zipf_fit, shard_export, text_gopher_rules, dsir_weights,
    # text_winnowing, hard_negatives, k_anonymity_audit,
    # embedding_random_projection, embedding_covariance, embedding_pca,
    # udf_cogroup_arrow, image_neardup_phash, table_transpose,
    # sql_scripting, xml_roundtrip_sort, txlog_stats_skipping,
    # ann_recall_eval, corpus_drift_kl, text_novelty,
    # embedding_frechet — 25 in all, plus the curation batches:
    # dedup_keep_best, bloom_decontaminate, entity_match_pairs,
    # inverted_index, bitext_margin_mining, dedup_recall_eval,
    # cdc_apply, temperature_resample, quality_classifier_nb,
    # graph_personalized_pagerank, stream_cdc_replay — 36 in all) —
    # every one selfcheck-green; promote them right behind the 18
    # above in r05 (54 + 18 > 50, so rounds 5-6 retire everything).
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
    # curation batch 4b (added late in round 4, all oracle-backed):
    # promote with the rest of the round-4 additions in the r05/r06
    # rotation per the note above.
    reg.update(curation.WORKLOADS)

    # ROUND-4 ROTATION: r01–r03 attested 150 distinct entries; the 68
    # never-attested remain. The 54 oracle-backed ones go first (the
    # driver's 50-slot window retires all but the last 4 this round),
    # headlined by the reference's flagship kernel (pagerank_events),
    # the six TPC-H closers, the txlog/lakehouse pair, and the udf_*
    # API surface — exactly VERDICT r03's top-next list. The 14
    # rows-only entries (weaker rows-only check) queue behind for r05.
    # Slots 1-50 (+4 overflow): oracle-backed, never driver-attested,
    # all selfcheck-green at sf0.01.
    never_attested_oracle = [
        "pagerank_events",
        "tpch_q2",
        "tpch_q11",
        "tpch_q12",
        "tpch_q16",
        "tpch_q20",
        "tpch_q21",
        "txlog_time_travel",
        "stream_txlog_ingest",
        "udf_grouped_ols",
        "udf_grouped_arrow",
        "udf_cogroup_asof",
        "sql_udf_funcs",
        "graph_hits",
        "graph_modularity",
        "graph_kcore",
        "graph_bfs_sql",
        "ml_naive_bayes",
        "ml_kmeans_relational",
        "ml_linear_gd",
        "ml_logreg_gd",
        "kmv_jaccard",
        "table_diff",
        "variant_extract",
        "lateral_topn",
        "try_funcs",
        "events_ewma",
        "robust_stats",
        "corr_matrix",
        "jsonl_sink_roundtrip",
        "dq_checks",
        "compaction_plan",
        "attribution_last_touch",
        "attribution_linear",
        "attribution_ushaped",
        "peak_concurrency",
        "session_path_topk",
        "rolling_corr",
        "item_cf_topk",
        "survival_km",
        "ab_test_zstat",
        "changepoint_ph",
        "seasonality_dow",
        "revenue_gini",
        "forecast_backtest",
        "sample_per_group",
        "chunk_documents",
        "synthdocs_profile",
        "feature_hash_bow",
        "text_unicode_clean",
        # slots 51-54: oracle-backed overflow — r05's first entries
        "stream_full_outer_join_replay",
        "synthdocs_stream_profile",
        "stream_window_topk",
        "stream_attribution_replay",
    ]
    # Rows-only never-attested (row-count check only): behind every
    # oracle-backed never-attested entry, retired in r05's window.
    never_attested_rest = [
        "text_bpe_merges",
        "text_bpe_tokenize",
        "text_compression_ratio",
        "ml_kmeans_fit",
        "ml_mlp_fit",
        "ml_cnn_fit",
        "ml_linear_fit",
        "ml_logreg_fit",
        "ml_als_fit",
        "multimodal_features",
        "multimodal_resize",
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
