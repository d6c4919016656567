"""sf0.1 → sf1 scale smoke: time the heaviest headline queries at both
scales and report the scaling factor — the empirical leg of the 100 TB
posture (VERDICT r03 next-step #6). A query whose shape is scale-safe
(banded self-joins, bounded broadcasts, calendar-bounded windows)
should scale ≲ linearly in rows (10x data → ≤ ~10x time, usually much
less on local[32] where sf0.1 underutilizes the cores); a super-linear
outlier means a pair blowup or a single-task stage and fails the run.

Usage:
    python tools/scale_data.py              # once: builds /tmp/scale_sf1
                                            # (perturbed clones by default
                                            #  since r08; --verbatim for the
                                            #  10-clique stress input)
    python tools/scale_smoke.py [out_md]    # writes BENCH_SF1.md
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cs744_big_data_system_spark.session import get_spark
from cs744_big_data_system_spark.workloads import all_workloads

SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/scale_sf1"

#: the heaviest / most scale-exposed queries (r03 bench top + every
#: family with a documented boundedness claim worth measuring)
QUERIES = [
    "dedup_substring",          # positional-shingle self-join
    "dedup_ngram_jaccard",      # shingle self-join + df-cutoff
    "dedup_minhash_lsh",        # banded LSH self-join
    "dedup_embedding_cosine_lsh",
    "llm_clean_corpus",         # whole-pipeline composition
    "graph_hits",               # iterative, checkpoint+broadcast max
    "graph_sssp",               # iterative frontier
    "graph_modularity",
    "kmv_jaccard",              # sketch pairs
    "pagerank_events",          # the reference's flagship kernel
    "basket_affinity",          # pair self-join on baskets
    "tpch_q9",                  # multi-join fact query
    "percentile",               # exact per-group sort
    "peak_concurrency",         # calendar-bounded global carry
    "sim_cosine_topk_ivf",      # bucketed ANN
    "events_funnel",
    # round-4 additions: the third shingle self-join and the
    # streaming dedup-on-ingest path (replay machinery + bounded
    # bucket state)
    "dedup_containment",
    "stream_minhash_dedup_replay",
    # round-4 continuation: geometry-blocked dedup, hashed-ngram
    # selection, MOSS fingerprints, real-decode image dedup, the
    # sharded-export roundtrip, and the zero-exchange bucketed join
    "dedup_semantic",
    "dsir_weights",
    "text_winnowing",
    "image_neardup_phash",
    "shard_export",
    "bucketed_join_agg",
    "text_novelty",
    "corpus_drift_kl",
    "embedding_frechet",
    "ann_recall_eval",
    # curation batch 4b: the bloom broadcast, the CC-based survivor
    # pick, the banded-LSH recall audit, and the windowless CDC agg
    "dedup_keep_best",
    "bloom_decontaminate",
    "entity_match_pairs",
    "inverted_index",
    "bitext_margin_mining",
    "dedup_recall_eval",
    "cdc_apply",
    "temperature_resample",
    "quality_classifier_nb",
    "graph_personalized_pagerank",
    # round-5 completion (VERDICT r04 item 5): every remaining bench
    # query >= 1 s at sf0.1, so BENCH_SF1.md covers the whole benched
    # surface that has measurable scale exposure
    "flagship_q3",
    "flagship_q5",
    "dedup_minhash_sig",
    "dedup_simhash_pairs",
    "text_tfidf_bm25",
    "text_pmi_cooccurrence",
    "pagerank_synthetic",
    "pagerank_synthetic_broadcast",
    "text_perplexity_filter",
    "timeseries_gapfill",
    "graph_bfs_hops",
    "sim_cosine_topk_lsh",
    "ml_cnn_fit",
    "ml_mlp_fit",
    "sim_cosine_topk_pq",
    "cms_heavy_hitters",
    "graph_label_propagation",
    "stream_cms_replay",
    "ml_logreg_gd",
    "txlog_time_travel",
    "stream_txlog_ingest",
    "udf_cogroup_asof",
    "ml_naive_bayes",
    "stream_attribution_replay",
    "item_cf_topk",
    "embedding_random_projection",
    "embedding_pca",
    "udf_cogroup_arrow",
    "xml_roundtrip_sort",
    "txlog_stats_skipping",
    "stream_cdc_replay",
    # round-5 additions with corpus-dependent cost
    "dedup_incremental",
    "retrieval_ndcg",
    "data_card_report",
    "scd2_asof_lookup",
    "quantile_drift_psi",
    # late-round-5 additions (curation3), >=1s at sf0.1
    "sql_recursive_cte",        # iterative CTE: levels ~ log N
    "bm25_search_topk",         # posting-list join + topk
    "stream_upsert_sink_replay",# per-batch MERGE chain
    "stream_state_inspect",     # streaming agg + state read
    "video_frame_sample",       # container parse + PPM decode
    # curation4 (round-5 closing batch), >=1s at sf0.1 with
    # corpus-dependent cost (graph_multi_bfs/graph_random_walks run
    # on the fixed hash graph — no corpus exposure — and are omitted)
    "txlog_lifecycle_audit",    # ledger lifecycle + vacuum
    "global_row_ids",           # two-pass id assignment
    "exact_quantiles_2pass",    # histogram + bin refinement
    "insert_overwrite_partitions",
    "ml_kfold_cv",              # one-pass CV sufficient stats
    "ks_test_2sample",          # two-level ecdf prefix sums
    # curation5-7 + frontends (round-5 final batches), >=1s at sf0.1
    # with corpus-dependent cost (graph_connected_components runs on
    # the fixed planted-islands graph — no corpus exposure — and is
    # omitted like graph_multi_bfs/graph_random_walks)
    "bootstrap_ci",             # 100x replicate expansion + combine
    "join_null_safe",           # null-safe hash join
    "stream_session_timeout_replay",
    "stream_data_card_replay",
    "stream_dedup_within_watermark_replay",
    "stream_rocksdb_state_replay",
    "stream_progress_metrics",
    "pyds_sink_roundtrip",      # two-phase-commit Python sink
    "ps_frontend_agg",          # pandas-on-Spark front end
    "gdpr_erase",               # file-pruned copy-on-write delete
    "sql_scripting",
    "graph_triangles",          # degree-oriented wedge join
    "ml_linear_gd",             # all-reduce training loop
    # r07 (VERDICT r06 item 5): the newly-attested entries >=1 s at
    # sf0.1. graph_multi_bfs / graph_connected_components run on FIXED
    # synthetic graphs (no corpus exposure) — their expected ratio is
    # ~1.0, which doubles as a fixed-cost host-health row inside the
    # smoke artifact itself (same idea as bench.py's probe).
    "graph_multi_bfs",
    "graph_connected_components",
    "weblog_parse_agg",         # regex ETL scan
    "spatial_join_blocked",     # grid-blocked planar NN join
    "robust_outlier_mad",       # per-group exact percentiles
    "segmented_ab_welch",       # per-segment Welch aggregates
    "table_checksum_audit",     # order-independent fingerprints
    "attribution_shapley",      # events scan -> bitmask coalitions
    "set_ops_bag",              # bag-semantics set ops
    "aqp_sample_estimate",      # hash-sample + error audit
    "stream_ivm_replay",        # foreachBatch delta-merge view
    "merkle_row_repair",        # two-phase anti-entropy drill-down
]


def _input_text_novelty(spark, sf_dir: str) -> int:
    """doc-distinct 3-gram shingle pairs — the cardinality both of
    ngram_novelty's shuffles key on (the query's true work driver;
    the corpus text itself decides it, not the row count)."""
    from cs744_big_data_system_spark.operators.text_analysis import doc_shingles
    from cs744_big_data_system_spark.sources.readers import load_table

    return doc_shingles(load_table(spark, sf_dir, "documents"), n=3).count()


def _input_entity_match_pairs(spark, sf_dir: str) -> int:
    """Sorted-neighborhood candidate pairs, closed form from block
    sizes: per block of B rows with window W the rank-banded join
    emits sum_i min(W, B-i) = (B-W)*W + W*(W-1)/2 for B >= W, else
    B*(B-1)/2 — the exact pre-filter pair count the query scores."""
    from pyspark.sql import functions as F

    from cs744_big_data_system_spark.sources.readers import load_table
    from cs744_big_data_system_spark.workloads.curation import SNM_WINDOW as W

    sizes = (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_nationkey", "c_mktsegment")
        .count()
    )
    b = F.col("count")
    pairs = sizes.select(
        F.sum(
            F.when(b >= W, (b - W) * W + W * (W - 1) / 2).otherwise(
                b * (b - 1) / 2
            )
        ).alias("pairs")
    ).first()["pairs"]
    return int(pairs or 0)


#: measured input-growth counters for the rows whose 10x time ratios
#: needed out-of-band adjudication in r07/r08 (VERDICT r08 item 5: the
#: 13.1x distinct-shingle count was a hand-run query — emit it from
#: the smoke itself so the adjudication is fully in-artifact).
INPUT_GROWTH = {
    "text_novelty": _input_text_novelty,
    "entity_match_pairs": _input_entity_match_pairs,
}


def time_query(fn, spark, sf_dir, reps: int = 2, fresh_memo: bool = False) -> float:
    times = []
    df = None
    for _ in range(reps + 1):
        if fresh_memo:
            # CC-cluster consumers: the smoke measures how the FULL
            # simhash->CC pipeline scales, not a session-memo hit.
            from cs744_big_data_system_spark.workloads import llm as _llm

            _llm._CC_CLUSTER_CACHE.clear()
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        times.append(time.perf_counter() - t0)
    for attr in ("cached_links", "cached_nodes"):
        cached = getattr(df, attr, None)
        if cached is not None:
            cached.unpersist()
    spark.sparkContext._jvm.System.gc()
    return sum(times[1:]) / len(times[1:])


def main() -> None:
    out_md = sys.argv[1] if len(sys.argv) > 1 else "BENCH_SF1.md"
    if not os.path.exists(os.path.join(SF1, "lineitem.parquet")):
        sys.exit("run tools/scale_data.py first")
    spark = get_spark("scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    # Host-health probes bracket the run (bench.py's pinned micro-ops,
    # VERDICT r06 item 2): a degraded or drifting window shows up in
    # the artifact itself instead of needing a judge re-run.
    import bench

    probe_start = bench.calibration_probe(spark)
    reg = all_workloads()
    rows = []
    for name in QUERIES:
        fn, _ = reg[name]
        fresh = name in ("dedup_clusters", "dedup_keep_best")
        t01 = time_query(fn, spark, SF01, fresh_memo=fresh)
        t1 = time_query(fn, spark, SF1, fresh_memo=fresh)
        ratio = t1 / t01 if t01 > 0 else float("inf")
        rows.append((name, round(t01, 3), round(t1, 3), round(ratio, 2)))
        print(json.dumps({"q": name, "sf0.1": rows[-1][1], "sf1": rows[-1][2], "x": rows[-1][3]}))
    growth = []
    for name, counter in INPUT_GROWTH.items():
        n01, n1 = counter(spark, SF01), counter(spark, SF1)
        growth.append((name, n01, n1, round(n1 / n01, 2) if n01 else float("inf")))
        print(json.dumps({"q": name, "input_sf0.1": n01, "input_sf1": n1,
                          "input_x": growth[-1][3]}))
    probe_end = bench.calibration_probe(spark)
    spark.stop()

    lines = [
        "# BENCH_SF1 — 10x scale smoke (sf0.1 vs sf1-equivalent)",
        "",
        "sf1 data = tools/scale_data.py's 10x key-offset replication of",
        "the driver's sf0.1 parquet (fixed calendar span, 10x density —",
        "see that tool's docstring). Since r08 the generator PERTURBS",
        "clone content by default (graded md5-seeded token substitution",
        "for documents.text, ±r% jitter for embeddings), so dedup-family",
        "ratios measure plan scaling instead of the quadratic output",
        "growth that verbatim 10-cliques force by construction.",
        "Same harness as bench.py: noop sink,",
        "discard-first-rep, mean of 2. local[32], so sf0.1 underutilizes",
        "cores and sub-10x ratios are expected for shuffle-bound plans;",
        "anything clearly SUPER-linear (≫10x) would flag a pair blowup or",
        "single-task stage.",
        "",
        "Host-health probes (bench.py's pinned micro-ops) bracketing the",
        f"run: start cpu {probe_start['cpu']} / io {probe_start['io']},",
        f"end cpu {probe_end['cpu']} / io {probe_end['io']} (idle-host",
        "reference ~0.23-0.28 / 0.17-0.27; sf0.1-vs-sf1 pairs are timed",
        "back-to-back per query, so slow drift largely cancels in the",
        "ratio column).",
        "",
        "| query | sf0.1 (s) | sf1 (s) | ratio |",
        "|---|---|---|---|",
    ]
    for name, t01, t1, ratio in rows:
        lines.append(f"| {name} | {t01} | {t1} | {ratio}x |")
    total01 = round(sum(r[1] for r in rows), 2)
    total1 = round(sum(r[2] for r in rows), 2)
    lines += [
        f"| **total** | **{total01}** | **{total1}** | **{round(total1 / total01, 2)}x** |",
        "",
    ]
    if growth:
        by_name = {r[0]: r for r in rows}
        lines += [
            "## Measured input growth (in-artifact adjudication)",
            "",
            "For rows whose time ratio exceeds the 10x row-growth prior,",
            "the smoke measures the query's true work driver at both",
            "scales (these counters run inside this same smoke session —",
            "no hand-carried numbers). A time ratio at or below the input",
            "ratio is linear in the work the data actually presents.",
            "",
            "| query | time ratio | input (work driver) | input sf0.1 | input sf1 | input growth |",
            "|---|---|---|---|---|---|",
        ]
        driver_desc = {
            "text_novelty": "doc-distinct 3-gram shingle pairs",
            "entity_match_pairs": "sorted-neighborhood candidate pairs",
        }
        for name, n01, n1, g in growth:
            tr = f"{by_name[name][3]}x" if name in by_name else "-"
            lines.append(
                f"| {name} | {tr} | {driver_desc.get(name, '')} | "
                f"{n01} | {n1} | {g}x |"
            )
        lines.append("")
    with open(out_md, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out_md}")


if __name__ == "__main__":
    main()
