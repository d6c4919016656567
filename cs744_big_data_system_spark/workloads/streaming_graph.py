"""Streaming, graph/iterative, and multimodal workloads.

The streaming entries run the REAL Structured Streaming engine
(file-source replay, availableNow trigger, memory sink) and are still
oracle-checked where the watermark is loose enough to admit every row.
PageRank and LSH/multimodal entries are rows-only (iterative /
approximate / stubbed-decode — SURVEY.md §5.2 fallback), with exact
golden tests in tests/.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cs744_big_data_system_spark.graph.pagerank import pagerank
from cs744_big_data_system_spark.operators.multimodal import extract_features, synthetic_assets
from cs744_big_data_system_spark.sources.readers import edges_from_events, load_table
from cs744_big_data_system_spark.streaming.windows import (
    replay_to_batch,
    sliding_window_counts,
    tumbling_window_counts,
)


# --- Batch tumbling window (F.window) — oracle: time_bucket ---
def q_window_tumbling(spark, sf_dir):
    return tumbling_window_counts(load_table(spark, sf_dir, "events"), window="10 minutes")


SQL_WINDOW_TUMBLING = """
SELECT strftime(time_bucket(INTERVAL '10 minutes', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       count(*) AS n_events,
       CAST(round(sum(value), 4) AS DOUBLE) AS sum_value
FROM events GROUP BY 1, 2
"""


# --- Batch sliding window (F.window with slide) ---
def q_window_sliding(spark, sf_dir):
    return sliding_window_counts(
        load_table(spark, sf_dir, "events"), window="10 minutes", slide="5 minutes"
    )


SQL_WINDOW_SLIDING = """
WITH b AS (
  SELECT time_bucket(INTERVAL '5 minutes', ts) AS s5, event_type FROM events
), expanded AS (
  SELECT s5 AS ws, event_type FROM b
  UNION ALL
  SELECT s5 - INTERVAL '5 minutes' AS ws, event_type FROM b
)
SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start, event_type, count(*) AS n_events
FROM expanded GROUP BY 1, 2
"""


# --- TRUE streaming replay: tumbling windows through the streaming engine ---
def q_stream_tumbling_replay(spark, sf_dir):
    """Micro-batch replay of events.parquet with a loose watermark (no
    late drops), so the streaming result must equal the batch oracle —
    proof the state-store path computes the same answer."""
    return replay_to_batch(
        spark,
        f"{sf_dir}/events.parquet",
        lambda s: tumbling_window_counts(s, window="10 minutes", watermark="365 days"),
        output_mode="complete",
    )


# --- PageRank (reference assignment1/part3 semantics) — iterative, rows-only ---
def q_pagerank_events(spark, sf_dir):
    """Graph derived from the events fixture (consecutive event types
    per user — sources/readers.edges_from_events); 10 iterations,
    damping 0.85, matching assignment1/part3/task1/task1.py:39,52.
    Golden-graph parity tests: tests/test_pagerank.py."""
    edges = edges_from_events(load_table(spark, sf_dir, "events"))
    ranks = pagerank(edges, iterations=10, damping=0.85)
    return ranks.select("node", F.round("rank", 6).alias("rank"))


# --- Multimodal plumbing: Arrow-batched feature extraction (decode stubbed) ---
def q_multimodal_features(spark, sf_dir):
    assets = synthetic_assets(spark, n=64)
    feats = extract_features(assets)
    return feats.select(
        "asset_id",
        "modality",
        "n_bytes",
        F.round(F.element_at("feature", 1).cast("double"), 6).alias("f0"),
    )


WORKLOADS = {
    "window_tumbling": (q_window_tumbling, SQL_WINDOW_TUMBLING),
    "window_sliding": (q_window_sliding, SQL_WINDOW_SLIDING),
    "stream_tumbling_replay": (q_stream_tumbling_replay, SQL_WINDOW_TUMBLING),
    "pagerank_events": (q_pagerank_events, None),  # iterative fixed-point
    "multimodal_features": (q_multimodal_features, None),  # decode stubbed
}
