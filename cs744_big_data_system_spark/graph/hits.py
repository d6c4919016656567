"""HITS (hubs & authorities) as DataFrame ops — the second classic
link-analysis kernel beside PageRank (graph/pagerank.py), with the
max-normalized update that keeps every iteration oracle-mirrorable:

    auth(v) = ( Σ_u  hub(u)·w(u,v) )  / max_v auth_raw
    hub(u)  = ( Σ_v  auth(v)·w(u,v) ) / max_u hub_raw

max-normalization (not L2) is deliberate: max() is accumulation-order
independent, so the only float noise is the per-node contribution sum
— ~1e-16 on a small-node-set graph against the 1e-6 output rounding
bucket, the same determinism argument as the PageRank oracle
(workloads/streaming_graph._sql_pagerank_events).

Scale shape: identical to PageRank's superstep — the weighted collapsed
edge table is built once and cached; each iteration is two
(edge ⋈ score → groupBy-sum) passes plus a broadcast 1-row max; score
vectors are |V|-sized, never edge-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hits(
    edges: DataFrame,
    iterations: int = 5,
) -> DataFrame:
    """edges(src, dst) → (node, auth, hub), max-normalized per round.

    Duplicate edges carry weight (collapsed to a count column once, so
    the per-superstep joins run on the distinct-edge relation).
    """
    w = (
        edges.select("src", "dst")
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
        .persist()
    )
    nodes = (
        w.select(F.col("src").alias("node"))
        .unionByName(w.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    auth = nodes.select("node", F.lit(1.0).alias("auth"))
    hub = nodes.select("node", F.lit(1.0).alias("hub"))

    # Normalization needs the raw vector AND its max. Consuming the
    # raw plan twice (agg-then-crossJoin) doubles the lineage every
    # half-round — 2^rounds recompute (measured: 5 rounds = 130 s on a
    # 5-node graph). Instead the max rides a single-partition window
    # over the |V|-row SCORE VECTOR (never the edges), so each round
    # is one linear plan; a periodic eager localCheckpoint bounds
    # Catalyst re-analysis depth. For |V| too large for one partition,
    # swap the window for checkpoint + 1-row agg + broadcast — the
    # score vector is the only thing this touches either way.
    from pyspark.sql import Window

    whole = Window.partitionBy(F.lit(1))
    for i in range(1, iterations + 1):
        auth_raw = (
            w.join(hub.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("hub") * F.col("w")).alias("raw"))
        )
        # nodes with no in-edges keep score 0 (join back to the node set)
        auth_raw = nodes.join(auth_raw, "node", "left").select(
            "node", F.coalesce("raw", F.lit(0.0)).alias("raw")
        )
        auth = auth_raw.select(
            "node", (F.col("raw") / F.max("raw").over(whole)).alias("auth")
        )
        hub_raw = (
            w.join(auth.withColumnRenamed("node", "dst"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum(F.col("auth") * F.col("w")).alias("raw"))
        )
        hub_raw = nodes.join(hub_raw, "node", "left").select(
            "node", F.coalesce("raw", F.lit(0.0)).alias("raw")
        )
        hub = hub_raw.select(
            "node", (F.col("raw") / F.max("raw").over(whole)).alias("hub")
        )
        if i % 2 == 0 and i < iterations:
            hub = hub.localCheckpoint(eager=True)

    out = auth.join(hub, "node")
    out.cached_links = w  # caller may unpersist
    return out
