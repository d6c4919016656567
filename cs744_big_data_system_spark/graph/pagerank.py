"""PageRank with the reference's exact semantics, re-expressed as
DataFrame ops (reference: assignment1/part3/task1/task1.py — RDD
groupByKey/join/flatMap/reduceByKey with Python lambdas).

Semantics preserved for parity (SURVEY.md §2.3):
  * init rank 1.0 for every node WITH outgoing edges (task1.py:37 —
    ranks derive from the adjacency keys);
  * update: rank = 0.15 + 0.85 · Σ incoming contributions (task1.py:52);
  * the inner join drops nodes that appear only as destinations, and
    dangling mass is discarded, not redistributed (task1.py:44-47,51);
  * node ids stay strings (task1.py:29-30).

Spark-first differences from the reference (the idiomatic wins,
SURVEY.md §3.2):
  * no adjacency-array materialization: keep the edge table + an
    out-degree table. contributions = edges ⋈ ranks ⋈ degree — at
    100 TB, shipping an `array<string>` of neighbors through every
    shuffle is strictly worse than keeping edges columnar;
  * everything stays JVM-side (no Python worker per lambda);
  * the iterative driver loop localCheckpoints every
    ``checkpoint_every`` iterations to truncate the growing plan
    (Catalyst re-analysis cost is superlinear in iterations otherwise);
  * edges/degree are cached once and reused by all supersteps —
    the task3.py:37 lesson, applied by default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iterations: int = 10,
    damping: float = 0.85,
    num_partitions: int | None = None,
    cache_links: bool = True,
    checkpoint_every: int = 3,
    broadcast_ranks: bool = False,
) -> DataFrame:
    """edges(src: string, dst: string) → (node: string, rank: double).

    ``num_partitions`` mirrors the reference's partition-sweep knob
    (task2.py:36); None lets AQE pick. ``broadcast_ranks`` joins each
    superstep's rank vector as a broadcast — the right call when the
    node set is far smaller than the edge set (the cached links table
    then never re-shuffles); leave False when ranks won't fit an
    executor. In that regime, set ``num_partitions`` to the session's
    shuffle-partition count so the cached links' hash partitioning
    satisfies the per-superstep join requirement — links then never
    re-shuffles either (plan-asserted in tests/test_plans.py).

    The returned DataFrame carries a ``cached_links`` attribute (the
    persisted links table, or None) so callers that materialize the
    ranks can release the cache: ``ranks.cached_links.unpersist()``.
    """
    edges = edges.select("src", "dst")

    # Duplicate edges contribute multiply in the reference (flatMap
    # over the full neighbor multiset). Collapsing parallel edges to a
    # weight preserves that exactly — contribution of an (src, dst)
    # pair with multiplicity m is m·rank/out_degree — and shrinks the
    # per-iteration join input from |edges| to |distinct pairs|, which
    # at web scale is the difference between shuffling the raw edge
    # list 10× and shuffling a weighted adjacency once.
    links = edges.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n_para"))
    degree = links.groupBy("src").agg(F.sum("n_para").alias("out_degree"))
    links = links.join(degree, "src")  # (src, dst, n_para, out_degree)
    if num_partitions:
        links = links.repartition(num_partitions, "src")
    if cache_links:
        links = links.persist()

    ranks = degree.select(F.col("src").alias("node"), F.lit(1.0).alias("rank"))

    for i in range(iterations):
        rank_side = F.broadcast(ranks) if broadcast_ranks else ranks
        contribs = (
            links.join(rank_side, links.src == rank_side.node, "inner")
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") * F.col("n_para") / F.col("out_degree")).alias("contrib"),
            )
        )
        new_ranks = (
            contribs.groupBy("node")
            .agg((F.lit(1.0 - damping) + F.lit(damping) * F.sum("contrib")).alias("rank"))
        )
        # Reference parity: ranks only exist for nodes in the adjacency
        # (inner join keyed on source). Destination-only nodes gain a
        # rank entry in the reference's reduceByKey output too — they
        # receive contributions — so new_ranks matches task1.py:52.
        ranks = new_ranks
        if checkpoint_every and (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            ranks = ranks.localCheckpoint(eager=False)

    # links must stay persisted — the returned DataFrame is lazy and
    # its plan references links once per superstep; unpersisting here
    # would make the caller's first action recompute the edge scan 10×.
    # Expose it so long-lived sessions can release the cache after
    # materializing: `ranks.cached_links.unpersist()` (None when
    # cache_links=False). DataFrames are plain Python objects, so the
    # attribute rides along without touching the plan.
    ranks.cached_links = links if cache_links else None
    return ranks


def personalized_pagerank(
    edges: DataFrame,
    seeds: list[str],
    iterations: int = 8,
    damping: float = 0.85,
    num_partitions: int | None = None,
    checkpoint_every: int = 3,
) -> DataFrame:
    """Personalized PageRank: the restart mass goes to ``seeds`` only,
    so ranks measure proximity to the seed set — the web-curation
    primitive (rank crawl domains from trusted seeds) that plain
    PageRank's uniform restart can't express.

    Recurrence (kept verbatim in the unrolled-CTE oracle):
        r_0(v)     = 1.0 if v ∈ seeds else 0.0
        r_{i+1}(v) = (1-d)·1[v ∈ seeds] + d·Σ_{u→v} r_i(u)·m(u,v)/deg(u)

    Unlike ``pagerank`` (reference-parity semantics: ranks only for
    contribution receivers), the full node vector is carried so
    unreachable nodes report an explicit 0.0 — at scale the node table
    is the same cardinality PageRank already shuffles per superstep.
    Parallel edges collapse to weights exactly as in ``pagerank``.
    """
    edges = edges.select("src", "dst")
    links = edges.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n_para"))
    degree = links.groupBy("src").agg(F.sum("n_para").alias("out_degree"))
    links = links.join(degree, "src")
    if num_partitions:
        links = links.repartition(num_partitions, "src")
    links = links.persist()

    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    seed_ind = F.when(F.col("node").isin(*seeds), F.lit(1.0)).otherwise(F.lit(0.0))
    ranks = nodes.select("node", seed_ind.alias("rank"))

    for i in range(iterations):
        contribs = (
            links.join(ranks, links.src == ranks.node)
            .select(
                F.col("dst").alias("cnode"),
                (F.col("rank") * F.col("n_para") / F.col("out_degree")).alias(
                    "contrib"
                ),
            )
            .groupBy("cnode")
            .agg(F.sum("contrib").alias("c"))
        )
        ranks = (
            nodes.join(contribs, nodes.node == contribs.cnode, "left")
            .select(
                "node",
                (
                    F.lit(1.0 - damping) * seed_ind
                    + F.lit(damping) * F.coalesce(F.col("c"), F.lit(0.0))
                ).alias("rank"),
            )
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            ranks = ranks.localCheckpoint(eager=False)

    ranks.cached_links = links  # caller releases (see pagerank)
    ranks.cached_nodes = nodes
    return ranks
