"""k-core decomposition by iterative peeling.

The third iterative graph kernel (with pagerank.py and
connected_components.py): repeatedly delete nodes of degree < k until
none remain; what survives is the k-core — the standard subgraph
filter before community detection or influence analysis.

Scale shape per peel round: one degree aggregation (shuffle keyed by
node) + two anti-joins keyed by the endpoints. The peeled set usually
collapses after a few rounds (degeneracy ordering removes most of the
graph in round 1 at web scale); each round's surviving edge set is
eagerly localCheckpoint'd so the lineage — and therefore the plan —
stays O(1) deep instead of O(rounds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cs744_big_data_system_spark.graph.triangles import canonical_undirected


def k_core(edges: DataFrame, k: int = 2, max_rounds: int = 30) -> DataFrame:
    """Nodes of the k-core with their within-core degree:
    (node, core_degree), core_degree >= k.

    Deterministic (pure set operations — no tie-breaking needed);
    terminates at the fixpoint or after ``max_rounds`` peels, whichever
    comes first (every real graph fixpoints long before 30 rounds —
    each round removes EVERY current sub-k node, not one).
    """
    cur = canonical_undirected(edges).localCheckpoint(eager=True)
    for _ in range(max_rounds):
        ends = cur.select(F.col("u").alias("node")).unionAll(
            cur.select(F.col("v").alias("node"))
        )
        deg = ends.groupBy("node").agg(F.count(F.lit(1)).alias("degree"))
        bad = deg.filter(F.col("degree") < k).select("node")
        if bad.isEmpty():
            return deg.select("node", F.col("degree").alias("core_degree"))
        nxt = (
            cur.join(bad.withColumnRenamed("node", "u"), "u", "left_anti")
            .join(bad.withColumnRenamed("node", "v"), "v", "left_anti")
            .select("u", "v")
            .localCheckpoint(eager=True)
        )
        cur = nxt
    # max_rounds exhausted: report the current (possibly not yet
    # fixpointed) degrees rather than looping forever.
    ends = cur.select(F.col("u").alias("node")).unionAll(
        cur.select(F.col("v").alias("node"))
    )
    return (
        ends.groupBy("node")
        .agg(F.count(F.lit(1)).alias("core_degree"))
        .filter(F.col("core_degree") >= k)
    )
