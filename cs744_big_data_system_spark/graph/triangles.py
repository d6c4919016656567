"""Triangle counting and degree statistics over an edge list.

Extends the graph family (SURVEY.md §2 R4 — reference only ships
PageRank, assignment1/part3/task1/task1.py) with the other canonical
graph-analytics kernels a cluster engine is expected to run.

Scale design — the degree-orientation trick: counting each triangle at
its lowest-(degree,id) vertex bounds every vertex's oriented
out-degree by O(sqrt(m)) REGARDLESS of skew (a celebrity node with 10⁸
followers receives its edges; it doesn't fan out wedges). The wedge
self-join is therefore quadratic only in the oriented out-degree, never
in the raw degree — this is what makes the plan survive a power-law
graph at 100 TB, where a naive a<b<c id-ordered join explodes on hubs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def canonical_undirected(edges: DataFrame) -> DataFrame:
    """Simple undirected edge set from a directed edge list: self-loops
    dropped, endpoints ordered (u < v), duplicates collapsed. One
    distinct shuffle keyed by the edge."""
    return (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
        )
        .distinct()
    )


def degrees(edges: DataFrame) -> DataFrame:
    """(node, degree) over the canonical undirected edge set."""
    canon = canonical_undirected(edges)
    ends = canon.select(F.col("u").alias("node")).unionAll(
        canon.select(F.col("v").alias("node"))
    )
    return ends.groupBy("node").agg(F.count(F.lit(1)).alias("degree"))


def degree_histogram(edges: DataFrame) -> DataFrame:
    """(degree, n_nodes) — the corpus-shape diagnostic for a graph
    (power-law check before choosing partitioning). Two bounded
    shuffles: degree agg, then histogram agg to at most max-degree
    rows."""
    return degrees(edges).groupBy("degree").agg(F.count(F.lit(1)).alias("n_nodes"))


def triangle_count(edges: DataFrame) -> DataFrame:
    """Exact global triangle count, degree-oriented.

    Orient every canonical edge from its lower-(degree, id) endpoint to
    the higher one; enumerate wedges at each source (pairs of oriented
    out-neighbors, ordered by the same total order) and close them with
    a semi-join back onto the oriented edge set. Each triangle is
    counted exactly once, at its minimum-(degree, id) vertex.

    Returns one row: (n_nodes, n_edges, n_triangles).

    The canonical edge set feeds four subplans (degrees, orientation,
    both wedge sides); it is NOT persisted — all four land in ONE final
    plan, so ReuseExchange computes the distinct once at runtime while
    the lazy return stays composable (never persist inside a
    lazily-returned operator — unreleasable cache).
    """
    canon = canonical_undirected(edges)
    ends = canon.select(F.col("u").alias("node")).unionAll(
        canon.select(F.col("v").alias("node"))
    )
    deg = ends.groupBy("node").agg(F.count(F.lit(1)).alias("degree"))
    # Attach endpoint degrees; deg has one row per node — broadcast
    # below cluster thresholds, plain shuffle join above (Spark/AQE
    # decides; we don't force it because deg is O(nodes)).
    with_deg = (
        canon.join(deg.withColumnRenamed("node", "u").withColumnRenamed("degree", "du"), "u")
        .join(deg.withColumnRenamed("node", "v").withColumnRenamed("degree", "dv"), "v")
    )
    lo_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = with_deg.select(
        F.when(lo_first, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(lo_first, F.col("v")).otherwise(F.col("u")).alias("b"),
        F.when(lo_first, F.col("dv")).otherwise(F.col("du")).alias("db"),
    )
    x, y = oriented.alias("x"), oriented.alias("y")
    wedges = x.join(
        y,
        (F.col("x.a") == F.col("y.a"))
        & (
            (F.col("x.db") < F.col("y.db"))
            | ((F.col("x.db") == F.col("y.db")) & (F.col("x.b") < F.col("y.b")))
        ),
    ).select(F.col("x.b").alias("wa"), F.col("y.b").alias("wb"))
    closed = wedges.join(
        oriented.select(F.col("a").alias("wa"), F.col("b").alias("wb")),
        ["wa", "wb"],
        "left_semi",
    )
    n_tri = closed.agg(F.count(F.lit(1)).alias("n_triangles"))
    n_edges = canon.agg(F.count(F.lit(1)).alias("n_edges"))
    n_nodes = deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    return n_nodes.crossJoin(n_edges).crossJoin(n_tri)
