"""Lloyd's k-means as PURE relational algebra — the oracle-checkable
sibling of ml/kmeans.py (which runs the same algorithm through the
Arrow/numpy superstep for throughput).

Why a second k-means: the superstep version is the performance path
but its float accumulation is engine-private, so its driver-gate check
is rows-only. This version pins every nondeterminism source —
training-free init (first-k by id, the IVF/PQ convention), distances
rounded to 6 dp with centroid-ordinal tie-break, per-dimension means
rounded to 9 dp (so double summation-order noise at ~1e-15 can never
leak into the next assignment), empty clusters retaining their
previous centroid — making the WHOLE 3-iteration Lloyd loop a pure
function of the data, hash-checked against an unrolled-CTE DuckDB
oracle (the 4th hash-verified iterative kernel, after BFS, SSSP and
label propagation).

Scale shape per iteration: one broadcast of k centroids, one
assignment window keyed on vec_id, one posexplode + (code, dim)
groupBy for the means (map-side combinable; k·dim groups). The corpus
never self-joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kmeans_relational(
    embeddings: DataFrame,
    k: int = 8,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cluster) after ``iterations`` Lloyd steps from the first-k
    init — deterministic and oracle-reproducible by construction.

    Centroids live ON THE DRIVER between supersteps (k·dim doubles —
    bounded and corpus-independent, the same legitimate driver-side
    regime as PCA's dim² covariance collect and MLlib's own k-means).
    Each iteration is one Spark job: assignment (broadcast of the
    k-row literal centroid table) + the (code, dim) means groupBy,
    collected as ≤ k·dim rows. This replaces the previous per-
    iteration ``localCheckpoint(eager=True)`` lineage cut: values are
    identical (collect/createDataFrame round-trips IEEE doubles
    exactly), but no corpus-independent state ever touches the block
    manager, so long bench sessions carry no checkpoint-block backlog
    and the consumer's plan is flat (scan → broadcast join → agg)."""
    spark = embeddings.sparkSession
    v = embeddings.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v")
    )
    # first-k init: a bounded k-row collect (ordered by id, like the
    # IVF/PQ convention)
    init = v.orderBy(F.col(id_col).asc()).limit(k).collect()
    cent: dict[int, list[float]] = {
        i: list(r["_v"]) for i, r in enumerate(init)
    }

    def cent_df() -> DataFrame:
        return spark.createDataFrame(
            [(code, emb) for code, emb in sorted(cent.items())],
            "code int, emb array<double>",
        )

    def assign(c: DataFrame) -> DataFrame:
        diffs = F.zip_with("_v", "emb", lambda x, y: (x - y) * (x - y))
        d = F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)
        scored = v.crossJoin(F.broadcast(c)).select(
            id_col, "code", F.round(d, 6).alias("_d")
        )
        # argmin(distance, code) as min-of-struct: identical to the
        # oracle's row_number ORDER BY (_d ASC, code ASC) pick (struct
        # comparison is lexicographic), but a map-side-combinable
        # aggregate — k partial rows per task — instead of a window
        # that shuffles and sorts the full vec×k score table.
        return scored.groupBy(id_col).agg(
            F.min(F.struct("_d", "code"))["code"].alias("code")
        )

    for _ in range(iterations):
        a = assign(cent_df())
        pts = v.join(a, id_col).select("code", F.posexplode("_v").alias("d", "val"))
        m = (
            pts.groupBy("code", "d")
            .agg(F.round(F.avg("val"), 9).alias("m"))
            .collect()  # ≤ k·dim rows — bounded, corpus-independent
        )
        upd: dict[int, dict[int, float]] = {}
        for r in m:
            upd.setdefault(r["code"], {})[r["d"]] = r["m"]
        # empty clusters keep their previous centroid (mirrored in the
        # oracle as a NOT IN union)
        cent = {
            code: (
                [upd[code][d] for d in sorted(upd[code])]
                if code in upd
                else emb
            )
            for code, emb in cent.items()
        }

    return assign(cent_df()).select(id_col, F.col("code").alias("cluster"))
