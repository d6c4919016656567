"""Distributed-aggregation supersteps — the Spark-idiomatic form of the
reference's assignment-2 collectives (SURVEY.md §2.8, §3.3).

Mapping (reference site → engine primitive):
  DistributedSampler shards      (part2a/main.py:133) → shard()
  gather → rank-0 mean → scatter (part2a/main.py:57-72) → treeAggregate + broadcast
  all_reduce(SUM) pre-scaled     (part2b/main.py:47-49) → treeAggregate (log-depth)
  DDP bucketed all-reduce        (part3/main.py:105)   → ONE treeAggregate over the
                                                          whole parameter vector
                                                          (batching many small
                                                          reductions into one job)

The reference measured gather-scatter 1.3857 s/iter > all-reduce 1.0231
> bucketed DDP 0.870 (group14.pdf p.3-5). The engine encodes the lesson
as an API: partials are merged with log-depth ``treeAggregate`` (never a
flat collect of per-partition results to the driver), and all parameters
travel in one aggregate (bucketing) rather than one job per tensor.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shard(df: DataFrame, num_shards: int, seed: int = 14) -> DataFrame:
    """Disjoint pseudo-random shards, deterministic under ``seed`` —
    the DistributedSampler analogue. Adds ``shard_id`` ∈ [0, n)."""
    return df.withColumn(
        "shard_id", F.pmod(F.hash(F.rand(seed=seed)), F.lit(num_shards))
    )


def synchronized_superstep(
    df: DataFrame,
    local_fn: Callable,
    merge_fn: Callable[[Any, Any], Any],
    zero: Any,
    depth: int = 2,
):
    """One BSP superstep: per-partition partials (local compute) merged
    via log-depth treeAggregate; the caller broadcasts the merged value
    for the next superstep (sc.broadcast) — gather/scatter without the
    rank-0 bottleneck.

    ``local_fn(iterator) -> partial`` runs once per partition;
    ``merge_fn(a, b) -> partial`` must be associative+commutative.
    """
    # Accept a DataFrame or a pre-converted (possibly cached) RDD —
    # iterative callers cache post-conversion so the JVM→Python row
    # conversion is paid once, not per superstep (ml/linear_sgd.py).
    src = df.rdd if hasattr(df, "rdd") else df
    rdd = src.mapPartitions(lambda it: [local_fn(it)])
    return rdd.treeAggregate(zero, merge_fn, merge_fn, depth=depth)


def arrow_superstep(df: DataFrame, local_fn: Callable, merge_fn, zero, depth: int = 2):
    """One BSP superstep with Arrow transport: ``local_fn(batches) ->
    partial`` consumes the partition's ``pyarrow.RecordBatch`` iterator;
    partials travel back as single pickled rows merged via log-depth
    ``treeAggregate``.

    Versus the Row-RDD path (synchronized_superstep over df.rdd): the
    JVM→Python cost per superstep is the columnar Arrow stream — it
    scales with BYTES, not with per-row pickling — so iterative callers
    cache the input DataFrame JVM-side (columnar, compressed) and
    re-stream it each epoch instead of materializing a Python-object
    copy of the dataset in executor memory. At 100 TB that is the
    difference between caching the corpus once in Tungsten format and
    holding a second, several-×-larger pickled copy in every Python
    worker.
    """
    import pickle

    import pyarrow as pa

    def per_partition(batches):
        payload = pickle.dumps(local_fn(batches))
        yield pa.RecordBatch.from_arrays(
            [pa.array([payload], type=pa.binary())], names=["partial"]
        )

    partials = df.mapInArrow(per_partition, "partial binary")
    return (
        partials.rdd.map(lambda r: pickle.loads(bytes(r[0])))
        .treeAggregate(zero, merge_fn, merge_fn, depth=depth)
    )


def list_matrix(arr) -> "Any":
    """(n, dim) float64 matrix from an Arrow list<float> array —
    one vectorized copy off the Arrow buffer (no per-row Python)."""
    import numpy as np

    flat = np.asarray(arr.flatten(), dtype=np.float64)
    return flat.reshape(len(arr), -1) if len(arr) else flat.reshape(0, 0)


def distributed_vector_mean(
    embeddings: DataFrame, vec_col: str = "embedding", group_col: str | None = None
) -> DataFrame:
    """Element-wise mean of an array column — the gradient-averaging
    superstep (A3/A4) as ONE declarative aggregation: posexplode →
    partial avg per (group, pos) → reassemble. Spark's partial+final
    HashAggregate IS the map-side-combine + all-reduce pattern; no
    driver materialization at any width.
    """
    keys = [group_col] if group_col else []
    exploded = embeddings.select(
        *keys, F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos", "x")
    )
    per_pos = exploded.groupBy(*keys, "pos").agg(F.avg("x").alias("mean_x"))
    return (
        per_pos.groupBy(*keys)
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "mean_x"))
            ).alias("_pairs")
        )
        .select(
            *keys,
            F.transform("_pairs", lambda p: p.mean_x).alias("mean_vec"),
        )
    )
