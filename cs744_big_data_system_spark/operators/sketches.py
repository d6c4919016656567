"""Mergeable frequency sketches — count-min over a key column.

Count-min (Cormode & Muthukrishnan 2005) as pure relational math: the
sketch IS a tiny (depth × width)-row table of bucket counts, built with
one map-side-combinable groupBy whose output size is d·w rows no matter
how many input rows flow in — the property that makes it the right
heavy-hitter primitive at 100 TB:

  * mergeable: two sketches (shards, time grains, streams) union+sum to
    the sketch of the union — same algebra as the HLL rollup in
    workloads/warehouse.q_hll_rollup;
  * bounded state: d·w counters regardless of key cardinality, vs the
    exact groupBy whose state is O(|distinct keys|);
  * one-sided error: estimates only ever OVERcount (est ≥ true;
    est ≤ true + εN with prob 1−δ for w = e/ε, d = ln 1/δ).

Hashes are md5-derived (operators/dedup.md5_int60) so every bucket —
and therefore every estimate — is deterministic and reproducible in the
DuckDB oracle, like the MinHash/simhash families.

Reference anchor: the reference's closest primitive is the exact
reduceByKey wordcount (assignment1/part3/task1/task1.py:34,52); the
sketch replaces its unbounded per-key state with fixed-size counters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cs744_big_data_system_spark.operators.dedup import md5_int60


def _bucket(key_col, j: int, width: int) -> "F.Column":
    """Row-j hash bucket of a key: md5-derived 60-bit hash of the
    salted key, mod width. pmod (not %) so the bucket is non-negative
    on both engines."""
    return F.pmod(md5_int60(F.concat(F.lit(f"cms:{j}:"), key_col)), F.lit(width))


def count_min_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Build the sketch: (j, bucket, cnt) — d·w rows max.

    One explode (d rows per input row, map-side) and one groupBy whose
    key space is d·w — partial aggregation collapses each task's
    contribution to ≤ d·w rows before the shuffle, so the exchange
    moves sketch-sized data, not input-sized data. Merging sketches =
    UNION ALL + re-groupBy-sum on the same (j, bucket) key.
    """
    rows = df.select(
        F.posexplode(
            F.array(*[_bucket(F.col(key_col), j, width) for j in range(depth)])
        ).alias("j", "bucket")
    )
    return rows.groupBy("j", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def count_min_estimate(
    keys: DataFrame,
    sketch: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point estimates for a key set: est = min over the d rows of the
    key's bucket count. The sketch side is broadcast (≤ d·w rows by
    construction); each key costs d lookups via one equi-join on
    (j, bucket) + a min-groupBy — no shuffle of the key set beyond its
    own aggregation."""
    probes = keys.select(
        key_col,
        F.posexplode(
            F.array(*[_bucket(F.col(key_col), j, width) for j in range(depth)])
        ).alias("j", "bucket"),
    )
    return (
        probes.join(F.broadcast(sketch), ["j", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est"))
    )


def cms_heavy_hitters(
    df: DataFrame,
    key_col: str,
    k: int = 20,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Top-k keys by count-min estimate, with the exact count alongside
    so the one-sided error (est ≥ true) is visible in the result.

    The candidate set here is the exact distinct-key list (fine when
    keys fit a shuffle); in a true streaming deployment the candidates
    would be the keys retained by a space-saving pass — the sketch
    itself is the piece whose state is bounded. Ordering is
    (est desc, key asc): fully deterministic because every estimate is
    an exact integer over md5 buckets.
    """
    sketch = count_min_build(df, key_col, depth, width)
    truth = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("true_cnt"))
    est = count_min_estimate(truth.select(key_col), sketch, key_col, depth, width)
    return (
        est.join(truth, key_col)
        .orderBy(F.col("est").desc(), F.col(key_col).asc())
        .limit(k)
        .select(key_col, "est", "true_cnt")
    )


#: 2^60 — the KMV hash space size (md5_int60 values are uniform in
#: [0, 2^60)); one double constant shared with the oracle.
_KMV_SPACE = float(1 << 60)


def kmv_distinct(
    df: DataFrame,
    key_col: str,
    group_col: str,
    k: int = 32,
) -> DataFrame:
    """Distinct-count estimate per group via the K-minimum-values
    sketch (Bar-Yossef et al. 2002; the theta-sketch core): keep the k
    smallest 60-bit hashes of the key; if the k-th smallest is m then
    the keys are ~uniform in [0, m], so n̂ = (k−1)·2^60/m. Exact when a
    group has < k distinct keys (the sketch IS the key set).

    Like the count-min build, the sketch is bounded state (k hashes per
    group, vs O(distinct) for exact count-distinct) and mergeable: the
    k smallest of a union are among the union of each side's k
    smallest — union + re-take-k, same shape as the HLL rollup. And
    like count-min, md5 hashing makes every estimate deterministic, so
    the workload entry is hash-checked against the oracle (Spark's own
    approx_count_distinct is engine-specific and can't be).

    One distinct (group, hash) shuffle + one per-group window — the
    window partitions on the group key, so no single-partition funnel.
    Output: (group, n_exact, kmv_est) with the exact count alongside to
    make the estimate's error visible, est rounded to 4 dp.
    """
    from pyspark.sql import Window

    hashes = df.select(
        F.col(group_col), md5_int60(F.col(key_col).cast("string")).alias("h")
    ).distinct()
    w = Window.partitionBy(group_col).orderBy(F.col("h").asc())
    topk = hashes.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= k)
    sk = topk.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("_n_kept"), F.max("h").alias("_kth")
    )
    exact = df.groupBy(group_col).agg(
        F.countDistinct(key_col).alias("n_exact")
    )
    est = F.when(F.col("_n_kept") < k, F.col("_n_kept").cast("double")).otherwise(
        (k - 1) * F.lit(_KMV_SPACE) / F.col("_kth")
    )
    return (
        sk.join(exact, group_col)
        .select(group_col, "n_exact", F.round(est, 4).alias("kmv_est"))
    )


def kmv_jaccard(
    df: DataFrame,
    key_col: str,
    group_col: str,
    k: int = 32,
) -> DataFrame:
    """Pairwise Jaccard similarity between groups' key sets estimated
    from KMV sketches — the theta-sketch set-algebra trick: for a pair
    (a, b), take the k smallest hashes of A ∪ B (which are among the
    union of each side's k smallest — the same mergeability the
    rollup uses), and the fraction of them present in BOTH sketches
    estimates |A∩B| / |A∪B|.

    Output: (g1, g2, j_exact, j_est) for every unordered group pair,
    exact alongside the estimate so the error is visible. md5 hashing
    makes the estimate deterministic, so the workload entry is
    hash-checked — a set-similarity capability exact COUNT(DISTINCT)
    algebra cannot provide at sketch cost: per group the state is k
    hashes, however many keys the group has.

    One distinct (group, hash) shuffle + per-group top-k windows; the
    pair fan-out is |groups|² rows of k hashes — groups are categories
    (event types, domains), so this is catalog-sized, never data-sized.
    """
    from pyspark.sql import Window

    s = df.select(
        F.col(group_col).alias("g"),
        md5_int60(F.col(key_col).cast("string")).alias("h"),
    ).distinct()
    w = Window.partitionBy("g").orderBy(F.col("h").asc())
    topk = (
        s.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("g", "h")
        .persist()
    )
    pairs = (
        topk.select(F.col("g").alias("g1"))
        .distinct()
        .join(topk.select(F.col("g").alias("g2")).distinct())
        .filter(F.col("g1") < F.col("g2"))
    )
    cand = (
        pairs.join(topk.withColumnRenamed("g", "g1"), "g1")
        .select("g1", "g2", "h", F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
        .unionByName(
            pairs.join(topk.withColumnRenamed("g", "g2"), "g2")
            .select("g1", "g2", "h", F.lit(0).alias("in_a"), F.lit(1).alias("in_b"))
        )
        .groupBy("g1", "g2", "h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    wk = Window.partitionBy("g1", "g2").orderBy(F.col("h").asc())
    kept = cand.withColumn("_rn", F.row_number().over(wk)).filter(F.col("_rn") <= k)
    est = kept.groupBy("g1", "g2").agg(
        F.round(
            F.sum((F.col("in_a") * F.col("in_b")).cast("double")) / F.count(F.lit(1)),
            6,
        ).alias("j_est")
    )
    # exact Jaccard for the error column
    keys = df.select(F.col(group_col).alias("g"), F.col(key_col).alias("x")).distinct()
    sizes = keys.groupBy("g").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        keys.withColumnRenamed("g", "g1")
        .join(keys.withColumnRenamed("g", "g2"), "x")
        .filter(F.col("g1") < F.col("g2"))
        .groupBy("g1", "g2")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    exact = (
        est.select("g1", "g2")
        .join(F.broadcast(sizes.select(F.col("g").alias("g1"), F.col("n").alias("n1"))), "g1")
        .join(F.broadcast(sizes.select(F.col("g").alias("g2"), F.col("n").alias("n2"))), "g2")
        .join(inter, ["g1", "g2"], "left")
        .select(
            "g1",
            "g2",
            F.round(
                F.coalesce("n_inter", F.lit(0))
                / (F.col("n1") + F.col("n2") - F.coalesce("n_inter", F.lit(0))),
                6,
            ).alias("j_exact"),
        )
    )
    return (
        est.join(exact, ["g1", "g2"])
        .select("g1", "g2", "j_exact", "j_est")
        .orderBy("g1", "g2")
    )
