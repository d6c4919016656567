"""Skew-stress fixture for the EMBEDDING side (VERDICT r07 item 7).

tests/test_skew_stress.py covers the text dedup family's hot-key
posture; this file plants the vector-side analogues and asserts the
documented bounds on the heaviest task:

* LSH bands (embedding_cosine_neardup_lsh / lsh_band_buckets_udf): the
  vector analogue of "boilerplate-sharing but dissimilar" is a hot
  TRAIT — many vectors sharing a common base direction (~20% of their
  energy) while pairwise-dissimilar in the rest. Sign-pattern band
  keys hash the WHOLE vector, so the hot-trait family must spread
  across buckets instead of collapsing into one (band, bucket) key;
  planted true near-dups must still collide (recall).
* IVF (cosine_topk_ivf): one cell at ~100x the median membership. The
  candidate set stays CELL-bounded (a hot-cell query never scans the
  corpus), and the probe join broadcasts the query side, so the
  corpus is never hash-partitioned by the skewed centroid_id key —
  the hot cell cannot concentrate into one shuffle task.
* SemDeDup (semantic_dedup): one k-means cell holding ~100x the
  median membership. The per-cell gram kernel receives c rows (one
  exchange keyed by cluster — c*d doubles), never materializes the
  c^2 pair rows in the shuffle, and its verdicts on the hot cell are
  exactly the dense-family truth (every member but the lowest id
  pruned against an earlier mate at cosine >= threshold).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

DIM = 64  # the workload family's production dim (llm.py lsh config)
HOT = 500  # vectors sharing the hot trait / hot cell
COLD = 60


def _unit(v: np.ndarray) -> np.ndarray:
    return v / np.linalg.norm(v)


def _det_noise(seed: int, dim: int = DIM) -> np.ndarray:
    """Deterministic pseudo-random direction (md5-seeded, like the
    engine's own deterministic families — no RNG state in tests).
    One md5 block per 4 components so every dim is independent."""
    import hashlib

    h = b"".join(
        hashlib.md5(f"vecskew_{seed}_{blk}".encode()).digest()
        for blk in range((dim * 4 + 15) // 16)
    )
    raw = np.frombuffer(h[: dim * 4], dtype=np.uint32).astype(np.float64)
    return _unit(raw / 2**32 - 0.5)


@pytest.fixture(scope="module")
def hot_trait_vectors(spark):
    """HOT vectors = shared base direction carrying ~10% of the energy
    + a unique direction for the rest (pairwise cosine ~0.1 — a real
    shared trait vs the cold set's ~0.0, but well under any near-dup
    threshold); COLD fully unique; plus one planted TRUE near-dup
    family of 8 (pairwise cosine >= 0.99)."""
    base = _det_noise(10**6)
    rows = []
    for i in range(HOT):
        v = _unit(np.sqrt(0.1) * base + np.sqrt(0.9) * _det_noise(i))
        rows.append((100 + i, [float(x) for x in v]))
    for i in range(COLD):
        rows.append((10_000 + i, [float(x) for x in _det_noise(10_000 + i)]))
    dup = _det_noise(5 * 10**5)
    for j in range(8):
        v = _unit(dup + 0.05 * _det_noise(7 * 10**5 + j))
        rows.append((20_000 + j, [float(x) for x in v]))
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    ).localCheckpoint(eager=True)


def test_lsh_bands_spread_hot_trait(hot_trait_vectors):
    """A 500-vector hot-trait family must not collapse into one
    (band, bucket) key: max bucket stays an order of magnitude under
    the family size and total candidate-pair work stays a small
    fraction of all-pairs."""
    from cs744_big_data_system_spark.operators.similarity import lsh_band_buckets_udf

    buckets = lsh_band_buckets_udf(DIM, num_bands=8, planes_per_band=10)
    entries = hot_trait_vectors.select(
        "vec_id",
        F.posexplode(buckets(F.col("embedding"))).alias("band_idx", "bucket"),
    )
    stats = (
        entries.groupBy("band_idx", "bucket")
        .agg(F.count(F.lit(1)).alias("sz"))
        .agg(
            F.max("sz").alias("max_bucket"),
            F.sum(F.col("sz") * (F.col("sz") - 1) / 2).alias("cand_pairs"),
        )
        .collect()[0]
    )
    all_pairs = (HOT + COLD + 8) * (HOT + COLD + 7) / 2
    assert stats.max_bucket <= HOT / 5, stats
    assert stats.cand_pairs <= 0.10 * all_pairs, (stats, all_pairs)


def test_lsh_neardup_recall_and_bounded_output(hot_trait_vectors):
    """The banded path still finds the planted true near-dup family
    (recall) while the hot-trait family contributes no pairs at the
    0.9 threshold (bounded verified output)."""
    from cs744_big_data_system_spark.operators.dedup import (
        embedding_cosine_neardup_lsh,
    )

    pairs = embedding_cosine_neardup_lsh(
        hot_trait_vectors, dim=DIM, threshold=0.9, num_bands=8, planes_per_band=10
    ).collect()
    dup_ids = set(range(20_000, 20_008))
    got_dup = {(r.vec_a, r.vec_b) for r in pairs if r.vec_a in dup_ids}
    # all 28 family pairs sit at cosine ~0.998 — band recall there is ~1.0
    assert len(got_dup) >= 26, len(got_dup)
    hot_pairs = [r for r in pairs if r.vec_a < 10_000 and r.vec_b < 10_000]
    assert not hot_pairs, hot_pairs[:5]


@pytest.fixture(scope="module")
def hot_cell_corpus(spark):
    """IVF/SemDeDup fixture: ids 0..7 are 8 far-apart anchor directions
    (the deterministic first-k centroids); a 500-vector family sits
    within ~2 degrees of anchor 0 (one cell at ~100x the median), and
    7 small 3-vector groups sit near anchors 1..7."""
    anchors = [_det_noise(3 * 10**6 + a) for a in range(8)]
    rows = [(a, [float(x) for x in anchors[a]]) for a in range(8)]
    for i in range(HOT):
        v = _unit(anchors[0] + 0.04 * _det_noise(4 * 10**6 + i))
        rows.append((100 + i, [float(x) for x in v]))
    for a in range(1, 8):
        for j in range(3):
            v = _unit(anchors[a] + 0.04 * _det_noise(5 * 10**6 + a * 10 + j))
            rows.append((10_000 + a * 10 + j, [float(x) for x in v]))
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    ).localCheckpoint(eager=True)


def test_ivf_hot_cell_candidates_stay_cell_bounded(spark, hot_cell_corpus):
    """A query probing the hot cell sees ONLY that cell's members as
    candidates (cell-bounded cost, ~100x median but << corpus on a
    real k sizing), and a cold-cell query's candidate set is its own
    small cell — skew in one cell never leaks into another's probe."""
    from cs744_big_data_system_spark.operators.similarity import (
        cosine_topk_ivf,
        ivf_assign,
    )

    queries = hot_cell_corpus.filter(
        F.col("vec_id").isin(100, 10_011)  # one hot-cell, one cold-cell member
    )
    topk = cosine_topk_ivf(
        queries, hot_cell_corpus, num_centroids=8, k=600, id_col="vec_id"
    )
    # with k larger than any cell, the returned rows ARE the candidate
    # set — assert its size equals the probed cell's membership
    by_q = {
        r.query_id: r.n
        for r in topk.groupBy("query_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    centroids = (
        hot_cell_corpus.orderBy("vec_id")
        .limit(8)
        .select(F.col("vec_id").alias("centroid_id"), "embedding")
    )
    cell_sizes = {
        r.centroid_id: r.n
        for r in ivf_assign(hot_cell_corpus, centroids, "vec_id")
        .groupBy("centroid_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert max(cell_sizes.values()) >= 100 * sorted(cell_sizes.values())[4], cell_sizes
    assert by_q[100] == max(cell_sizes.values()) - 1, (by_q, cell_sizes)
    assert by_q[10_011] <= sorted(cell_sizes.values())[-2], (by_q, cell_sizes)


def test_ivf_probe_join_broadcasts_queries_not_corpus(spark, hot_cell_corpus):
    """The probe join must broadcast the QUERY side: the corpus is
    never hash-partitioned by centroid_id, so a hot cell cannot
    concentrate into a single shuffle task."""
    from cs744_big_data_system_spark.operators.similarity import cosine_topk_ivf
    from cs744_big_data_system_spark.plans.explain import formatted_plan

    queries = hot_cell_corpus.filter(F.col("vec_id") == 100)
    plan = formatted_plan(
        cosine_topk_ivf(queries, hot_cell_corpus, num_centroids=8, k=5)
    )
    assert "BroadcastHashJoin" in plan, plan
    assert "hashpartitioning(centroid_id" not in plan, plan


def test_semantic_dedup_hot_cell_kernel(spark, hot_cell_corpus):
    """SemDeDup on a corpus whose densest k-means cell holds ~100x the
    median: the per-cell BLAS kernel must handle the 500-member cell in
    one task and return the dense-family truth — every hot-family
    member except the cell's lowest id pruned against an EARLIER mate
    at cosine >= threshold."""
    from cs744_big_data_system_spark.operators.dedup import semantic_dedup

    out = semantic_dedup(
        hot_cell_corpus, k=8, iterations=2, threshold=0.9
    ).collect()
    hot_ids = {0} | set(range(100, 100 + HOT))
    pruned_hot = [r for r in out if r.vec_id in hot_ids]
    # the whole hot family (minus the anchor, id 0) is pruned
    assert len(pruned_hot) == HOT, len(pruned_hot)
    for r in pruned_hot:
        assert r.dup_of < r.vec_id, r
        assert r.dup_of in hot_ids, r
        assert r.cosine >= 0.9, r


def test_semantic_dedup_shuffles_cells_not_pairs(spark, hot_cell_corpus):
    """The only exchange feeding the prune kernel is keyed by cluster
    (c*d doubles per cell); no pair-level (c^2) relation exists in the
    plan — the skew cost of a hot cell is one task's BLAS gram, not a
    quadratic shuffle."""
    from cs744_big_data_system_spark.operators.dedup import semantic_dedup
    from cs744_big_data_system_spark.plans.explain import formatted_plan

    plan = formatted_plan(
        semantic_dedup(hot_cell_corpus, k=8, iterations=2, threshold=0.9)
    )
    assert "FlatMapGroupsInPandas" in plan, plan
    assert "hashpartitioning(cluster" in plan, plan
    # no self-join of the vector table downstream of the assignment:
    # the kernel input is ONE sorted group per cell (the formatted plan
    # prints each node twice — tree line "Name (n)" + detail section —
    # so count the tree form)
    import re

    assert len(re.findall(r"FlatMapGroupsInPandas \(\d+\)", plan)) == 1, plan
