"""Similarity search: brute-force exactness vs numpy, LSH recall."""

from __future__ import annotations

import math
import random

import pytest


@pytest.fixture(scope="module")
def vectors():
    rng = random.Random(42)
    # 3 well-separated clusters in 8-d so LSH bucketing is meaningful.
    centers = [[5.0] * 8, [-5.0] * 8, [5.0, -5.0] * 4]
    rows = []
    for i in range(90):
        c = centers[i % 3]
        rows.append((i, [x + rng.gauss(0, 0.5) for x in c], i % 3))
    return rows


@pytest.fixture(scope="module")
def emb_df(spark, vectors):
    return spark.createDataFrame(vectors, ["vec_id", "embedding", "label"])


def brute_force_topk(vectors, k=3):
    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb)

    out = {}
    for qid, q, _ in vectors[:10]:
        scored = sorted(
            ((round(cos(q, v), 6), vid) for vid, v, _ in vectors if vid != qid),
            key=lambda t: (-t[0], t[1]),
        )
        out[qid] = [vid for _, vid in scored[:k]]
    return out


def test_bruteforce_matches_numpy_reference(spark, emb_df, vectors):
    from pyspark.sql import functions as F

    from cs744_big_data_system_spark.operators.similarity import cosine_topk_bruteforce

    got_df = cosine_topk_bruteforce(emb_df.filter(F.col("vec_id") < 10), emb_df, k=3)
    got: dict[int, list[int]] = {}
    for r in got_df.orderBy("query_id", "rnk").collect():
        got.setdefault(r.query_id, []).append(r.neighbor_id)
    assert got == brute_force_topk(vectors, k=3)


def test_lsh_recall_on_clusters(spark, emb_df, vectors):
    from pyspark.sql import functions as F

    from cs744_big_data_system_spark.operators.similarity import cosine_topk_lsh

    exact = brute_force_topk(vectors, k=3)
    got_df = cosine_topk_lsh(emb_df.filter(F.col("vec_id") < 10), emb_df, dim=8, k=3, num_planes=4)
    got: dict[int, list[int]] = {}
    for r in got_df.orderBy("query_id", "rnk").collect():
        got.setdefault(r.query_id, []).append(r.neighbor_id)
    hits = sum(len(set(got.get(q, [])) & set(exact[q])) for q in exact)
    total = sum(len(v) for v in exact.values())
    assert hits / total >= 0.8  # clustered data: same-cluster buckets collide


def test_lsh_bucket_deterministic(spark, emb_df):
    from cs744_big_data_system_spark.operators.similarity import lsh_bucket

    a = [r.b for r in emb_df.select(lsh_bucket("embedding", 8, 6).alias("b")).collect()]
    b = [r.b for r in emb_df.select(lsh_bucket("embedding", 8, 6).alias("b")).collect()]
    assert a == b
    assert all(0 <= x < 64 for x in a)


def test_vector_functions(spark):
    from pyspark.sql import functions as F

    from cs744_big_data_system_spark.functions.vectors import (
        cosine_similarity,
        dot,
        l2_norm,
        vec_argmax,
    )

    df = spark.createDataFrame([([3.0, 4.0], [1.0, 0.0])], ["a", "b"])
    row = df.select(
        dot("a", "b").alias("d"),
        l2_norm("a").alias("n"),
        cosine_similarity("a", "b").alias("c"),
        vec_argmax("a").alias("am"),
    ).collect()[0]
    assert row.d == pytest.approx(3.0)
    assert row.n == pytest.approx(5.0)
    assert row.c == pytest.approx(0.6)
    assert row.am == 2
    # zero vector → NULL cosine, not a crash
    z = spark.createDataFrame([([0.0, 0.0], [1.0, 0.0])], ["a", "b"])
    assert z.select(cosine_similarity("a", "b").alias("c")).collect()[0].c is None


def test_quantize_int8_roundtrip_error_bounded(spark):
    from pyspark.sql import functions as F

    from cs744_big_data_system_spark.functions.vectors import quantize_int8

    vecs = [(0, [0.5, -1.0, 0.25, 0.0]), (1, [0.0, 0.0, 0.0, 0.0])]
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"]).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )
    rows = {r.vec_id: r for r in df.select("vec_id", quantize_int8("embedding").alias("qz")).collect()}
    q0 = rows[0].qz
    assert q0.q == [64, -127, 32, 0]  # scale = 127/1.0, floor(x*127+0.5)
    assert abs(q0.scale - 127.0) < 1e-6
    # max|x| = 1.0 -> dequant error <= 0.5/scale
    for orig, q in zip([0.5, -1.0, 0.25, 0.0], q0.q):
        assert abs(q / q0.scale - orig) <= 0.5 / q0.scale + 1e-9
    assert rows[1].qz.scale == 0.0 and rows[1].qz.q == [0, 0, 0, 0]  # zero vector safe


def test_ivf_nprobe_recall_monotone(spark, emb_df, vectors):
    from pyspark.sql import functions as F

    from cs744_big_data_system_spark.operators.similarity import cosine_topk_ivf

    exact = brute_force_topk(vectors, k=3)

    def recall(nprobe):
        got_df = cosine_topk_ivf(
            emb_df.filter(F.col("vec_id") < 10), emb_df,
            num_centroids=6, k=3, nprobe=nprobe,
        )
        got: dict[int, list[int]] = {}
        for r in got_df.orderBy("query_id", "rnk").collect():
            got.setdefault(r.query_id, []).append(r.neighbor_id)
        hits = sum(len(set(got.get(q, [])) & set(exact[q])) for q in exact)
        return hits / sum(len(v) for v in exact.values())

    r1, r2 = recall(1), recall(2)
    assert r2 >= r1            # widening the probe can only add candidates
    assert r2 >= 0.8           # clustered data: 2 probes ~cover the cluster


def test_pq_encode_shape_and_range(spark, emb_df):
    from cs744_big_data_system_spark.operators.similarity import pq_codebook, pq_encode

    book = pq_codebook(emb_df, dim=8, m=4, kc=8)
    assert book.count() == 4 * 8
    codes = pq_encode(emb_df, book, dim=8, m=4)
    per_vec = codes.groupBy("vec_id").count().collect()
    assert all(r["count"] == 4 for r in per_vec) and len(per_vec) == 90
    rng = codes.agg({"code": "min"}).collect()[0][0], codes.agg({"code": "max"}).collect()[0][0]
    assert 0 <= rng[0] and rng[1] <= 7


def test_pq_recall_on_clusters(spark, emb_df, vectors):
    from pyspark.sql import functions as F

    from cs744_big_data_system_spark.operators.similarity import cosine_topk_pq

    truth = brute_force_topk(vectors, k=3)
    got_df = cosine_topk_pq(
        emb_df.filter(F.col("vec_id") < 10), emb_df, dim=8, m=4, kc=8,
        n_candidates=20, k=3,
    )
    got: dict[int, list[int]] = {}
    for r in got_df.orderBy("query_id", "rnk").collect():
        got.setdefault(r.query_id, []).append(r.neighbor_id)
    hits = sum(len(set(got.get(q, [])) & set(t)) for q, t in truth.items())
    total = sum(len(t) for t in truth.values())
    assert hits / total >= 0.8, f"PQ recall {hits}/{total}"


def test_embedding_covariance_matches_numpy(spark):
    import numpy as np

    from cs744_big_data_system_spark.operators.similarity import embedding_covariance

    rng = np.random.RandomState(7)
    X = rng.randn(40, 6)
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(40)], ["vec_id", "embedding"]
    )
    got = {(r.i, r.j): r.cov for r in embedding_covariance(df, dim=6).collect()}
    C = np.cov(X, rowvar=False, ddof=0)
    assert len(got) == 21
    for i in range(6):
        for j in range(i, 6):
            assert abs(got[(i, j)] - C[i, j]) < 1e-5, (i, j)


def test_pca_project_matches_numpy_pca(spark):
    import numpy as np

    from cs744_big_data_system_spark.operators.similarity import pca_project

    rng = np.random.RandomState(3)
    # anisotropic cloud: two dominant directions
    X = rng.randn(60, 5) * np.array([5.0, 3.0, 0.5, 0.2, 0.1])
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(60)], ["vec_id", "embedding"]
    )
    out = pca_project(df, k=2, dim=5).collect()
    C = np.cov(X, rowvar=False, ddof=0)
    vals, vecs = np.linalg.eigh(np.round(C, 6))
    order = np.argsort(vals)[::-1][:2]
    ratios = {j: vals[idx] / vals.sum() for j, idx in enumerate(order)}
    by_j = {}
    for r in out:
        by_j.setdefault(r.j, []).append(r)
        assert abs(r.explained_var_ratio - ratios[r.j]) < 1e-4
    # projected variance onto component j ≈ eigenvalue j (centered data
    # ⇒ variance of scores = eigenvalue; our projection skips centering,
    # which shifts the mean, not the variance)
    for j, idx in enumerate(order):
        scores = np.array([r.proj for r in by_j[j]])
        assert abs(scores.var() - vals[idx]) / vals[idx] < 1e-3


def test_random_projection_matches_host_side_planes(spark):
    import numpy as np

    from cs744_big_data_system_spark.operators.similarity import (
        _RP_PLANE_BASE,
        _plane_coeff,
        random_projection,
    )

    rng = np.random.RandomState(11)
    X = rng.randn(10, 64)
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(10)], ["vec_id", "embedding"]
    )
    R = np.array(
        [[_plane_coeff(_RP_PLANE_BASE + j, t) for t in range(64)] for j in range(16)]
    )
    expect = X @ R.T / np.sqrt(16)
    got = {(r.vec_id, r.j): r.proj for r in random_projection(df, out_dim=16).collect()}
    assert len(got) == 160
    for i in range(10):
        for j in range(16):
            assert abs(got[(i, j)] - expect[i, j]) < 1e-5


def test_hard_negative_topk_excludes_same_label(spark):
    from cs744_big_data_system_spark.operators.similarity import hard_negative_topk

    rows = [
        (0, [1.0, 0.0, 0.0], "a"),
        (1, [0.99, 0.1, 0.0], "a"),   # same label as 0: must never appear
        (2, [0.98, 0.2, 0.0], "b"),   # hardest negative for 0
        (3, [0.0, 1.0, 0.0], "b"),
        (4, [0.0, 0.0, 1.0], "c"),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    out = hard_negative_topk(
        df.filter("vec_id = 0"), df, k=2, label_col="label"
    ).collect()
    got = [(r.neg_id, r.rnk) for r in sorted(out, key=lambda r: r.rnk)]
    assert got == [(2, 1), (3, 2)]
    assert all(r.neg_id != 1 for r in out)


def test_ann_recall_nprobe2_dominates_nprobe1(spark):
    """The recall-eval query itself must show nprobe=2 ⊇ nprobe=1 hits
    per query (widening the probe set can only add candidates)."""
    from cs744_big_data_system_spark.workloads.llm import q_ann_recall_eval
    from tests.conftest import SF_SMALL

    rows = q_ann_recall_eval(spark, SF_SMALL).collect()
    assert len(rows) == 20
    assert all(r.n_hit_ivf2 >= r.n_hit_ivf1 for r in rows)
    assert all(0.0 <= r.recall_ivf1 <= r.recall_ivf2 <= 1.0 for r in rows)


def test_embedding_frechet_diag_separates_shifted_slices(spark):
    """Identical slices → distance ~0; a mean-shifted slice → the
    mean term dominates and matches the planted shift."""
    import numpy as np

    from cs744_big_data_system_spark.operators.similarity import embedding_frechet_diag

    rng = np.random.RandomState(5)
    base = rng.randn(40, 4)
    same = [(i, [float(v) for v in base[i]], i % 2) for i in range(40)]
    d0 = embedding_frechet_diag(
        spark.createDataFrame(same, ["vec_id", "embedding", "label"]),
        slice_value=0, dim=4,
    ).collect()[0]
    # identical generating distribution: small but nonzero sample noise
    assert d0.frechet2 < 1.0

    shifted = [(i, [float(v) + (3.0 if i % 2 == 0 else 0.0) for v in base[i]], i % 2)
               for i in range(40)]
    d1 = embedding_frechet_diag(
        spark.createDataFrame(shifted, ["vec_id", "embedding", "label"]),
        slice_value=0, dim=4,
    ).collect()[0]
    # planted +3 shift in all 4 dims → mean_dist2 ≈ 4 * 9 = 36
    assert 25.0 < d1.mean_dist2 < 50.0
    assert d1.frechet2 > d0.frechet2 + 20.0
