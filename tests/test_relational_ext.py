"""Second-batch relational operators (workloads/relational_ext.py) and
the new dedup/similarity/stateful additions — semantics on tiny
hand-built frames; oracle equality is covered by tools/selfcheck.py."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_full_outer_keeps_unmatched_both_sides(spark):
    a = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "va"])
    b = spark.createDataFrame([(2, "x"), (3, "y")], ["k2", "vb"])
    out = a.join(b, a.k == b.k2, "full_outer").collect()
    assert len(out) == 3
    keys = {(r.k, r.k2) for r in out}
    assert (1, None) in keys and (None, 3) in keys and (2, 2) in keys


def test_percentile_exact_interpolation(spark):
    df = spark.createDataFrame([(float(x),) for x in [1, 2, 3, 4]], ["x"])
    got = df.agg(F.percentile("x", F.lit(0.5)).alias("p50")).first().p50
    assert got == 2.5  # linear interpolation between 2 and 3


def test_map_roundtrip_preserves_counts(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (1, "b"), (2, "a")], ["uid", "et"]
    )
    per = df.groupBy("uid", "et").agg(F.count(F.lit(1)).alias("cnt"))
    as_map = per.groupBy("uid").agg(
        F.map_from_entries(F.array_sort(F.collect_list(F.struct("et", "cnt")))).alias("m")
    )
    back = as_map.select("uid", F.explode("m").alias("et", "cnt"))
    assert sorted(back.collect()) == sorted(per.collect())


def test_pivot_matches_conditional_agg(spark):
    df = spark.createDataFrame(
        [("A", "F", 1.0), ("A", "O", 2.0), ("B", "F", 3.0), ("A", "F", 4.0)],
        ["rf", "ls", "qty"],
    )
    piv = {
        (r.rf): (r.F, r.O)
        for r in df.groupBy("rf").pivot("ls", ["F", "O"]).agg(F.sum("qty")).collect()
    }
    assert piv["A"] == (5.0, 2.0) and piv["B"] == (3.0, None)


def test_simhash_pairs_banding_is_complete(spark):
    """Band-join candidates must contain every pair within the hamming
    budget — compare against the brute-force pair set."""
    from cs744_big_data_system_spark.operators.dedup import simhash, simhash_hamming_pairs

    rows = [
        (0, "alpha beta gamma delta epsilon zeta eta theta", "en", "s", 10),
        (1, "alpha beta gamma delta epsilon zeta eta iota", "en", "s", 10),   # near
        (2, "alpha beta gamma delta epsilon zeta eta theta", "en", "s", 10),  # exact dup of 0
        (3, "totally unrelated words nothing shared here at all", "en", "s", 10),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    got = {(r.doc_a, r.doc_b): r.hamming for r in simhash_hamming_pairs(docs, 16, 3).collect()}
    sig = {r.doc_id: r.simhash for r in simhash(docs, 16).collect()}
    brute = {
        (a, b): bin(sig[a] ^ sig[b]).count("1")
        for a in sig
        for b in sig
        if a < b and bin(sig[a] ^ sig[b]).count("1") <= 3
    }
    assert got == brute
    assert got[(0, 2)] == 0  # identical docs collide exactly


def test_ivf_topk_finds_identical_vector(spark):
    from cs744_big_data_system_spark.operators.similarity import cosine_topk_ivf

    vecs = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),
        (1, [0.9, 0.1, 0.0, 0.0], 0),
        (2, [0.0, 1.0, 0.0, 0.0], 1),
        (3, [0.0, 0.9, 0.1, 0.0], 1),
        (4, [1.0, 0.0, 0.0, 0.0], 0),  # identical to 0
    ]
    emb = spark.createDataFrame(vecs, ["vec_id", "embedding", "label"]).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )
    q = emb.filter(F.col("vec_id") == 0)
    top = cosine_topk_ivf(q, emb, num_centroids=2, k=2).orderBy("rnk").collect()
    assert top[0].neighbor_id == 4 and top[0].cosine == 1.0


def test_stateful_running_counts_equal_batch(spark, tmp_path):
    from cs744_big_data_system_spark.streaming.stateful import running_counts
    from cs744_big_data_system_spark.streaming.windows import replay_to_batch

    src = "/root/testdata/sf0.001/events.parquet"
    updates = replay_to_batch(
        spark,
        src,
        lambda s: running_counts(s.withWatermark("ts", "365 days")),
        output_mode="update",
    )
    got = {
        r.user_id: r.n_events
        for r in updates.groupBy("user_id").agg(F.max("n_events").alias("n_events")).collect()
    }
    from cs744_big_data_system_spark.sources.readers import load_table

    want = {
        r.user_id: r.n
        for r in load_table(spark, "/root/testdata/sf0.001", "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_salted_sum_equals_direct(spark):
    from cs744_big_data_system_spark.operators.skew import salted_count, salted_sum

    df = spark.createDataFrame(
        [("hot", 1.0)] * 50 + [("cold", 2.0), ("cold", 3.0)], ["k", "v"]
    )
    got = {r.k: r.sum_v for r in salted_sum(df, ["k"], "v", buckets=4, out_col="sum_v").collect()}
    assert got == {"hot": 50.0, "cold": 5.0}
    cnt = {r.k: r.n for r in salted_count(df, ["k"], buckets=4).collect()}
    assert cnt == {"hot": 50, "cold": 2}


def test_salted_join_multiplicity(spark):
    from cs744_big_data_system_spark.operators.skew import salted_join

    big = spark.createDataFrame([(1, "a")] * 20 + [(2, "b")] * 3, ["k", "x"])
    small = spark.createDataFrame([(1, "dim1"), (2, "dim2"), (3, "dim3")], ["k", "d"])
    out = salted_join(big, small, "k", buckets=4)
    assert out.count() == 23
    assert out.filter(F.col("d") == "dim1").count() == 20
    assert set(out.columns) == {"k", "x", "d"}


def test_set_ops_all_bag_semantics(spark):
    a = spark.createDataFrame([(1,), (1,), (2,)], ["x"])
    b = spark.createDataFrame([(1,), (3,)], ["x"])
    assert sorted(r.x for r in a.intersectAll(b).collect()) == [1]
    assert sorted(r.x for r in a.exceptAll(b).collect()) == [1, 2]
    assert a.unionAll(b).count() == 5


def test_events_funnel_ordering(spark, tmp_path):
    """A purchase BEFORE the first qualifying click must not advance
    the funnel; only view -> click -> purchase in strict time order."""
    import datetime as dt

    from cs744_big_data_system_spark.workloads.relational_ext import q_events_funnel

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    s = lambda sec: t0 + dt.timedelta(seconds=sec)
    rows = [
        # u1: full ordered funnel
        (1, s(0), 1, "view", 0.0, "{}"),
        (2, s(10), 1, "click", 0.0, "{}"),
        (3, s(20), 1, "purchase", 0.0, "{}"),
        # u2: purchase precedes click -> stage 2 only
        (4, s(0), 2, "view", 0.0, "{}"),
        (5, s(5), 2, "purchase", 0.0, "{}"),
        (6, s(10), 2, "click", 0.0, "{}"),
        # u3: click precedes view -> stage 1 only
        (7, s(5), 3, "click", 0.0, "{}"),
        (8, s(10), 3, "view", 0.0, "{}"),
        # u4: no view at all -> absent from the funnel
        (9, s(0), 4, "click", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = {r.user_id: r for r in q_events_funnel(spark, str(tmp_path)).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1].stage == 3 and out[1].first_purchase_us is not None
    assert out[2].stage == 2 and out[2].first_purchase_us is None
    assert out[3].stage == 1 and out[3].first_click_us is None


def test_events_retention_cohorts(spark, tmp_path):
    """Cohort week is the user's FIRST event week; week_no counts
    Monday-truncated week boundaries, not 7-day gaps from the event."""
    import datetime as dt

    from cs744_big_data_system_spark.workloads.relational_ext import q_events_retention

    # 2024-01-01 is a Monday; u1 starts wk0 and returns wk2;
    # u2 starts Sunday wk0 and returns next-day Monday = week_no 1.
    rows = [
        (1, dt.datetime(2024, 1, 1, 9), 1, "view", 0.0, "{}"),
        (2, dt.datetime(2024, 1, 16, 9), 1, "view", 0.0, "{}"),
        (3, dt.datetime(2024, 1, 7, 23), 2, "view", 0.0, "{}"),
        (4, dt.datetime(2024, 1, 8, 1), 2, "view", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = {(r.cohort_week, r.week_no): r.n_users for r in q_events_retention(spark, str(tmp_path)).collect()}
    assert out[("2024-01-01", 0)] == 2  # both users' first events fall in wk of Jan 1
    assert out[("2024-01-01", 2)] == 1  # u1 back two weeks later
    assert out[("2024-01-01", 1)] == 1  # u2's Monday event is already week_no 1


def test_approx_percentile_within_rank_error_of_exact(spark):
    """The sketch's quantiles must sit within a tight relative band of
    the exact per-group percentiles (GK accuracy=10000 -> rank error
    1e-4; on small groups it is exact)."""
    from cs744_big_data_system_spark.workloads.relational_ext import (
        q_approx_percentile,
        q_percentile,
    )

    sf = "/root/testdata/sf0.001"
    exact = {r.l_returnflag: r for r in q_percentile(spark, sf).collect()}
    approx = {r.l_returnflag: r for r in q_approx_percentile(spark, sf).collect()}
    assert set(exact) == set(approx)
    for flag, e in exact.items():
        a = approx[flag]
        assert a.n == e.n
        for col in ("p50", "p90", "p99"):
            assert abs(getattr(a, col) - getattr(e, col)) <= 0.01 * abs(getattr(e, col)), (
                flag, col, getattr(a, col), getattr(e, col))


def test_ewma_matches_pandas_recursive(spark):
    """The prefix-sum EWMA must equal pandas' sequential
    ewm(adjust=False) recursion per key (within float-rescaling
    tolerance), including series long enough for the rescaled terms to
    reach ~1e10."""
    import random

    import pandas as pd

    from cs744_big_data_system_spark.operators.timeseries import ewma

    rng = random.Random(3)
    rows = [
        (k, i, rng.uniform(0, 100.0)) for k in (1, 2) for i in range(80)
    ]
    df = spark.createDataFrame(rows, ["k", "seq", "x"])
    got = {
        (r.k, r.seq): r.ewma
        for r in ewma(df, "k", "seq", "x", alpha=0.3).collect()
    }
    for k in (1, 2):
        series = pd.Series([x for kk, _, x in rows if kk == k])
        want = series.ewm(alpha=0.3, adjust=False).mean()
        for i in range(80):
            assert abs(got[(k, i)] - round(want[i], 4)) < 2e-4, (k, i)


def test_registry_invariants():
    """Driver-contract guards: every oracle key maps to a query, no
    empty SQL, every entry callable, and the verification window (the
    first 50 entries — the prefix the driver attests) is exactly the
    generated rotation module's FRONT. Window CONTENT vs the
    CORRECTNESS artifacts is asserted by the tripwire in
    tests/test_bench_contract.py (the front is derived, not
    hand-enumerated, since r09) — this test only pins the wiring, so
    it no longer goes stale each rotation."""
    from cs744_big_data_system_spark import workloads
    from cs744_big_data_system_spark.workloads._rotation import FRONT

    reg = workloads.all_workloads()
    names = list(reg)
    assert len(names) == len(set(names))
    oracles = {n: sql for n, (_, sql) in reg.items() if sql is not None}
    for n, sql in oracles.items():
        assert sql.strip(), n
    assert len(FRONT) == 50 and names[:50] == FRONT
    # every registry entry is callable
    assert all(callable(fn) for fn, _ in reg.values())


def test_apply_in_arrow_stats_match_groupby(spark):
    """The applyInArrow per-group stats must equal the plain groupBy
    aggregates on a frame with single-doc and multi-doc groups."""
    from pyspark.sql import functions as F

    from cs744_big_data_system_spark.operators.grouped_pandas import (
        per_group_arrow_stats,
    )

    docs = spark.createDataFrame(
        [(1, "a", "en", "s", 10), (2, "b", "en", "s", 30), (3, "c", "de", "s", 7)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    got = {r.group: (r.n_docs, r.total_chars, r.mean_chars, r.max_chars)
           for r in per_group_arrow_stats(docs).collect()}
    want = {r.lang: (r.n, r.t, r.m, r.mx) for r in docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("t"),
        F.round(F.sum("n_chars") / F.count(F.lit(1)), 6).alias("m"),
        F.max("n_chars").alias("mx")).collect()}
    assert got == want


def test_cogrouped_arrow_order_fill_equals_native_join_agg(spark):
    """The applyInArrow cogroup demo must equal the native join+agg
    plan row-for-row (it IS a join+agg, expressed through the API)."""
    from pyspark.sql import functions as F

    from cs744_big_data_system_spark.operators.grouped_pandas import (
        cogrouped_arrow_order_fill,
    )
    from cs744_big_data_system_spark.sources.readers import load_table
    from tests.conftest import SF_SMALL

    orders = load_table(spark, SF_SMALL, "orders").filter(F.col("o_orderkey") % 10 == 7)
    li = load_table(spark, SF_SMALL, "lineitem").filter(F.col("l_orderkey") % 10 == 7)
    got = {
        r.o_orderkey: (r.o_totalprice, r.n_lines, r.sum_qty, r.net_revenue)
        for r in cogrouped_arrow_order_fill(orders, li).collect()
    }
    expect = {
        r.o_orderkey: (r.o_totalprice, r.n_lines, r.sum_qty, r.net_revenue)
        for r in orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_totalprice")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
            ).alias("net_revenue"),
        )
        .collect()
    }
    assert got == expect and len(got) > 0
