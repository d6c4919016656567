"""Laws for the late-round-5 batch (workloads/curation3.py): recursive
CTE traversal, OHLC rollup, interval-overlap join, BM25 retrieval.
Each query is also oracle-backed via the registry; these tests pin the
algorithmic invariants the SQL mirror can't independently witness."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_recursive_cte_covers_every_customer_once(spark):
    """The halving-tree traversal must reach every customer exactly
    once (it is a spanning tree of the key set), at the closed-form
    depth floor(log2(k)) + 1 (root 0 at depth 0)."""
    from cs744_big_data_system_spark.sources.readers import load_table
    from cs744_big_data_system_spark.workloads.curation3 import q_sql_recursive_cte

    rows = q_sql_recursive_cte(spark, SF).collect()
    n_cust = load_table(spark, SF, "customer").count()
    assert sum(r.n_nodes for r in rows) == n_cust
    keys = range(n_cust)  # keys are 0..N-1 in the fixture
    by_depth = {}
    for k in keys:
        d = 0 if k == 0 else int(math.floor(math.log2(k))) + 1
        by_depth[d] = by_depth.get(d, 0) + 1
    assert {r.depth: r.n_nodes for r in rows} == by_depth
    for r in rows:
        if r.depth > 0:
            assert r.min_key == 2 ** (r.depth - 1)


def test_ohlc_laws(spark):
    """low ≤ open, close ≤ high; volume sums to the table count; a
    single-event bucket has open == close == high == low."""
    from cs744_big_data_system_spark.sources.readers import load_table
    from cs744_big_data_system_spark.workloads.curation3 import q_timeseries_ohlc

    rows = q_timeseries_ohlc(spark, SF).collect()
    ev = load_table(spark, SF, "events")
    assert sum(r.n_events for r in rows) == ev.count()
    for r in rows:
        assert r.low_value <= r.open_value <= r.high_value
        assert r.low_value <= r.close_value <= r.high_value
        if r.n_events == 1:
            assert r.open_value == r.close_value == r.high_value == r.low_value


def test_interval_overlap_matches_bruteforce(spark):
    """The bucket-decomposed join returns EXACTLY the quadratic
    truth: same pair multiset, same summed overlap."""
    from cs744_big_data_system_spark.operators.relational import sessionize
    from cs744_big_data_system_spark.sources.readers import load_table
    from cs744_big_data_system_spark.workloads.curation3 import (
        q_interval_overlap_join,
    )

    ev = load_table(spark, SF, "events")
    sess = (
        sessionize(ev, gap_minutes=30)
        .groupBy("user_id", "session_id")
        .agg(
            F.unix_micros(F.min("ts")).alias("s"),
            F.unix_micros(F.max("ts")).alias("e"),
            F.count(F.lit(1)).alias("n"),
        )
        .filter(F.col("n") >= 2)
        .collect()
    )
    truth = {}
    for a in sess:
        if a.user_id % 2:
            continue
        for b in sess:
            if b.user_id % 2 == 0:
                continue
            if a.s <= b.e and b.s <= a.e:
                k = (a.user_id, b.user_id)
                n, tot = truth.get(k, (0, 0))
                truth[k] = (n + 1, tot + min(a.e, b.e) - max(a.s, b.s))
    got = {
        (r.user_a, r.user_b): (r.n_pairs, r.sum_overlap_us)
        for r in q_interval_overlap_join(spark, SF).collect()
    }
    assert got == truth


def test_schema_evolution_nulls_only_for_old_generation(spark):
    """The merged read must expose `source` as NULL exactly for the
    old-generation (even doc_id) rows and preserve it for the new."""
    from cs744_big_data_system_spark.sources.readers import load_table
    from cs744_big_data_system_spark.workloads.curation3 import (
        q_parquet_schema_evolution,
    )

    rows = {r.lang: r for r in q_parquet_schema_evolution(spark, SF).collect()}
    docs = load_table(spark, SF, "documents")
    truth = {
        r.lang: r
        for r in docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.sum((F.col("doc_id") % 2 == 1).cast("long")).alias("n_odd"),
        )
        .collect()
    }
    assert set(rows) == set(truth)
    for lang, r in rows.items():
        assert r.n_docs == truth[lang].n_docs
        assert r.sum_chars == truth[lang].sum_chars
        assert r.n_with_source == truth[lang].n_odd  # NULL for every even doc


def test_upsert_sink_equals_batch_latest(spark):
    """The streamed idempotent-MERGE snapshot (including the in-query
    redelivery drill) must equal the batch latest-per-key answer."""
    from cs744_big_data_system_spark.sources.readers import load_table
    from cs744_big_data_system_spark.workloads.curation3 import (
        q_stream_upsert_sink_replay,
    )

    got = {
        (r.user_id, r.event_type): (r.last_ts_us, r.last_event_id, r.last_value)
        for r in q_stream_upsert_sink_replay(spark, SF).collect()
    }
    ev = load_table(spark, SF, "events")
    tie = F.struct(F.col("ts"), F.col("event_id"))
    truth = {
        (r.user_id, r.event_type): (r.last_ts_us, r.last_event_id, r.last_value)
        for r in ev.groupBy("user_id", "event_type")
        .agg(F.max_by(F.struct("ts", "event_id", "value"), tie).alias("r"))
        .select(
            "user_id",
            "event_type",
            F.unix_micros("r.ts").alias("last_ts_us"),
            F.col("r.event_id").alias("last_event_id"),
            F.round("r.value", 6).alias("last_value"),
        )
        .collect()
    }
    assert got == truth


def test_state_inspect_equals_batch_agg(spark):
    """Reading the checkpoint's state store back as a table must
    reproduce the batch aggregate exactly."""
    from cs744_big_data_system_spark.sources.readers import load_table
    from cs744_big_data_system_spark.workloads.curation3 import (
        q_stream_state_inspect,
    )

    got = {
        r.event_type: (r.n_events, r.sum_value)
        for r in q_stream_state_inspect(spark, SF).collect()
    }
    truth = {
        r.event_type: (r.n_events, r.sum_value)
        for r in load_table(spark, SF, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .collect()
    }
    assert got == truth


def test_video_frame_sample_golden(spark):
    """Pure-Python golden: rebuild one asset's container from the md5
    recipe, parse it by hand, and pin the query's rows for that asset
    — container layout, sampling cadence, and pixel sums."""
    import hashlib
    import struct

    from cs744_big_data_system_spark.workloads.curation3 import (
        _VID_FRAME_BYTES,
        _VID_HEADER,
        _VID_SAMPLE_EVERY,
        q_video_frame_sample,
    )

    doc_id = 7
    n_frames = 3 + doc_id % 4
    expected = {}
    for f in range(n_frames):
        if f % _VID_SAMPLE_EVERY:
            continue
        body = b"".join(
            bytes.fromhex(hashlib.md5(f"{doc_id}:vf{f}:{c}".encode()).hexdigest())
            for c in range(_VID_FRAME_BYTES // 16)
        )
        assert len(body) == _VID_FRAME_BYTES
        # the engine decodes through the real PPM parser; pin the blob
        # shape it must parse
        blob = struct.pack(">I", len(_VID_HEADER) + _VID_FRAME_BYTES)
        assert len(blob) == 4
        expected[f] = (sum(body), _VID_FRAME_BYTES)

    rows = {
        r.frame_idx: (r.sum_px, r.n_px)
        for r in q_video_frame_sample(spark, SF).collect()
        if r.asset_id == doc_id
    }
    assert rows == expected


def test_txlog_delete_where_prunes_files_and_time_travels(spark):
    """Copy-on-write DELETE laws: only files containing matches are
    rewritten (the commit's remove set is a strict subset of the live
    files), the new snapshot equals the filter, the pre-delete version
    still time-travels to the erased rows, and a no-match DELETE is a
    no-op that commits nothing."""
    import json
    import os
    import shutil
    import tempfile

    from cs744_big_data_system_spark.sources.readers import load_table
    from cs744_big_data_system_spark.sources.txlog import (
        _entry_path,
        txlog_append,
        txlog_delete_where,
        txlog_read,
    )

    table = os.path.join(tempfile.gettempdir(), f"gdpr_test_{os.getpid()}")
    shutil.rmtree(table, ignore_errors=True)
    try:
        ev = load_table(spark, SF, "events").select("event_id", "user_id", "value")
        txlog_append(ev.repartition(8, "user_id"), table)
        forget = F.col("user_id") % 37 == 3
        n_forgotten = ev.filter(forget).count()
        assert n_forgotten > 0

        v = txlog_delete_where(spark, table, forget)
        with open(_entry_path(table, v)) as f:
            entry = json.load(f)
        assert 0 < len(entry["remove"]) < 8  # pruning: not a full rewrite
        snap = txlog_read(spark, table)
        assert snap.filter(forget).count() == 0
        assert snap.count() == ev.count() - n_forgotten
        # time travel: the pre-delete version still has every row
        old = txlog_read(spark, table, version=v - 1)
        assert old.count() == ev.count()
        assert old.filter(forget).count() == n_forgotten
        # no-match delete: same version back, no new commit
        v2 = txlog_delete_where(spark, table, F.col("user_id") == -1)
        assert v2 == v and not os.path.exists(_entry_path(table, v + 1))
    finally:
        shutil.rmtree(table, ignore_errors=True)


def test_cbo_stats_recorded_and_result_correct(spark):
    """ANALYZE must leave row-count statistics the optimizer can see
    (optimizedPlan stats == table count), and the CBO query's result
    must equal the same aggregation computed via the DataFrame API."""
    from cs744_big_data_system_spark.sources.readers import load_table
    from cs744_big_data_system_spark.workloads.curation3 import q_cbo_join_reorder

    got = {r.c_mktsegment: (r.n_lines, r.revenue) for r in q_cbo_join_reorder(spark, SF).collect()}

    li = load_table(spark, SF, "lineitem")
    orders = load_table(spark, SF, "orders")
    cust = load_table(spark, SF, "customer")
    truth = {
        r.c_mktsegment: (r.n_lines, r.revenue)
        for r in li.filter(F.col("l_quantity") > 10)
        .join(orders.filter(F.col("o_orderstatus") == "F"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"),
        )
        .collect()
    }
    assert got == truth

    # the ANALYZEd table must expose a rowCount to the optimizer
    import hashlib
    import os

    tag = hashlib.md5(SF.encode()).hexdigest()[:8]
    t = f"cbo_orders_{os.getpid()}_{tag}"
    old = spark.conf.get("spark.sql.cbo.enabled", None)
    spark.conf.set("spark.sql.cbo.enabled", "true")  # stats only surface under CBO
    try:
        jdf = spark.table(t)._jdf
        row_count = jdf.queryExecution().optimizedPlan().stats().rowCount()
        assert row_count.isDefined(), "ANALYZE left no row-count statistic"
        assert int(str(row_count.get())) == spark.table(t).count()
    finally:
        if old is None:
            spark.conf.unset("spark.sql.cbo.enabled")
        else:
            spark.conf.set("spark.sql.cbo.enabled", old)


def test_stream_progress_matches_wave_sizes(spark):
    """One progress row per wave, batch ids dense from 0, counts equal
    the wave sizes."""
    from cs744_big_data_system_spark.sources.readers import load_table
    from cs744_big_data_system_spark.workloads.curation3 import (
        q_stream_progress_metrics,
    )

    rows = {r.batch_id: r.num_input_rows for r in q_stream_progress_metrics(spark, SF).collect()}
    ev = load_table(spark, SF, "events")
    waves = {
        i: ev.filter(F.col("event_id") % 3 == i).count() for i in range(3)
    }
    assert rows == waves


def test_cohort_matrix_conservation_and_first_week(spark):
    """Cells partition the event set (n_events sums to the table
    count); ages are non-negative; every user's acquisition week has a
    week-0 cell containing them (so week-0 n_users sums to the number
    of distinct users)."""
    from cs744_big_data_system_spark.sources.readers import load_table
    from cs744_big_data_system_spark.workloads.curation3 import (
        q_cohort_revenue_matrix,
    )

    rows = q_cohort_revenue_matrix(spark, SF).collect()
    ev = load_table(spark, SF, "events")
    assert sum(r.n_events for r in rows) == ev.count()
    assert all(r.age_weeks >= 0 for r in rows)
    week0_users = sum(r.n_users for r in rows if r.age_weeks == 0)
    assert week0_users == ev.select("user_id").distinct().count()


def test_bm25_topk_laws(spark):
    """Per query: ranks are 1..k dense, scores non-increasing, doc_id
    ascending within equal scores, and every returned doc matches at
    least one query term (n_terms ≥ 1, score > 0 possible only via a
    posting hit)."""
    from cs744_big_data_system_spark.workloads.curation3 import (
        _BM25_K,
        _BM25_QUERIES,
        q_bm25_search_topk,
    )

    rows = q_bm25_search_topk(spark, SF).collect()
    n_terms_per_q = {}
    for qid, _ in _BM25_QUERIES:
        n_terms_per_q[qid] = n_terms_per_q.get(qid, 0) + 1
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == set(n_terms_per_q)
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= _BM25_K
        for prev, cur in zip(rs, rs[1:]):
            assert (prev.score_micro, -prev.doc_id) >= (cur.score_micro, -cur.doc_id)
            if prev.score_micro == cur.score_micro:
                assert prev.doc_id < cur.doc_id
        for r in rs:
            assert 1 <= r.n_terms <= n_terms_per_q[qid]
