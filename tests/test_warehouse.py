"""Unit tests for the warehouse/CDC family (operators/merge.py,
graph/bfs.py, workloads/warehouse.py) on hand-built fixtures where
every branch and invariant is enumerable."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_merge_upsert_all_three_branches(spark):
    from cs744_big_data_system_spark.operators.merge import merge_upsert

    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], ["k", "tag", "bal"]
    )
    source = spark.createDataFrame([(2, 5.0), (4, 7.0)], ["k", "delta"])
    out = merge_upsert(
        target,
        source,
        key="k",
        matched_set={"bal": F.col("t.bal") + F.col("s.delta")},
        not_matched_insert={"tag": F.lit("new"), "bal": F.col("s.delta")},
    )
    rows = {r.k: r for r in out.collect()}
    assert len(rows) == 4
    assert rows[1].merge_action == "kept" and rows[1].bal == 10.0
    assert rows[2].merge_action == "updated" and rows[2].bal == 25.0 and rows[2].tag == "b"
    assert rows[3].merge_action == "kept"
    assert rows[4].merge_action == "inserted" and rows[4].bal == 7.0 and rows[4].tag == "new"


def test_table_diff_classifies_all_four_cases(spark):
    from cs744_big_data_system_spark.operators.merge import table_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None), (4, "d")], "k int, v string"
    )
    new = spark.createDataFrame(
        [(2, "B"), (3, None), (4, "d"), (5, "e")], "k int, v string"
    )
    got = {r.k: r.diff_class for r in table_diff(old, new, key="k").collect()}
    # 1 removed, 2 changed, 3 unchanged (null-safe compare), 4 unchanged, 5 added
    assert got == {1: "removed", 2: "changed", 3: "unchanged", 4: "unchanged", 5: "added"}


def test_chunk_documents_overlap_and_tail(spark):
    from cs744_big_data_system_spark.operators.text_analysis import chunk_documents

    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(10))), (2, "one"), (3, "   ")],
        ["doc_id", "text"],
    )
    out = chunk_documents(docs, chunk_tokens=4, overlap=2)
    rows = {(r.doc_id, r.chunk_idx): r for r in out.collect()}
    # doc 1: starts 0,2,4,6,8 (stride 2 over 10 tokens)
    assert [rows[(1, i)].chunk_text for i in range(5)] == [
        "w0 w1 w2 w3", "w2 w3 w4 w5", "w4 w5 w6 w7", "w6 w7 w8 w9", "w8 w9",
    ]
    assert rows[(1, 4)].n_tokens == 2          # short tail chunk
    assert rows[(2, 0)].chunk_text == "one"    # single-token doc: one chunk
    assert not any(k[0] == 3 for k in rows)    # whitespace-only doc: no chunks


def test_merge_upsert_rejects_degenerate_source_keys(spark):
    """SQL MERGE cardinality rules: duplicate source keys and NULL
    source keys are runtime errors unless validate=False, in which
    case the documented join-dictated behavior applies."""
    import pytest

    from cs744_big_data_system_spark.operators.merge import merge_upsert

    target = spark.createDataFrame([(1, 10.0)], ["k", "bal"])
    kwargs = dict(
        key="k",
        matched_set={"bal": F.col("s.delta")},
        not_matched_insert={"bal": F.col("s.delta")},
    )

    dup_src = spark.createDataFrame([(1, 5.0), (1, 6.0)], ["k", "delta"])
    with pytest.raises(ValueError, match="duplicate merge keys"):
        merge_upsert(target, dup_src, **kwargs)
    # validate=False: the matched target row fans out per source row.
    assert merge_upsert(target, dup_src, validate=False, **kwargs).count() == 2

    null_src = spark.createDataFrame([(None, 7.0)], "k int, delta double")
    with pytest.raises(ValueError, match="NULL merge key"):
        merge_upsert(target, null_src, **kwargs)
    rows = {r.merge_action: r for r in merge_upsert(
        target, null_src, validate=False, **kwargs).collect()}
    assert rows["inserted"].k is None and rows["inserted"].bal == 7.0
    assert rows["kept"].k == 1


def test_scd2_intervals_tile_without_overlap(spark):
    from cs744_big_data_system_spark.operators.merge import scd2_history

    import datetime

    d = datetime.datetime
    # key 1: status runs A,A,B,A — expect 3 rows (A, B, A)
    # key 2: single status — 1 open-ended row
    # key 1 also has two changes on the SAME date (ids 3,4): the unique
    # id tie-break must keep B-then-A deterministic.
    changes = spark.createDataFrame(
        [
            (1, "A", d(2024, 1, 1), 1),
            (1, "A", d(2024, 2, 1), 2),
            (1, "B", d(2024, 3, 1), 3),
            (1, "A", d(2024, 3, 1), 4),
            (2, "X", d(2024, 1, 5), 5),
        ],
        ["k", "status", "ts", "id"],
    )
    hist = scd2_history(changes, key="k", tracked="status", order_by=["ts", "id"])
    got = sorted(
        (r.k, r.status, r.valid_from, r.valid_to, r.is_current) for r in hist.collect()
    )
    assert got == [
        (1, "A", "2024-01-01", "2024-03-01", False),
        (1, "A", "2024-03-01", "9999-12-31", True),
        (1, "B", "2024-03-01", "2024-03-01", False),
        (2, "X", "2024-01-05", "9999-12-31", True),
    ]
    # exactly one current row per key; each non-current row's valid_to
    # equals some later row's valid_from (intervals tile)
    per_key = {}
    for k, _, vf, vt, cur in got:
        per_key.setdefault(k, []).append((vf, vt, cur))
    for k, rows in per_key.items():
        assert sum(1 for _, _, cur in rows if cur) == 1


def test_bfs_hops_golden_graph(spark):
    from cs744_big_data_system_spark.graph.bfs import bfs_hops

    #   0 -> 1 -> 2 -> 3,  0 -> 2 (shortcut),  4 isolated,  3 -> 0 (cycle)
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (0, 2), (3, 0), (4, 4)], ["src", "dst"]
    )
    hops = bfs_hops(edges, source=0, max_iters=10)
    got = {r.node: r.hop for r in hops.collect()}
    hops.cached_links.unpersist()
    assert got == {0: 0, 1: 1, 2: 1, 3: 2}  # 4 unreachable; cycle stops


def test_bfs_shuffle_fallback_matches_broadcast_path(spark):
    """broadcast_threshold=0 forces the shuffle-join regime from round
    one; results must be identical to the broadcast path (the |V|-scale
    fallback is a plan change, not a semantics change)."""
    from cs744_big_data_system_spark.graph.bfs import bfs_hops

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (0, 2), (3, 0), (4, 4)], ["src", "dst"]
    )
    hops = bfs_hops(edges, source=0, max_iters=10, broadcast_threshold=0)
    got = {r.node: r.hop for r in hops.collect()}
    hops.cached_links.unpersist()
    assert got == {0: 0, 1: 1, 2: 1, 3: 2}


def test_bfs_bsp_loop_equals_recursive_cte(spark):
    """The imperative BSP frontier loop and the declarative WITH
    RECURSIVE form must compute identical hop counts on the shared
    hash graph — two independent engines' worth of agreement inside
    one engine."""
    from cs744_big_data_system_spark.workloads.streaming_graph import (
        q_graph_bfs_hops,
        q_graph_bfs_sql,
    )

    bsp = {(r.node, r.hop) for r in q_graph_bfs_hops(spark, "unused").collect()}
    cte = {(r.node, r.hop) for r in q_graph_bfs_sql(spark, "unused").collect()}
    assert bsp == cte and len(bsp) > 1000


def test_bfs_respects_max_iters(spark):
    from cs744_big_data_system_spark.graph.bfs import bfs_hops

    chain = spark.createDataFrame([(i, i + 1) for i in range(6)], ["src", "dst"])
    hops = bfs_hops(chain, source=0, max_iters=3)
    got = {r.node: r.hop for r in hops.collect()}
    hops.cached_links.unpersist()
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}


def test_topk_salted_equals_naive_window(spark):
    from cs744_big_data_system_spark.workloads.warehouse import q_topk_per_group_salted

    from pyspark.sql import Window

    sf_dir = "/root/testdata/sf0.001"
    got = {
        (r.o_orderpriority, r.rnk): r.o_orderkey
        for r in q_topk_per_group_salted(spark, sf_dir).collect()
    }
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    want = {
        (r.o_orderpriority, r.rnk): r.o_orderkey
        for r in orders.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .collect()
    }
    assert got == want


def test_stream_static_join_equals_batch(spark):
    from cs744_big_data_system_spark.workloads.streaming_graph import (
        q_stream_static_join_replay,
    )

    sf_dir = "/root/testdata/sf0.001"
    got = {
        r.c_nationkey: (r.n_events, r.sum_value)
        for r in q_stream_static_join_replay(spark, sf_dir).collect()
    }
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    want = {
        r.c_nationkey: (r.n_events, r.sum_value)
        for r in ev.join(cust, ev.user_id == cust.c_custkey)
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .collect()
    }
    assert got == want


def test_gapfill_fills_gaps_with_previous_sum(spark):
    import datetime

    from cs744_big_data_system_spark.operators.timeseries import gapfill_forward

    d = datetime.datetime
    # user 1: buckets 00:00 and 02:00 — 01:00 is a gap
    events = spark.createDataFrame(
        [
            (1, d(2024, 1, 1, 0, 5), 1.0),
            (1, d(2024, 1, 1, 0, 15), 2.0),
            (1, d(2024, 1, 1, 2, 30), 5.0),
        ],
        ["user_id", "ts", "value"],
    )
    got = {
        r.bucket_start: (r.n_events, r.filled_sum)
        for r in gapfill_forward(events, bucket="1 hour").collect()
    }
    assert got == {
        "2024-01-01 00:00:00": (2, 3.0),
        "2024-01-01 01:00:00": (0, 3.0),  # gap row, forward-filled
        "2024-01-01 02:00:00": (1, 5.0),
    }


def test_zorder_key_known_values(spark):
    from cs744_big_data_system_spark.functions.zorder import zorder_key

    df = spark.createDataFrame([(3, 0), (0, 3), (5, 5)], ["x", "y"])
    got = {
        (r.x, r.y): r.z
        for r in df.select("x", "y", zorder_key(F.col("x"), F.col("y"), 4).alias("z")).collect()
    }
    # interleave: x bits at even positions, y bits at odd
    assert got == {(3, 0): 0b0101, (0, 3): 0b1010, (5, 5): 0b110011}


def test_zorder_layout_bounds_both_dimensions(spark, tmp_path):
    """Files range-partitioned on zkey bound the spread of BOTH
    l_partkey and l_suppkey, whereas sorting on one column leaves the
    other's per-file spread at (nearly) the global range — the file-
    skipping property that makes Z-ordering worth a rewrite at scale."""
    import pyarrow.parquet as pq

    from cs744_big_data_system_spark.workloads.warehouse import q_zorder_layout

    df = q_zorder_layout(spark, "/root/testdata/sf0.001")

    def mean_spread(order_col, col):
        out = str(tmp_path / f"layout_{order_col}")
        df.repartitionByRange(8, F.col(order_col)).write.mode("overwrite").parquet(out)
        spreads = []
        import glob

        for f in glob.glob(out + "/*.parquet"):
            md = pq.ParquetFile(f).metadata
            lo = min(
                md.row_group(i).column(
                    [c for c in range(md.num_columns)
                     if md.row_group(i).column(c).path_in_schema == col][0]
                ).statistics.min
                for i in range(md.num_row_groups)
            )
            hi = max(
                md.row_group(i).column(
                    [c for c in range(md.num_columns)
                     if md.row_group(i).column(c).path_in_schema == col][0]
                ).statistics.max
                for i in range(md.num_row_groups)
            )
            spreads.append(hi - lo)
        return sum(spreads) / len(spreads)

    # Z-ordered files must bound the *other* dimension far better than
    # a single-column sort does.
    assert mean_spread("zkey", "l_suppkey") < 0.7 * mean_spread("l_partkey", "l_suppkey")
    assert mean_spread("zkey", "l_partkey") < 0.7 * mean_spread("l_suppkey", "l_partkey")


def test_hll_rollup_merge_is_lossless_and_close_to_exact(spark):
    from cs744_big_data_system_spark.sources.readers import load_table
    from cs744_big_data_system_spark.workloads.warehouse import q_hll_rollup

    sf_dir = "/root/testdata/sf0.001"
    rolled = {r.lang: r.approx_docs for r in q_hll_rollup(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents")
    direct = {
        r.lang: r.est
        for r in docs.groupBy("lang")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("doc_id")).cast("long").alias("est"))
        .collect()
    }
    exact = {
        r.lang: r.n
        for r in docs.groupBy("lang").agg(F.countDistinct("doc_id").alias("n")).collect()
    }
    # union-of-fine-sketches == direct coarse sketch (HLL merge lossless)
    assert rolled == direct
    for lang, n in exact.items():
        assert abs(rolled[lang] - n) <= max(2, 0.05 * n), (lang, rolled[lang], n)


def test_dataset_split_disjoint_complete_deterministic(spark):
    from cs744_big_data_system_spark.workloads.llm import q_dataset_split

    sf = "/root/testdata/sf0.001"
    a = {r.doc_id: r.split for r in q_dataset_split(spark, sf).collect()}
    b = {r.doc_id: r.split for r in q_dataset_split(spark, sf).collect()}
    assert a == b  # deterministic across runs
    n = len(a)
    assert n == spark.read.parquet(f"{sf}/documents.parquet").count()  # complete
    from collections import Counter

    shares = Counter(a.values())
    assert 0.7 <= shares["train"] / n <= 0.9
    assert 0.04 <= shares["validation"] / n <= 0.16
    assert 0.04 <= shares["test"] / n <= 0.16


def test_fk_orphans_detects_planted_orphans(spark):
    from cs744_big_data_system_spark.workloads.relational_ext import q_fk_orphans

    # fixture integrity on the real tables: lineitem/orders/customer
    # chains must be clean
    got = {r.fk: r.n_orphans for r in q_fk_orphans(spark, "/root/testdata/sf0.001").collect()}
    assert got["lineitem->orders"] == 0
    assert got["orders->customer"] == 0
    assert got["customer->nation"] == 0


def test_cms_sketch_laws(spark):
    """Count-min: (1) one-sided error — every estimate ≥ the true
    count; (2) mergeability — sketches of two halves union+sum to the
    sketch of the whole; (3) the planted hot key tops the ranking."""
    from pyspark.sql import functions as F

    from cs744_big_data_system_spark.operators.sketches import (
        cms_heavy_hitters,
        count_min_build,
        count_min_estimate,
    )

    rows = [(i, f"k{i % 37}") for i in range(1000)] + [(9999 + i, "hot") for i in range(400)]
    df = spark.createDataFrame(rows, ["i", "key"])

    sketch = count_min_build(df, "key", depth=4, width=64)
    truth = df.groupBy("key").agg(F.count(F.lit(1)).alias("true_cnt"))
    est = count_min_estimate(truth.select("key"), sketch, "key", depth=4, width=64)
    joined = est.join(truth, "key").collect()
    assert len(joined) == 38
    assert all(r.est >= r.true_cnt for r in joined)

    half_a = count_min_build(df.filter(F.col("i") % 2 == 0), "key", depth=4, width=64)
    half_b = count_min_build(df.filter(F.col("i") % 2 == 1), "key", depth=4, width=64)
    merged = (
        half_a.unionByName(half_b)
        .groupBy("j", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, sketch.collect()))

    top = cms_heavy_hitters(df, "key", k=1, depth=4, width=64).collect()
    assert top[0].key == "hot" and top[0].true_cnt == 400


def test_kmv_distinct_laws(spark):
    """KMV: exact below k, within ~2σ above k, and the
    merge law — re-taking the k smallest of the union of two halves'
    k-smallest sets equals the k smallest of the whole."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from cs744_big_data_system_spark.operators.dedup import md5_int60
    from cs744_big_data_system_spark.operators.sketches import kmv_distinct

    rows = [(i, "big" if i < 800 else "small") for i in range(820)]
    df = spark.createDataFrame(rows, ["key", "grp"])
    # k=128 → relative stderr ≈ 1/sqrt(k-2) ≈ 9%; this deterministic
    # key set lands at 10.8% (computed offline), so 20% is ~2σ slack.
    got = {r.grp: r for r in kmv_distinct(df, "key", "grp", k=128).collect()}
    assert got["small"].n_exact == 20 and got["small"].kmv_est == 20.0
    assert abs(got["big"].kmv_est - 800) / 800 < 0.20

    def hashes(d):
        return sorted(
            r.h
            for r in d.select(
                md5_int60(F.col("key").cast("string")).alias("h")
            ).distinct().collect()
        )

    big = df.filter(F.col("grp") == "big")
    whole_topk = hashes(big)[:32]
    half_a = hashes(big.filter(F.col("key") % 2 == 0))[:32]
    half_b = hashes(big.filter(F.col("key") % 2 == 1))[:32]
    merged_topk = sorted(set(half_a) | set(half_b))[:32]
    assert merged_topk == whole_topk


def test_txlog_snapshot_isolation_laws(spark):
    """Transaction-log table: time travel reads historical versions,
    compaction changes files but not rows, overwrite isolates, a
    version claim is single-winner, and orphan data files from a
    crashed writer stay invisible."""
    import os
    import shutil
    import tempfile

    import pytest

    from cs744_big_data_system_spark.sources.txlog import (
        _commit,
        latest_version,
        txlog_append,
        txlog_compact,
        txlog_overwrite,
        txlog_read,
    )

    path = tempfile.mkdtemp(prefix="txlog_test_")
    shutil.rmtree(path, ignore_errors=True)
    try:
        df1 = spark.range(10).selectExpr("id", "id * 2 AS v")
        df2 = spark.range(10, 15).selectExpr("id", "id * 2 AS v")
        assert txlog_append(df1, path) == 0
        assert txlog_append(df2, path) == 1
        # orphan file (crashed writer: data staged, log never committed)
        with open(os.path.join(path, "part-orphan.parquet"), "wb") as f:
            f.write(b"garbage")
        assert txlog_read(spark, path, 0).count() == 10
        assert txlog_read(spark, path, 1).count() == 15
        v2 = txlog_compact(spark, path, target_files=1)
        assert v2 == 2
        before = sorted(r.id for r in txlog_read(spark, path, 1).collect())
        after = sorted(r.id for r in txlog_read(spark, path, 2).collect())
        assert before == after == list(range(15))
        v3 = txlog_overwrite(spark.range(100, 103).selectExpr("id", "id AS v"), path)
        assert sorted(r.id for r in txlog_read(spark, path, v3).collect()) == [100, 101, 102]
        assert txlog_read(spark, path, 1).count() == 15  # history intact
        assert latest_version(path) == 3
        with pytest.raises(RuntimeError, match="already committed"):
            _commit(path, 3, add=[], remove=[])
        with pytest.raises(FileNotFoundError):
            txlog_read(spark, path, 9)
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_txlog_data_skipping_prunes_files(spark):
    """Data skipping: per-file min/max recorded in the commit lets the
    read path plan a scan over only the files whose range intersects
    the predicate — verified via inputFiles(), with results identical
    to the unpruned filter."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from cs744_big_data_system_spark.sources.txlog import (
        txlog_append_with_stats,
        txlog_read,
        txlog_read_skipping,
    )

    path = tempfile.mkdtemp(prefix="txlog_skip_")
    shutil.rmtree(path, ignore_errors=True)
    try:
        # three appends with disjoint id ranges → ≥3 live files whose
        # stats partition the key space
        for lo in (0, 100, 200):
            df = spark.range(lo, lo + 100).coalesce(1).selectExpr("id", "id * 3 AS v")
            txlog_append_with_stats(df, path, stats_cols=["id"])
        full = txlog_read(spark, path)
        assert len(full.inputFiles()) >= 3

        pruned = txlog_read_skipping(spark, path, "id", 120, 150)
        assert len(pruned.inputFiles()) == 1  # only the middle file
        got = sorted(r.id for r in pruned.collect())
        want = sorted(
            r.id for r in full.filter((F.col("id") >= 120) & (F.col("id") <= 150)).collect()
        )
        assert got == want == list(range(120, 151))

        # out-of-range predicate: zero files, empty but correctly typed
        empty = txlog_read_skipping(spark, path, "id", 10_000, 20_000)
        assert empty.count() == 0 and set(empty.columns) == {"id", "v"}
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_txlog_vacuum_reclaims_only_unreachable_files(spark, tmp_path):
    """VACUUM laws: retained snapshots read identically before/after;
    compacted-away and orphan files are deleted; time travel below the
    retention floor fails with a clear error, not a missing-file scan."""
    import os

    import pytest

    from cs744_big_data_system_spark.sources.txlog import (
        txlog_append,
        txlog_compact,
        txlog_read,
        txlog_vacuum,
        vacuum_floor,
    )

    t = str(tmp_path / "tbl")
    txlog_append(spark.range(0, 10).toDF("id"), t)          # v0
    txlog_append(spark.range(10, 20).toDF("id"), t)         # v1
    txlog_compact(spark, t, target_files=1)                 # v2 (rewrites v0+v1 files)
    txlog_append(spark.range(20, 25).toDF("id"), t)         # v3
    # plant a crash-orphan: staged-looking file never committed
    orphan = os.path.join(t, "part-deadbeef.parquet")
    with open(orphan, "wb") as f:
        f.write(b"not a real parquet")

    before_v2 = sorted(r.id for r in txlog_read(spark, t, version=2).collect())
    before_v3 = sorted(r.id for r in txlog_read(spark, t, version=3).collect())
    n_files_before = len([p for p in os.listdir(t) if p.endswith(".parquet")])

    deleted = txlog_vacuum(t, retain_versions=2)  # keep v2, v3

    assert vacuum_floor(t) == 2
    assert not os.path.exists(orphan)
    # the pre-compaction files (live only in v0/v1) are gone
    n_files_after = len([p for p in os.listdir(t) if p.endswith(".parquet")])
    assert n_files_after < n_files_before and deleted
    # retained snapshots unchanged
    assert sorted(r.id for r in txlog_read(spark, t, version=2).collect()) == before_v2
    assert sorted(r.id for r in txlog_read(spark, t, version=3).collect()) == before_v3
    assert sorted(r.id for r in txlog_read(spark, t).collect()) == before_v3
    # below-floor time travel is a clear refusal
    with pytest.raises(ValueError, match="retention floor"):
        txlog_read(spark, t, version=1)
    # idempotent: a second vacuum deletes nothing further
    assert txlog_vacuum(t, retain_versions=2) == []


def test_kmv_jaccard_exact_below_k_and_close_above(spark):
    """With fewer than k distinct keys per group the sketch IS the key
    set, so the estimate must equal the exact Jaccard; above k it must
    land within sketch tolerance."""
    from cs744_big_data_system_spark.operators.sketches import kmv_jaccard

    # groups A and B share 10 of 30 keys -> J = 10/50... (30+30-10)=50
    rows = [("A", i) for i in range(30)] + [("B", i) for i in range(20, 50)]
    df = spark.createDataFrame(rows, ["g", "x"])
    out = kmv_jaccard(df, key_col="x", group_col="g", k=64).collect()
    assert len(out) == 1
    r = out[0]
    assert r.j_exact == round(10 / 50, 6)
    assert r.j_est == r.j_exact  # below-k: sketch is exact

    big = [("A", i) for i in range(500)] + [("B", i) for i in range(250, 750)]
    df2 = spark.createDataFrame(big, ["g", "x"])
    r2 = kmv_jaccard(df2, key_col="x", group_col="g", k=64).collect()[0]
    assert r2.j_exact == round(250 / 750, 6)
    assert abs(r2.j_est - r2.j_exact) < 0.15, r2  # sketch tolerance at k=64
