"""Laws for the front-end batch (workloads/frontends.py): each
alternative front end must agree with the canonical DataFrame engine
path, and the operator-level semantics (collation merge, watermark
dedup) are pinned directly."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_ps_frontend_matches_dataframe_q1(spark):
    """The pandas-on-Spark Q1 must equal the DataFrame Q1 row-for-row
    (same oracle, but this pins the two ENGINE paths against each
    other, no DuckDB involved)."""
    from cs744_big_data_system_spark.workloads.frontends import q_ps_frontend_agg
    from cs744_big_data_system_spark.workloads.relational import q_agg_sums_q1

    key = lambda r: (r.l_returnflag, r.l_linestatus)  # noqa: E731
    ps_rows = {key(r): r.asDict() for r in q_ps_frontend_agg(spark, SF).collect()}
    df_rows = {key(r): r.asDict() for r in q_agg_sums_q1(spark, SF).collect()}
    assert ps_rows == df_rows


def test_sql_table_function_equals_dataframe(spark):
    """The TVF call must equal the equivalent DataFrame filter+agg."""
    from cs744_big_data_system_spark.sources.readers import load_table
    from cs744_big_data_system_spark.workloads.frontends import q_sql_table_function

    got = {
        r.o_orderpriority: (r.n_orders, r.sum_price)
        for r in q_sql_table_function(spark, SF).collect()
    }
    truth = {
        r.o_orderpriority: (r.n_orders, r.sum_price)
        for r in load_table(spark, SF, "orders")
        .filter(F.col("o_totalprice") >= 150000.0)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("sum_price"),
        )
        .collect()
    }
    assert got == truth


def test_collation_merges_case_variants(spark):
    """Under UTF8_LCASE every group must have exactly 2 binary
    variants (upper for even event_ids, raw for odd — both parities
    exist for every type at this sf), counts must partition the table,
    and the merged count must equal the per-type count."""
    from cs744_big_data_system_spark.sources.readers import load_table
    from cs744_big_data_system_spark.workloads.frontends import q_string_collation

    rows = {r.event_type_ci: r for r in q_string_collation(spark, SF).collect()}
    ev = load_table(spark, SF, "events")
    truth = {
        r.event_type: r.n for r in ev.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    assert set(rows) == set(truth)
    for t, r in rows.items():
        assert r.n_events == truth[t]
        assert r.n_variants == 2


def test_map_in_arrow_matches_python(spark):
    """The Arrow-kernel stats must equal a plain-Python computation
    over the same documents."""
    from cs744_big_data_system_spark.sources.readers import load_table
    from cs744_big_data_system_spark.workloads.frontends import q_udf_map_in_arrow

    got = {
        r.doc_id: (r.n_chars_obs, r.n_spaces)
        for r in q_udf_map_in_arrow(spark, SF).collect()
    }
    truth = {
        r.doc_id: (len(r.text), r.text.count(" "))
        for r in load_table(spark, SF, "documents").select("doc_id", "text").collect()
    }
    assert got == truth


def test_pyds_sink_commit_protocol(spark):
    """The manifest must list exactly the committed part files with
    the right row total; orphan files (failed/speculative attempts)
    in the directory are invisible to the committed read; abort()
    removes its attempt's files."""
    import json
    import os
    import shutil
    import tempfile

    from cs744_big_data_system_spark.sources.pysink import (
        FileCommit,
        JsonlSinkDataSource,
        JsonlSinkWriter,
        read_committed,
    )

    try:
        spark.dataSource.register(JsonlSinkDataSource)
    except Exception:
        pass
    path = os.path.join(tempfile.gettempdir(), f"pysink_test_{os.getpid()}")
    shutil.rmtree(path, ignore_errors=True)
    df = spark.range(100).select(F.col("id"), (F.col("id") * 2).alias("v"))
    df.repartition(4).write.format("jsonlsink").option("path", path).mode("append").save()

    with open(os.path.join(path, "_committed.json")) as f:
        manifest = json.load(f)
    parts = sorted(p for p in os.listdir(path) if p.startswith("part-"))
    assert manifest["files"] == parts and manifest["rows"] == 100

    # an orphan from a failed attempt must be invisible to readers
    with open(os.path.join(path, "part-orphan.jsonl"), "w") as f:
        f.write('{"id": 999999, "v": 0}\n')
    back = read_committed(spark, path, "id long, v long")
    assert back.count() == 100
    assert back.filter(F.col("id") == 999999).count() == 0
    assert {(r.id, r.v) for r in back.collect()} == {(i, 2 * i) for i in range(100)}

    # abort() deletes the attempt's files
    w = JsonlSinkWriter(path, ["id"])
    msg = w.write(iter([{"id": 1}]))
    assert os.path.exists(os.path.join(path, msg.file))
    w.abort([FileCommit(file=msg.file, rows=1)])
    assert not os.path.exists(os.path.join(path, msg.file))
    shutil.rmtree(path, ignore_errors=True)


def test_rocksdb_backend_is_invisible_to_results(spark):
    """The RocksDB-backed state must read back identical to the
    default provider's — the backend swap changes durability, not
    answers."""
    from cs744_big_data_system_spark.workloads.curation3 import (
        q_stream_state_inspect,
    )
    from cs744_big_data_system_spark.workloads.frontends import (
        q_stream_rocksdb_state_replay,
    )

    rocks = {
        r.event_type: (r.n_events, r.sum_value)
        for r in q_stream_rocksdb_state_replay(spark, SF).collect()
    }
    default = {
        r.event_type: (r.n_events, r.sum_value)
        for r in q_stream_state_inspect(spark, SF).collect()
    }
    assert rocks == default


def test_interpolate_linear_golden_and_laws(spark):
    """Hand-built series pins the exact interpolation; on real data
    every gap value lies within [min, max] of its neighbors and
    observed buckets equal the plain groupBy sums."""
    import datetime

    from cs744_big_data_system_spark.operators.timeseries import interpolate_linear
    from cs744_big_data_system_spark.sources.readers import load_table

    # golden: observations at hours 0 and 3 (values 1.0 and 4.0) →
    # hours 1, 2 interpolate to 2.0, 3.0 exactly (micro units)
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (1, base, "a", 1.0),
        (2, base + datetime.timedelta(hours=3), "a", 4.0),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string, value double")
    got = {
        r.bucket_hour - rows[0][1].replace(tzinfo=datetime.timezone.utc).timestamp() // 3600: (
            r.value_micro,
            r.is_interp,
        )
        for r in interpolate_linear(df).collect()
    }
    assert got == {
        0: (10000, 0),
        1: (20000, 1),
        2: (30000, 1),
        3: (40000, 0),
    }

    out = interpolate_linear(load_table(spark, SF, "events")).collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r.event_type, []).append(r)
    for rs in by_key.values():
        rs.sort(key=lambda r: r.bucket_hour)
        hours = [r.bucket_hour for r in rs]
        assert hours == list(range(hours[0], hours[-1] + 1))  # dense spine
        assert rs[0].is_interp == 0 and rs[-1].is_interp == 0  # no extrapolation
        # every interpolated value is bounded by its observed neighbors
        obs_idx = [i for i, r in enumerate(rs) if r.is_interp == 0]
        for a, b in zip(obs_idx, obs_idx[1:]):
            lo = min(rs[a].value_micro, rs[b].value_micro)
            hi = max(rs[a].value_micro, rs[b].value_micro)
            for i in range(a + 1, b):
                assert lo <= rs[i].value_micro <= hi


def test_dpp_injects_dynamic_pruning_into_fact_scan(spark):
    """The fact scan's PartitionFilters must carry a
    dynamicpruningexpression — proof pruning is decided at runtime
    from the dim side, not statically."""
    from cs744_big_data_system_spark.workloads.frontends import (
        q_dynamic_partition_pruning,
    )

    out = q_dynamic_partition_pruning(spark, SF)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruningexpression" in plan.lower(), plan[:2000]


def test_bloom_filter_injected_under_scoped_confs(spark):
    """Under the query's scoped confs the optimized plan must contain
    the runtime bloom filter (might_contain) on the application side.
    Repro'd standalone here because the query itself returns an eager
    checkpoint."""
    from pyspark.sql import functions as F

    from cs744_big_data_system_spark.sources.readers import load_table

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        li = load_table(spark, SF, "lineitem")
        sel = (
            load_table(spark, SF, "orders")
            .filter(F.col("o_orderstatus") == "P")
            .select("o_orderkey")
        )
        j = li.join(sel, li.l_orderkey == sel.o_orderkey).groupBy("l_returnflag").count()
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan.lower(), plan[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_session_timeout_equals_batch_sessionize(spark):
    """Every closed session (incl. the timeout-evicted trailing ones)
    must equal the batch gaps-and-islands sessionize; the flush
    sentinel never leaks into the output."""
    from cs744_big_data_system_spark.operators.relational import sessionize
    from cs744_big_data_system_spark.sources.readers import load_table
    from cs744_big_data_system_spark.workloads.frontends import (
        q_stream_session_timeout_replay,
    )

    got = {
        (r.user_id, r.session_start_us): (r.session_end_us, r.n_events)
        for r in q_stream_session_timeout_replay(spark, SF).collect()
    }
    assert all(u >= 0 for u, _ in got)
    ev = load_table(spark, SF, "events")
    truth = {
        (r.user_id, r.session_start_us): (r.session_end_us, r.n_events)
        for r in sessionize(ev, gap_minutes=30)
        .groupBy("user_id", "session_id")
        .agg(
            F.unix_micros(F.min("ts")).alias("session_start_us"),
            F.unix_micros(F.max("ts")).alias("session_end_us"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .collect()
    }
    assert got == truth


def test_udtf_analyze_is_polymorphic(spark):
    """One registration, schema decided by the n literal at plan time:
    width-2 gives (g0, g1), width-3 gives (g0, g1, g2); trigram counts
    reconcile with a python computation on a sample."""
    from pyspark.sql.functions import udtf

    from cs744_big_data_system_spark.workloads.frontends import _NGramsPolyUDTF

    spark.udtf.register("ngrams_poly_t", udtf(_NGramsPolyUDTF))
    two = spark.sql("SELECT * FROM ngrams_poly_t('a b c d', 2)")
    three = spark.sql("SELECT * FROM ngrams_poly_t('a b c d', 3)")
    assert two.columns == ["g0", "g1"]
    assert three.columns == ["g0", "g1", "g2"]
    assert [tuple(r) for r in two.collect()] == [("a", "b"), ("b", "c"), ("c", "d")]
    assert [tuple(r) for r in three.collect()] == [("a", "b", "c"), ("b", "c", "d")]


def test_dedup_within_watermark_collapses_total_redelivery(spark):
    """A full second delivery of the table must change nothing: the
    streamed result equals the batch aggregate over the original."""
    from cs744_big_data_system_spark.sources.readers import load_table
    from cs744_big_data_system_spark.workloads.frontends import (
        q_stream_dedup_within_watermark_replay,
    )

    got = {
        r.event_type: (r.n_events, r.sum_value)
        for r in q_stream_dedup_within_watermark_replay(spark, SF).collect()
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
