"""Streaming fault tolerance: a stopped query restarted from its
checkpoint resumes the state store and source offsets — the streaming
counterpart of the PageRank cache-loss recovery test (reference
fault-tolerance parity: assignment1/part3/task4 kills a worker
mid-job and relies on lineage; Structured Streaming's recovery unit
is the checkpoint)."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F


def _stage_wave(df, stage, idx):
    tmp = os.path.join(stage, f"_stage{idx}")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = next(
        p for p in os.listdir(tmp) if p.startswith("part-") and p.endswith(".parquet")
    )
    dst = os.path.join(stage, f"wave{idx}.parquet")
    shutil.move(os.path.join(tmp, part), dst)
    shutil.rmtree(tmp)
    mtime = 1_700_000_000 + 100 * idx
    os.utime(dst, (mtime, mtime))


def _run_counts(spark, stage, ckpt, outdir):
    """One availableNow run writing update rows via foreachBatch to
    batchId-keyed parquet dirs — the idempotent exactly-once sink
    pattern (a replayed batch overwrites its own directory instead of
    appending duplicates). The memory sink can't do this: it refuses
    checkpoint recovery outright."""
    schema = spark.read.parquet(os.path.join(stage, "wave0.parquet")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "wave*.parquet")
        .parquet(stage)
    )
    out = stream.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))

    def sink(batch_df, batch_id):
        batch_df.write.mode("overwrite").parquet(
            os.path.join(outdir, f"batch={batch_id}")
        )

    q = (
        out.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    batches = sorted(os.listdir(outdir))
    latest = {}
    for b in batches:  # later batches overwrite earlier keys
        for r in spark.read.parquet(os.path.join(outdir, b)).collect():
            latest[r.user_id] = r.n
    return latest, set(batches)


def test_restarted_query_resumes_state_and_offsets(spark):
    from cs744_big_data_system_spark.sources.readers import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events").select("user_id", "event_id")
    stage = tempfile.mkdtemp(prefix="restart_stage_")
    ckpt = tempfile.mkdtemp(prefix="restart_ckpt_")
    out1 = tempfile.mkdtemp(prefix="restart_out1_")
    out2 = tempfile.mkdtemp(prefix="restart_out2_")
    try:
        wave0 = ev.filter(F.col("user_id") < 8)
        wave1 = ev.filter(F.col("user_id") >= 4)
        _stage_wave(wave0, stage, 0)

        run1, batches1 = _run_counts(spark, stage, ckpt, out1)
        want0 = {r.user_id: r.n for r in wave0.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()}
        assert run1 == want0

        # Simulate failure + restart: the first query object is gone;
        # a brand-new query starts from the SAME checkpoint after more
        # data arrived.
        _stage_wave(wave1, stage, 1)
        run2, batches2 = _run_counts(spark, stage, ckpt, out2)

        # Offsets resumed: wave0's batch ids are not re-emitted, and
        # the second run only updates keys present in wave1.
        assert not (batches1 & batches2), (batches1, batches2)
        wave1_users = {r.user_id for r in wave1.select("user_id").distinct().collect()}
        assert set(run2) == wave1_users

        # State resumed: overlapping keys carry wave0's counts forward.
        total = {
            r.user_id: r.n
            for r in wave0.unionByName(wave1)
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        for u in wave1_users:
            assert run2[u] == total[u], (u, run2[u], total[u])
    finally:
        for d in (stage, ckpt, out1, out2):
            shutil.rmtree(d, ignore_errors=True)
