"""SparkSession factory with scale-aware defaults.

The reference hand-tuned cluster knobs per job (30g executors, 5 cores,
spill dir, partition sweeps 10..300 — assignment1/part2/task.py:8-12,
assignment1/part3/task2/task2.py:16-21, task2.sh:4). The engine instead
sets one coherent config and leans on AQE to re-plan at runtime, which
replaces the manual partition sweep (SURVEY.md §4).

Scale posture: these defaults are written for a real cluster; on
local[N] they are merely harmless. AQE coalesces small shuffle
partitions, converts sort-merge joins to broadcast when the runtime
size allows, and splits skewed partitions — the three behaviours the
reference approximated by hand.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Defaults chosen for correctness at any scale + efficiency at large scale.
ENGINE_CONF: dict[str, str] = {
    # --- Adaptive execution: runtime re-planning replaces manual tuning ---
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Broadcast small join sides (dimension tables) instead of shuffling.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # --- Python boundary: always Arrow-vectorized, never per-row pickle ---
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # --- Parquet: vectorized reads + aggressive pushdown ---
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    # Session timezone pinned so timestamp semantics match the DuckDB oracle.
    "spark.sql.session.timeZone": "UTC",
    # Fixture events.ts is TIMESTAMP(NANOS): read as ns longs (converted
    # to µs timestamps in sources.readers.load_table).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # ANSI off: engine follows classic Spark SQL nullable-on-error semantics.
    "spark.sql.ansi.enabled": "false",
}


def get_spark(
    app_name: str = "cs744-spark-engine",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32)
    for local runs; on a real cluster pass ``None`` and submit with
    ``spark-submit --master ...`` — the builder then respects the
    submit-time master.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # Never override a cluster launch with local[N]. Two launch paths
    # to detect: (a) `spark-submit app.py` — the JVM gateway already
    # exists and exports PYSPARK_GATEWAY_PORT/SECRET; (b) pyspark
    # shell / Python-launched JVM — the CLI is in PYSPARK_SUBMIT_ARGS.
    # Only a bare `python x.py` run (neither signal) defaults to
    # local[N].
    launched_by_submit = (
        "PYSPARK_GATEWAY_PORT" in os.environ
        or "--master" in os.environ.get("PYSPARK_SUBMIT_ARGS", "")
    )
    if master is None and not launched_by_submit:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # One shuffle partition per core locally; on a cluster this should
        # be ~2-3x total cores — AQE coalescing makes over-provisioning cheap.
        shuffle_partitions = cpus

    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    for k, v in ENGINE_CONF.items():
        builder = builder.config(k, v)
    builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    return builder.getOrCreate()
