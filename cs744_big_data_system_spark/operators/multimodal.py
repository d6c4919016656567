"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The decode step is STUBBED (no image/audio libraries in this
container) behind a deterministic fake — the Spark-side plumbing is
real and tested: schema contracts, Arrow batch shapes, partition-local
processing, and the UDF signatures a real decoder would drop into.

Reference anchor: the closest thing in the reference is the CIFAR-10
binary dataset source + per-sample transform pipeline
(assignment2/part1/main.py:76-95); here that becomes a binary column +
mapInPandas batch transform, which is how you run a decoder over
100 TB of media without ever leaving Arrow.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Schema for a multimodal asset table: opaque payload + typed metadata.
ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("modality", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)


def synthetic_assets(spark, n: int = 64) -> DataFrame:
    """Deterministic fake asset table (payload = repeated md5 bytes) so
    the plumbing is testable without media files."""
    return spark.range(n).select(
        F.col("id").alias("asset_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("modality"),
        F.to_binary(F.md5(F.col("id").cast("string")), F.lit("hex")).alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(32).alias("width"),
        F.lit(32).alias("height"),
        (F.col("id") * 100).alias("duration_ms"),
    )


def assets_from_documents(documents: DataFrame) -> DataFrame:
    """Derive a deterministic asset table from the documents fixture:
    payload = the 16 raw md5 bytes of the text, modality round-robins
    by doc_id. Because the payload is a pure function of fixture data,
    the whole mapInPandas decode path becomes DuckDB-oracle-checkable
    (the oracle recomputes the stub's byte math from md5 hex)."""
    return documents.select(
        F.col("doc_id").alias("asset_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("modality"),
        F.to_binary(F.md5("text"), F.lit("hex")).alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(32).alias("width"),
        F.lit(32).alias("height"),
        (F.col("doc_id") * 100).alias("duration_ms"),
    )


def _decode_stub(payload: bytes, modality: str) -> list[float]:
    """Deterministic fake 'decode + feature-extract'.

    A real deployment replaces this with PIL/torchaudio/ffmpeg frame
    sampling; everything around it (Arrow batching, schema, partition
    locality) is unchanged. Raises for unknown modalities the way a
    real decoder would.
    """
    if modality not in ("image", "audio", "video"):
        raise NotImplementedError(f"no decoder for modality {modality!r}")
    if payload is None:
        return []
    # 8 deterministic pseudo-features from byte content.
    return [float(payload[i % len(payload)]) / 255.0 for i in range(8)]


def extract_features(assets: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    mapInPandas streams RecordBatches through Python — constant memory
    per task regardless of table size; the decode parallelism is the
    partition count, so `assets.repartition(n)` is the scale knob.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_stub(p, m)
                for p, m in zip(pdf["payload"], pdf["modality"])
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return assets.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling PLAN: one row per sampled frame timestamp
    (sequence + explode, fully native); the actual pixel decode is the
    stub above. Shows the 1→N restructuring a frame sampler needs."""
    videos = assets.filter(F.col("modality") == "video")
    return videos.select(
        "asset_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
