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
    """Deterministic fake 'decode + feature-extract' for payloads in
    formats the container can't parse (JPEG/MP3/H.264 — no codec libs).

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


def _decode_ppm(data: bytes):
    """Parse binary PPM (P6) / PGM (P5): (width, height, pixel ndarray
    [h, w, channels] in 0..1) or None if not a parseable PPM/PGM."""
    import numpy as np

    if len(data) < 10 or data[:2] not in (b"P6", b"P5"):
        return None
    channels = 3 if data[:2] == b"P6" else 1
    # Header: magic, width, height, maxval — whitespace/comment separated.
    fields, pos = [], 2
    while len(fields) < 3 and pos < len(data):
        c = data[pos : pos + 1]
        if c.isspace():
            pos += 1
        elif c == b"#":
            pos = data.find(b"\n", pos)
            if pos < 0:
                return None
        elif c.isdigit():
            end = pos
            while end < len(data) and data[end : end + 1].isdigit():
                end += 1
            fields.append(int(data[pos:end]))
            pos = end
        else:
            return None
    if len(fields) < 3 or not data[pos : pos + 1].isspace():
        return None
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if not (0 < w and 0 < h and 0 < maxval < 256):
        return None
    need = w * h * channels
    if len(data) - pos < need:
        return None
    px = np.frombuffer(data, dtype=np.uint8, count=need, offset=pos)
    return w, h, px.reshape(h, w, channels).astype(np.float64) / maxval


def _decode_png(data: bytes):
    """Parse non-interlaced 8-bit-depth PNG (gray / gray+alpha / RGB /
    RGBA) with ONLY the stdlib: PNG's sole compression is DEFLATE
    (zlib) and the five scanline filters are plain byte arithmetic, so
    a real web image format round-trips without codec libraries.
    Returns (width, height, pixel ndarray [h, w, c] in 0..1, alpha
    dropped) or None if not parseable.

    The Sub/Average/Paeth filters run as per-byte Python loops — fine
    for fixture-sized images; a production path swaps this decoder for
    a native one, keeping the identical (w, h, px) contract."""
    import struct
    import zlib

    import numpy as np

    if len(data) < 33 or not data.startswith(b"\x89PNG\r\n\x1a\n"):
        return None
    pos, idat = 8, b""
    w = h = channels = interlace = None
    while pos + 8 <= len(data):
        (ln,), typ = struct.unpack(">I", data[pos : pos + 4]), data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + ln]
        if typ == b"IHDR":
            if ln != 13:
                return None
            w, h, bitd, ct, _comp, _filt, interlace = struct.unpack(">IIBBBBB", chunk)
            channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(ct)
            if bitd != 8 or channels is None or interlace != 0:
                return None
        elif typ == b"IDAT":
            idat += chunk
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if not w or not h or channels is None:
        return None
    try:
        raw = zlib.decompress(idat)
    except zlib.error:
        return None
    stride, bpp = w * channels, channels
    if len(raw) < h * (stride + 1):
        return None
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    p = 0
    for y in range(h):
        f = raw[p]
        line = np.frombuffer(raw, np.uint8, stride, p + 1).astype(np.int32)
        p += stride + 1
        if f == 0:
            pass
        elif f == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif f == 2:  # Up
            line = (line + prev) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((int(a) + int(prev[i])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = int(line[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                pp = a + b - c
                pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        else:
            return None
        out[y] = line
        prev = line
    px = out.reshape(h, w, channels)
    if channels == 2:  # gray + alpha → gray
        px = px[:, :, :1]
    elif channels == 4:  # RGBA → RGB
        px = px[:, :, :3]
    return w, h, px.astype(np.float64) / 255.0


def _decode_bmp(data: bytes):
    """Parse uncompressed 24-bit BMP (BITMAPINFOHEADER): (width,
    height, pixels [h, w, 3] RGB in 0..1) or None."""
    import struct

    import numpy as np

    if len(data) < 54 or data[:2] != b"BM":
        return None
    try:
        pixel_off = struct.unpack_from("<I", data, 10)[0]
        hdr_size, w, h = struct.unpack_from("<Iii", data, 14)
        planes, bpp = struct.unpack_from("<HH", data, 26)
        compression = struct.unpack_from("<I", data, 30)[0]
    except struct.error:
        return None
    if hdr_size < 40 or planes != 1 or bpp != 24 or compression != 0:
        return None
    bottom_up = h > 0
    h = abs(h)
    if w <= 0 or h <= 0:
        return None
    stride = (w * 3 + 3) & ~3  # rows padded to 4 bytes
    if len(data) < pixel_off + stride * h:
        return None
    rows = np.frombuffer(
        data, dtype=np.uint8, count=stride * h, offset=pixel_off
    ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    return w, h, rows[:, :, ::-1].astype(np.float64) / 255.0  # BGR → RGB


def _decode_wav(data: bytes):
    """Parse PCM WAV via the stdlib ``wave`` module: (n_channels,
    sample_rate, samples ndarray in [-1, 1]) or None."""
    import io
    import wave

    import numpy as np

    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    try:
        with wave.open(io.BytesIO(data)) as wf:
            nch, sw, rate, nframes = (
                wf.getnchannels(), wf.getsampwidth(), wf.getframerate(), wf.getnframes(),
            )
            raw = wf.readframes(nframes)
    except (wave.Error, EOFError):
        return None
    if sw == 2:
        samples = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif sw == 1:
        samples = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        return None
    return nch, rate, samples


def decode_media(payload: bytes, modality: str) -> list[float] | None:
    """REAL stdlib decode → 8 features, or None when the payload isn't
    one of the container-parseable formats (PPM/PGM, 24-bit BMP,
    8-bit PNG, PCM WAV — none need codec libraries; JPEG/MP3/video
    fall back to the documented stub in extract_features).

    Image features: [1, w/4096, h/4096, mean R, mean G, mean B,
    grayscale std, aspect w/h]. Audio features: [2, channels,
    rate/48000, duration s, RMS, mean, zero-crossing rate, peak].
    The leading tag separates decoded-image/audio from stub vectors
    (whose entries are all byte fractions)."""
    import numpy as np

    if payload is None or modality not in ("image", "audio", "video"):
        return None
    if modality == "image":
        img = (
            _decode_ppm(bytes(payload))
            or _decode_bmp(bytes(payload))
            or _decode_png(bytes(payload))
        )
        if img is None:
            return None
        w, h, px = img
        if px.shape[2] == 1:
            px = np.repeat(px, 3, axis=2)
        gray = px.mean(axis=2)
        return [
            1.0, w / 4096.0, h / 4096.0,
            float(px[:, :, 0].mean()), float(px[:, :, 1].mean()),
            float(px[:, :, 2].mean()), float(gray.std()), w / h,
        ]
    if modality == "audio":
        wav = _decode_wav(bytes(payload))
        if wav is None:
            return None
        nch, rate, s = wav
        if len(s) == 0:
            return [2.0, float(nch), rate / 48000.0, 0.0, 0.0, 0.0, 0.0, 0.0]
        zcr = float(np.mean(np.signbit(s[:-1]) != np.signbit(s[1:]))) if len(s) > 1 else 0.0
        return [
            2.0, float(nch), rate / 48000.0, len(s) / nch / rate,
            float(np.sqrt(np.mean(s * s))), float(s.mean()), zcr,
            float(np.abs(s).max()),
        ]
    return None  # video containers need real demuxers — always stubbed


def extract_features(assets: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    mapInPandas streams RecordBatches through Python — constant memory
    per task regardless of table size; the decode parallelism is the
    partition count, so `assets.repartition(n)` is the scale knob.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # Real stdlib decode where the format allows (PPM/PGM, BMP,
            # PCM WAV); deterministic stub for codec-library formats.
            feats = [
                decode_media(p, m) or _decode_stub(p, m)
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


RESIZED_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("resized", BinaryType(), True),  # PPM (P6) bytes
    ]
)


def resize_images(assets: DataFrame, out_w: int = 8, out_h: int = 8) -> DataFrame:
    """Decode-and-resize over the payload column: images in the
    stdlib-decodable formats (PPM/PGM, 24-bit BMP, 8-bit PNG) are nearest-neighbor
    resampled to (out_w, out_h) and re-encoded as canonical binary PPM;
    undecodable or non-image payloads yield NULLs (rows are preserved —
    filter on ``resized IS NOT NULL`` for the usable set).

    Same Arrow-batched mapInPandas shape as extract_features: constant
    memory per task, decode parallelism = partition count. Nearest
    neighbor (not area averaging) keeps the op exactly reproducible in
    integer math — the property every deterministic-pipeline stage here
    shares.
    """
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows = {"asset_id": [], "width": [], "height": [], "resized": []}
            for aid, payload, modality in zip(
                pdf["asset_id"], pdf["payload"], pdf["modality"]
            ):
                img = None
                if modality == "image" and payload is not None:
                    img = (
                        _decode_ppm(bytes(payload))
                        or _decode_bmp(bytes(payload))
                        or _decode_png(bytes(payload))
                    )
                out_rows["asset_id"].append(aid)
                if img is None:
                    out_rows["width"].append(None)
                    out_rows["height"].append(None)
                    out_rows["resized"].append(None)
                    continue
                w, h, px = img
                if px.shape[2] == 1:
                    px = np.repeat(px, 3, axis=2)
                ys = (np.arange(out_h) * h) // out_h
                xs = (np.arange(out_w) * w) // out_w
                small = (px[ys][:, xs] * 255.0 + 0.5).astype(np.uint8)
                ppm = b"P6\n%d %d\n255\n" % (out_w, out_h) + small.tobytes()
                out_rows["width"].append(out_w)
                out_rows["height"].append(out_h)
                out_rows["resized"].append(ppm)
            yield pd.DataFrame(out_rows)

    return assets.mapInPandas(run, schema=RESIZED_SCHEMA)


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
