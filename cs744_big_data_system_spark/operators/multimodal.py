"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

Real stdlib(+numpy) decoders cover PPM/PGM, 24-bit BMP, 8-bit PNG
(all five scanline filters, zlib DEFLATE), baseline JPEG (Huffman +
IDCT + chroma upsample), and PCM WAV. Formats that genuinely need
codec libraries (progressive JPEG, MP3, H.264 video) fall back to a
deterministic stub — the Spark-side plumbing is identical either way:
schema contracts, Arrow batch shapes, partition-local processing, and
the UDF signatures a native decoder would drop into.

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
    formats the container can't parse (progressive JPEG / MP3 / H.264
    — these need real codec libs; baseline JPEG, PNG, PPM/PGM, BMP and
    PCM WAV all decode for real in decode_media).

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


def _jpeg_zigzag() -> list[int]:
    """The JPEG zigzag scan as natural (row*8+col) indices, derived
    rather than transcribed: diagonal d runs bottom-left→top-right for
    even d and top-right→bottom-left for odd d (ITU T.81 Figure 5)."""
    out = []
    for d in range(15):
        rs = range(max(0, d - 7), min(d, 7) + 1)
        for r in rs if d % 2 == 1 else reversed(list(rs)):
            out.append(r * 8 + (d - r))
    return out


class _JpegMarker(Exception):
    """Raised by the bit reader when entropy data hits a marker."""


class _JpegBits:
    """MSB-first bit reader over entropy-coded data with 0xFF00 byte
    unstuffing; restart markers surface via sync_restart()."""

    def __init__(self, data: bytes, pos: int):
        self.data, self.pos, self.acc, self.n = data, pos, 0, 0

    def bit(self) -> int:
        if self.n == 0:
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1
                else:
                    raise _JpegMarker(nxt)
            self.acc, self.n = b, 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, t: int) -> int:
        v = 0
        for _ in range(t):
            v = (v << 1) | self.bit()
        return v

    def sync_restart(self) -> None:
        """Byte-align and consume the expected RSTn marker."""
        self.n = 0
        if not (
            self.data[self.pos] == 0xFF
            and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            raise ValueError("missing restart marker")
        self.pos += 2


def _jpeg_huff_decode(r: _JpegBits, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _jpeg_extend(v: int, t: int) -> int:
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def _decode_jpeg(data: bytes):
    """Parse baseline sequential JPEG (SOF0, 8-bit, Huffman, 1 or 3
    components, sampling factors ≤ 2, optional restart intervals) with
    ONLY the stdlib + numpy: marker parse → Huffman entropy decode →
    dequantize → 8x8 IDCT (one numpy matrix product per block) →
    chroma upsample → YCbCr→RGB. Returns (width, height, pixels
    [h, w, c] in 0..1) or None if not parseable baseline JPEG.

    The Huffman loop is per-bit Python — fine for fixture-sized
    images; production swaps in a native decoder behind the identical
    (w, h, px) contract (same note as the PNG filter loops).
    Progressive (SOF2) / arithmetic / 12-bit JPEGs return None."""
    import numpy as np

    if len(data) < 4 or data[:2] != b"\xff\xd8":
        return None
    try:
        qt: dict[int, "np.ndarray"] = {}
        huff: dict[tuple[int, int], dict] = {}
        frame = None  # (h, w, comps) with comps = [(cid, hs, vs, tq)]
        restart = 0
        pos = 2
        zz = _jpeg_zigzag()
        while pos + 4 <= len(data):
            if data[pos] != 0xFF:
                return None
            marker = data[pos + 1]
            if marker == 0xD9:  # EOI before SOS
                return None
            ln = int.from_bytes(data[pos + 2 : pos + 4], "big")
            seg = data[pos + 4 : pos + 2 + ln]
            if marker == 0xDB:  # DQT (possibly several tables)
                i = 0
                while i < len(seg):
                    pq, tq = seg[i] >> 4, seg[i] & 0xF
                    if pq != 0:
                        return None  # 16-bit tables: not baseline
                    tbl = np.zeros(64)
                    for k in range(64):
                        tbl[zz[k]] = seg[i + 1 + k]
                    qt[tq] = tbl.reshape(8, 8)
                    i += 65
            elif marker == 0xC4:  # DHT (possibly several tables)
                i = 0
                while i < len(seg):
                    tc, th = seg[i] >> 4, seg[i] & 0xF
                    counts = seg[i + 1 : i + 17]
                    syms = seg[i + 17 : i + 17 + sum(counts)]
                    tbl, code, si = {}, 0, 0
                    for length in range(1, 17):
                        for _ in range(counts[length - 1]):
                            tbl[(length, code)] = syms[si]
                            code += 1
                            si += 1
                        code <<= 1
                    huff[(tc, th)] = tbl
                    i += 17 + sum(counts)
            elif marker == 0xC0:  # SOF0 baseline
                if seg[0] != 8:
                    return None
                h = int.from_bytes(seg[1:3], "big")
                w = int.from_bytes(seg[3:5], "big")
                nc = seg[5]
                if nc not in (1, 3):
                    return None
                comps = []
                for c in range(nc):
                    cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                    comps.append((cid, hv >> 4, hv & 0xF, tq))
                frame = (h, w, comps)
            elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                return None  # non-baseline frame types
            elif marker == 0xDD:  # DRI
                restart = int.from_bytes(seg[0:2], "big")
            elif marker == 0xDA:  # SOS — entropy data follows
                if frame is None:
                    return None
                ns = seg[0]
                sel = {}
                for c in range(ns):
                    sel[seg[1 + 2 * c]] = (seg[2 + 2 * c] >> 4, seg[2 + 2 * c] & 0xF)
                return _jpeg_scan(
                    np, data, pos + 2 + ln, frame, sel, qt, huff, restart, zz
                )
            pos += 2 + ln
        return None
    except (IndexError, KeyError, ValueError, _JpegMarker):
        return None


def _jpeg_scan(np, data, pos, frame, sel, qt, huff, restart, zz):
    """Entropy-decode every MCU of a baseline scan and reconstruct."""
    h, w, comps = frame
    maxh = max(c[1] for c in comps)
    maxv = max(c[2] for c in comps)
    if not (1 <= maxh <= 2 and 1 <= maxv <= 2):
        return None
    mcux = (w + 8 * maxh - 1) // (8 * maxh)
    mcuy = (h + 8 * maxv - 1) // (8 * maxv)
    # IDCT basis: f = Aᵀ F A with A[u, x] = c(u)/2 · cos((2x+1)uπ/16)
    u = np.arange(8)
    A = np.cos((2 * u[None, :] + 1) * u[:, None] * np.pi / 16) / 2
    A[0, :] *= 1 / np.sqrt(2)
    planes = {
        cid: np.zeros((mcuy * vs * 8, mcux * hs * 8))
        for cid, hs, vs, _ in comps
    }
    reader = _JpegBits(data, pos)
    pred = dict.fromkeys(planes, 0)
    for m in range(mcux * mcuy):
        if restart and m and m % restart == 0:
            reader.sync_restart()
            pred = dict.fromkeys(planes, 0)
        my, mx = divmod(m, mcux)
        for cid, hs, vs, tq in comps:
            dc_tbl = huff[(0, sel[cid][0])]
            ac_tbl = huff[(1, sel[cid][1])]
            for by in range(vs):
                for bx in range(hs):
                    coef = np.zeros(64)
                    t = _jpeg_huff_decode(reader, dc_tbl)
                    pred[cid] += _jpeg_extend(reader.bits(t), t)
                    coef[0] = pred[cid]
                    k = 1
                    while k < 64:
                        rs = _jpeg_huff_decode(reader, ac_tbl)
                        run, size = rs >> 4, rs & 0xF
                        if size == 0:
                            if run == 15:  # ZRL
                                k += 16
                                continue
                            break  # EOB
                        k += run
                        if k > 63:
                            raise ValueError("AC overflow")
                        coef[zz[k]] = _jpeg_extend(reader.bits(size), size)
                        k += 1
                    block = A.T @ (coef.reshape(8, 8) * qt[tq]) @ A + 128
                    y0 = (my * vs + by) * 8
                    x0 = (mx * hs + bx) * 8
                    planes[cid][y0 : y0 + 8, x0 : x0 + 8] = block
    out = []
    for cid, hs, vs, _ in comps:
        p = planes[cid]
        if hs < maxh:
            p = np.repeat(p, maxh // hs, axis=1)
        if vs < maxv:
            p = np.repeat(p, maxv // vs, axis=0)
        out.append(p[:h, :w])
    if len(out) == 1:
        px = out[0][:, :, None]
    else:
        y, cb, cr = out
        px = np.stack(
            [
                y + 1.402 * (cr - 128),
                y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128),
                y + 1.772 * (cb - 128),
            ],
            axis=2,
        )
    return w, h, np.clip(px, 0, 255) / 255.0


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
    8-bit PNG, baseline JPEG, PCM WAV — none need codec libraries;
    progressive JPEG/MP3/video fall back to the documented stub in
    extract_features).

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
            or _decode_jpeg(bytes(payload))
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


def synthetic_ppm_assets(
    spark, n: int = 96, groups: int = 24, w: int = 16, h: int = 16
) -> DataFrame:
    """Deterministic REAL image fixture: ``n`` P6 PPM payloads whose
    16×16 pixel grid is a pure function of ``asset_id % groups`` (a
    pseudo-random 2×2-block pattern per group), with variants
    (``asset_id // groups > 0``) inverting exactly one corner block —
    so every group is a planted near-dup family (aHash hamming ≤ 2)
    while cross-group images differ in ~half their hash bits. Built in
    an Arrow batch kernel; payloads decode through the REAL PPM path.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        def block_hi(base: int, cx: int, cy: int) -> bool:
            # md5-mixed per (family, block): families get effectively
            # independent patterns (a linear formula here aliased
            # families whose bases were congruent mod the modulus)
            d = hashlib.md5(f"ppm:{base}:{cx}:{cy}".encode()).digest()
            return d[0] < 102  # ~40% bright blocks

        for pdf in batches:
            payloads = []
            for aid in pdf["id"]:
                base, var = int(aid) % groups, int(aid) // groups
                header = f"P6\n{w} {h}\n255\n".encode()
                px = bytearray()
                for y in range(h):
                    for x in range(w):
                        hi = block_hi(base, x // 2, y // 2)
                        if var > 0 and x < 2 and y < 2:
                            hi = not hi  # variant: invert one block
                        v = 200 if hi else 50
                        px += bytes((v, v, v))
                payloads.append(header + bytes(px))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["id"],
                    "modality": ["image"] * len(pdf),
                    "payload": payloads,
                }
            )

    return spark.range(n).mapInPandas(
        gen, schema="asset_id long, modality string, payload binary"
    )


def image_ahash(assets: DataFrame, hash_dim: int = 8) -> DataFrame:
    """64-bit average-hash per decodable image: REAL decode
    (PPM/PGM/BMP/PNG/baseline-JPEG), grayscale, nearest-neighbor
    resample to ``hash_dim``², threshold at the mean — bit i set when
    cell i is brighter than average. The standard perceptual
    fingerprint for image near-dup screening: resize/re-encode
    invariant, one int64 per image.

    Arrow-batched mapInPandas; rows whose payload doesn't decode are
    dropped (they can't be compared perceptually). Scale shape: pure
    scan-side batch work, the corpus never shuffles here.
    """
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                if payload is None:
                    continue
                img = (
                    _decode_ppm(bytes(payload))
                    or _decode_bmp(bytes(payload))
                    or _decode_png(bytes(payload))
                    or _decode_jpeg(bytes(payload))
                )
                if img is None:
                    continue
                iw, ih, px = img
                gray = px.mean(axis=2)
                ys = (np.arange(hash_dim) * ih) // hash_dim
                xs = (np.arange(hash_dim) * iw) // hash_dim
                cells = gray[np.ix_(ys, xs)]
                bits = (cells > cells.mean()).flatten()
                hval = 0
                for i, b in enumerate(bits):
                    if b:
                        hval |= 1 << i
                ids.append(aid)
                hashes.append(np.int64(hval - (1 << 64) if hval >= 1 << 63 else hval))
            yield pd.DataFrame({"asset_id": ids, "phash": hashes})

    return assets.mapInPandas(run, schema="asset_id long, phash long")


def image_neardup_pairs(
    assets: DataFrame, max_hamming: int = 6, bands: int = 4
) -> DataFrame:
    """Perceptual image near-dup pairs: aHash fingerprints, banded by
    16-bit slices (pigeonhole: hamming ≤ 6 over 64 bits ⇒ at least one
    of 4 bands is IDENTICAL — same guarantee as the SimHash text
    screen), candidates from band-bucket collisions, verified by exact
    popcount hamming. Returns (asset_a, asset_b, hamming).

    Scale shape: the self-join key is (band_idx, 16-bit slice) —
    cardinality grows with the corpus, per-bucket fan-out stays
    bounded for natural image sets; the verify is a bit_count on the
    candidate pairs only. No all-pairs comparison at any size.
    """
    h = image_ahash(assets)
    slices = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.shiftrightunsigned(F.col("phash"), 16 * b)
                .bitwiseAND(F.lit(0xFFFF))
                .alias("band_val"),
            )
            for b in range(bands)
        ]
    )
    banded = h.select(
        "asset_id", "phash", F.explode(slices).alias("b")
    ).select("asset_id", "phash", "b.band_idx", "b.band_val")
    left = banded.select(
        F.col("asset_id").alias("asset_a"),
        F.col("phash").alias("ph_a"),
        "band_idx",
        "band_val",
    )
    right = banded.select(
        F.col("asset_id").alias("asset_b"),
        F.col("phash").alias("ph_b"),
        "band_idx",
        "band_val",
    )
    cand = (
        left.join(right, ["band_idx", "band_val"])
        .filter(F.col("asset_a") < F.col("asset_b"))
        .select("asset_a", "asset_b", "ph_a", "ph_b")
        .distinct()
    )
    return (
        cand.select(
            "asset_a",
            "asset_b",
            F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )
