"""Baseline-JPEG decoder tests: a minimal test-side ENCODER (FDCT +
quantize + canonical Huffman; tables embedded in the stream, as the
format requires) produces real baseline JPEGs, and the production
decoder (operators/multimodal._decode_jpeg) must reconstruct the
pixels within quantization error — 4:4:4 and 4:2:0, gray and color,
non-multiple-of-8 sizes, restart intervals, and reject paths.

The encoder lives here (tests only) on purpose: the engine never needs
to WRITE JPEG, and keeping it out of the package keeps the production
surface honest."""

from __future__ import annotations

import numpy as np
import pytest

from cs744_big_data_system_spark.operators.multimodal import (
    _decode_jpeg,
    _jpeg_zigzag,
    decode_media,
)

# --- minimal baseline encoder -------------------------------------------

_Q = np.full((8, 8), 8.0)  # flat mild quant table (valid; stream-embedded)

# canonical Huffman tables: DC = twelve 4-bit codes (categories 0..11),
# AC = all 162 run/size symbols at 8 bits — legal (prefix-free,
# incomplete) tables; real Annex-K tables are just a compression win.
_DC_SYMS = list(range(12))
_AC_SYMS = [(r << 4) | s for r in range(16) for s in range(1, 11)] + [0x00, 0xF0]
_DC_CODE = {s: (4, i) for i, s in enumerate(_DC_SYMS)}
_AC_CODE = {s: (8, i) for i, s in enumerate(_AC_SYMS)}


class _BitWriter:
    def __init__(self):
        self.out, self.acc, self.n = bytearray(), 0, 0

    def put(self, code: int, length: int) -> None:
        for i in reversed(range(length)):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc, self.n = 0, 0

    def pad(self) -> None:
        while self.n:
            self.put(1, 1)


def _dht_segment(tc: int, th: int, syms: list[int], length: int) -> bytes:
    counts = [0] * 16
    counts[length - 1] = len(syms)
    return bytes([0xFF, 0xC4]) + (3 + 16 + len(syms)).to_bytes(2, "big") + bytes(
        [(tc << 4) | th, *counts, *syms]
    )


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _encode_block(bw: _BitWriter, coef_zz: np.ndarray, pred: int) -> int:
    dc = int(coef_zz[0])
    diff = dc - pred
    t = _category(diff)
    ln, code = _DC_CODE[t]
    bw.put(code, ln)
    if t:
        bw.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
    last_nz = max((k for k in range(1, 64) if coef_zz[k]), default=0)
    k = 1
    while k <= last_nz:
        run = 0
        while coef_zz[k] == 0:
            run += 1
            k += 1
        while run >= 16:
            ln, code = _AC_CODE[0xF0]
            bw.put(code, ln)
            run -= 16
        v = int(coef_zz[k])
        s = _category(v)
        ln, code = _AC_CODE[(run << 4) | s]
        bw.put(code, ln)
        bw.put(v if v >= 0 else v + (1 << s) - 1, s)
        k += 1
    if last_nz < 63:
        ln, code = _AC_CODE[0x00]
        bw.put(code, ln)
    return dc


def encode_jpeg(px: np.ndarray, subsample: bool = False, restart: int = 0) -> bytes:
    """px: uint8 [h, w] gray or [h, w, 3] RGB → baseline JPEG bytes."""
    gray = px.ndim == 2
    h, w = px.shape[:2]
    u = np.arange(8)
    A = np.cos((2 * u[None, :] + 1) * u[:, None] * np.pi / 16) / 2
    A[0, :] *= 1 / np.sqrt(2)
    zz = _jpeg_zigzag()

    if gray:
        comps = [(1, 1, 1, 0)]
        planes = {1: px.astype(np.float64)}
    else:
        r, g, b = (px[:, :, i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128
        s = 2 if subsample else 1
        comps = [(1, s, s, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
        planes = {1: y, 2: cb, 3: cr}
    maxh = max(c[1] for c in comps)
    maxv = max(c[2] for c in comps)
    mcux = (w + 8 * maxh - 1) // (8 * maxh)
    mcuy = (h + 8 * maxv - 1) // (8 * maxv)
    padded = {}
    for cid, hs, vs, _ in comps:
        p = planes[cid]
        # pad to full-MCU size by edge replication, then downsample
        ph, pw = mcuy * 8 * maxv, mcux * 8 * maxh
        p = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
        fy, fx = maxv // vs, maxh // hs
        if fy > 1 or fx > 1:
            p = p.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))
        padded[cid] = p

    bw = _BitWriter()
    pred = {cid: 0 for cid, *_ in comps}
    n_rst = 0
    for m in range(mcux * mcuy):
        if restart and m and m % restart == 0:
            bw.pad()
            bw.out += bytes([0xFF, 0xD0 + (n_rst % 8)])
            n_rst += 1
            pred = {cid: 0 for cid, *_ in comps}
        my, mx = divmod(m, mcux)
        for cid, hs, vs, tq in comps:
            for by in range(vs):
                for bx in range(hs):
                    y0, x0 = (my * vs + by) * 8, (mx * hs + bx) * 8
                    blk = padded[cid][y0 : y0 + 8, x0 : x0 + 8] - 128
                    F = A @ blk @ A.T
                    q = np.round(F / _Q).astype(int)
                    pred[cid] = _encode_block(bw, q.flatten()[zz], pred[cid])
    bw.pad()

    out = bytearray(b"\xff\xd8")  # SOI
    for tq in sorted({c[3] for c in comps}):
        zz_q = np.empty(64, dtype=int)
        for k in range(64):
            zz_q[k] = int(_Q.flatten()[zz[k]])
        out += bytes([0xFF, 0xDB]) + (67).to_bytes(2, "big") + bytes([tq, *zz_q])
    nc = len(comps)
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([nc])
    for cid, hs, vs, tq in comps:
        sof += bytes([cid, (hs << 4) | vs, tq])
    out += bytes([0xFF, 0xC0]) + (2 + len(sof)).to_bytes(2, "big") + sof
    out += _dht_segment(0, 0, _DC_SYMS, 4)
    out += _dht_segment(1, 0, _AC_SYMS, 8)
    if restart:
        out += bytes([0xFF, 0xDD, 0x00, 0x04]) + restart.to_bytes(2, "big")
    sos = bytes([nc])
    for cid, *_ in comps:
        sos += bytes([cid, 0x00])  # every component uses table pair 0
    sos += bytes([0, 63, 0])
    out += bytes([0xFF, 0xDA]) + (2 + len(sos)).to_bytes(2, "big") + sos
    out += bw.out + bytes([0xFF, 0xD9])  # EOI
    return bytes(out)


# --- fixtures -------------------------------------------------------------


def _gradient_rgb(h: int, w: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    r = (xx * 255 / max(w - 1, 1)).astype(np.uint8)
    g = (yy * 255 / max(h - 1, 1)).astype(np.uint8)
    b = ((xx + yy) * 255 / max(h + w - 2, 1)).astype(np.uint8)
    return np.stack([r, g, b], axis=2)


# --- tests ----------------------------------------------------------------


def test_jpeg_roundtrip_color_444():
    img = _gradient_rgb(16, 24)
    out = _decode_jpeg(encode_jpeg(img))
    assert out is not None
    w, h, px = out
    assert (w, h) == (24, 16) and px.shape == (16, 24, 3)
    err = np.abs(px - img.astype(np.float64) / 255.0).max()
    assert err < 0.06, err  # flat q=8 table → ≤ ~4/255 per coeff


def test_jpeg_roundtrip_gray_non_multiple_of_8():
    yy, xx = np.mgrid[0:12, 0:20]
    img = ((xx * 7 + yy * 11) % 256).astype(np.uint8)
    out = _decode_jpeg(encode_jpeg(img))
    assert out is not None
    w, h, px = out
    assert (w, h) == (20, 12) and px.shape == (12, 20, 1)
    err = np.abs(px[:, :, 0] - img / 255.0).max()
    assert err < 0.25, err  # high-frequency pattern: bounded, not tight


def test_jpeg_roundtrip_color_420_subsampled():
    img = _gradient_rgb(32, 32)
    out = _decode_jpeg(encode_jpeg(img, subsample=True))
    assert out is not None
    w, h, px = out
    assert (w, h) == (32, 32)
    ref = img.astype(np.float64) / 255.0
    # luma survives subsampling exactly; chroma is 2x2-averaged
    assert np.abs(px.mean(axis=2) - ref.mean(axis=2)).max() < 0.08
    assert np.abs(px - ref).max() < 0.2

def test_jpeg_restart_markers_equal_plain_encoding():
    img = _gradient_rgb(24, 40)
    plain = _decode_jpeg(encode_jpeg(img))
    rst = _decode_jpeg(encode_jpeg(img, restart=2))
    assert plain is not None and rst is not None
    assert np.array_equal(plain[2], rst[2])  # same coefficients


def test_jpeg_rejects_garbage_and_progressive():
    assert _decode_jpeg(b"\xff\xd8\x00\x00") is None
    assert _decode_jpeg(b"not a jpeg") is None
    good = bytearray(encode_jpeg(_gradient_rgb(8, 8)))
    good[good.index(0xC0, 2, 200) if 0xC0 in good[2:200] else 0] = 0xC0  # no-op
    # flip SOF0 → SOF2 (progressive): decoder must bail, not crash
    i = bytes(good).find(b"\xff\xc0")
    prog = bytes(good[:i]) + b"\xff\xc2" + bytes(good[i + 2 :])
    assert _decode_jpeg(prog) is None
    assert _decode_jpeg(bytes(good)[:40]) is None  # truncated


def test_decode_media_tags_jpeg_as_real_image_decode():
    img = _gradient_rgb(16, 16)
    feats = decode_media(encode_jpeg(img), "image")
    assert feats is not None and feats[0] == 1.0  # real-decode tag
    assert abs(feats[7] - 1.0) < 1e-9  # aspect ratio w/h
    ref = img.astype(np.float64) / 255.0
    assert abs(feats[3] - ref[:, :, 0].mean()) < 0.02  # mean R


def test_jpeg_end_to_end_binaryfile_to_features(spark, tmp_path):
    """Spark-side leg: a real baseline JPEG written to disk flows
    binaryFile → ASSET_SCHEMA → extract_features (Arrow-batched
    mapInPandas) and comes out tagged as a REAL image decode with the
    right means/aspect — the same end-to-end contract the PPM/BMP/WAV
    formats already pin."""
    import hashlib

    from cs744_big_data_system_spark.operators.multimodal import extract_features
    from cs744_big_data_system_spark.sources.readers import read_binary_assets

    img = np.zeros((16, 32, 3), dtype=np.uint8)
    img[:, :16, 0] = 255  # left half red
    img[:, 16:, 2] = 255  # right half blue
    (tmp_path / "img.jpg").write_bytes(encode_jpeg(img))
    assets = read_binary_assets(spark, str(tmp_path), glob="*.jpg")
    feats = extract_features(assets).collect()
    assert len(feats) == 1
    aid = int(hashlib.md5(f"file:{tmp_path}/img.jpg".encode()).hexdigest()[:15], 16)
    f = feats[0]
    assert f.asset_id == aid and f.modality == "image"
    v = f.feature
    assert v[0] == 1.0                      # real-decode tag, not the stub
    assert abs(v[7] - 2.0) < 1e-6           # aspect 32/16
    assert abs(v[3] - 0.5) < 0.02           # mean R ~0.5
    assert abs(v[5] - 0.5) < 0.02           # mean B ~0.5
    assert v[4] < 0.1                       # mean G ~0 (4:4:4, mild q)
