"""Baseline JPEG decoder — verified two independent ways.

1. A spec-direct test ENCODER (ITU-T T.81 Annex K quant + Huffman tables,
   direct-formula forward DCT, its own bit writer) encodes known rasters;
   the decoder must recover them within quantization error. Encoder and
   decoder share only the published spec — the encoder below builds its
   Huffman codes, zigzag, and DCT from the spec text independently of the
   decoder's implementation (matrix IDCT vs direct-sum FDCT, LUT-free
   canonical code assignment vs dict).
2. Real-world JPEG files that ship with the container's Python/IPython
   installations (written by real encoders years before this repo) must
   decode to the right dimensions with plausible content.

Covers: grayscale, YCbCr 4:4:4, YCbCr 4:2:0 (2x2 luma sampling), restart
markers (DRI/RSTn), multi-table DHT segments.
"""

import os
import struct

import numpy as np
import pytest

from llm_text_to_knowledge_graph_spark.operators.multimodal import (
    decode_jpeg,
    decode_media,
)

# --- ITU-T T.81 Annex K tables (published spec constants) -------------------

K1_LUMA_QT = [
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
]
K2_CHROMA_QT = [
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
]
# (counts[16], symbols) per Annex K.3
DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
        0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
        0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
        0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
        0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
        0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
        0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
        0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
        0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
        0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _codes(counts, symbols):
    """Canonical Huffman code assignment per T.81 Annex C (encoder side:
    symbol -> (code, length))."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            out[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code, length):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self):
        while self.n:
            self.write(1, 1)  # 1-fill padding per spec


def _fdct(block):
    """Direct-sum forward DCT (spec formula A.3.3), independent of the
    decoder's matrix IDCT."""
    out = np.zeros((8, 8))
    for u in range(8):
        for v in range(8):
            cu = 1 / np.sqrt(2) if u == 0 else 1.0
            cv = 1 / np.sqrt(2) if v == 0 else 1.0
            s = 0.0
            for x in range(8):
                for y in range(8):
                    s += (
                        block[y, x]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            out[v, u] = 0.25 * cu * cv * s
    return out


def _magnitude(v):
    """(size, amplitude-bits) for a signed coefficient per spec F.1.2.1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = a.bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1)


def _encode_block(writer, block, qtable, dc_codes, ac_codes, pred):
    coef = _fdct(block - 128.0)
    qz = np.zeros(64, dtype=np.int32)
    flat = coef.flatten()
    qnat = np.array(qtable, dtype=np.float64)  # qtable given in zigzag order
    for k in range(64):
        qz[k] = int(np.round(flat[ZIGZAG[k]] / qnat[k]))
    diff = int(qz[0]) - pred
    s, bits = _magnitude(diff)
    c, ln = dc_codes[s]
    writer.write(c, ln)
    if s:
        writer.write(bits, s)
    run = 0
    last_nz = max([k for k in range(1, 64) if qz[k]], default=0)
    for k in range(1, 64):
        if k > last_nz:
            c, ln = ac_codes[0x00]  # EOB
            writer.write(c, ln)
            break
        if qz[k] == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_codes[0xF0]  # ZRL
            writer.write(c, ln)
            run -= 16
        s, bits = _magnitude(int(qz[k]))
        c, ln = ac_codes[(run << 4) | s]
        writer.write(c, ln)
        writer.write(bits, s)
        run = 0
    return int(qz[0])


def _seg(marker, body):
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _dht_body(tc, th, table):
    counts, symbols = table
    return bytes([(tc << 4) | th]) + bytes(counts) + bytes(symbols)


def encode_jpeg(img, subsample=False, restart_interval=0):
    """Spec-direct baseline JPEG encoder (test-side). img: (H, W) gray or
    (H, W, 3) RGB uint8. subsample=True -> 4:2:0; else 4:4:4/grayscale."""
    img = np.asarray(img, dtype=np.float64)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + bytes(K1_LUMA_QT))
    if not gray:
        out += _seg(0xDB, bytes([0x01]) + bytes(K2_CHROMA_QT))
    if gray:
        comps = [(1, 1, 1, 0)]
    elif subsample:
        comps = [(1, 2, 2, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
    else:
        comps = [(1, 1, 1, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, ch, cv, tq in comps:
        sof += bytes([cid, (ch << 4) | cv, tq])
    out += _seg(0xC0, sof)
    out += _seg(0xC4, _dht_body(0, 0, DC_LUMA) + _dht_body(1, 0, AC_LUMA))
    if not gray:
        out += _seg(0xC4, _dht_body(0, 1, DC_CHROMA) + _dht_body(1, 1, AC_CHROMA))
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([len(comps)])
    for cid, *_ in comps:
        td_ta = 0x00 if cid == 1 else 0x11
        sos += bytes([cid, td_ta])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    if gray:
        planes = {1: img}
    else:
        ycc = np.zeros_like(img)
        r, g, b = img[..., 0], img[..., 1], img[..., 2]
        ycc[..., 0] = 0.299 * r + 0.587 * g + 0.114 * b
        ycc[..., 1] = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        ycc[..., 2] = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        planes = {1: ycc[..., 0], 2: ycc[..., 1], 3: ycc[..., 2]}
        if subsample:
            for cid in (2, 3):
                p = planes[cid]
                ph = (h + 1) // 2 * 2
                pw = (w + 1) // 2 * 2
                pad = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
                planes[cid] = (
                    pad.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
                )

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    dc_tabs = {1: _codes(*DC_LUMA)}
    ac_tabs = {1: _codes(*AC_LUMA)}
    for cid in (2, 3):
        dc_tabs[cid] = _codes(*DC_CHROMA)
        ac_tabs[cid] = _codes(*AC_CHROMA)
    qts = {0: K1_LUMA_QT, 1: K2_CHROMA_QT}
    # pad each plane to its own MCU-aligned size
    padded = {}
    for cid, ch, cv, _tq in comps:
        p = planes[cid]
        th_, tw_ = mcuy * cv * 8, mcux * ch * 8
        padded[cid] = np.pad(
            p, ((0, th_ - p.shape[0]), (0, tw_ - p.shape[1])), mode="edge"
        )
    writer = _BitWriter()
    pred = {cid: 0 for cid, *_ in comps}
    rst = 0
    mcu_i = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                writer.flush()
                writer.out += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                pred = {cid: 0 for cid, *_ in comps}
            mcu_i += 1
            for cid, ch, cv, tq in comps:
                for by in range(cv):
                    for bx in range(ch):
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        block = padded[cid][y0: y0 + 8, x0: x0 + 8]
                        pred[cid] = _encode_block(
                            writer, block, qts[tq], dc_tabs[cid], ac_tabs[cid],
                            pred[cid],
                        )
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"
    return bytes(out)


def _smooth_image(h, w, channels=3, seed=7):
    """Low-frequency random raster (quantization-friendly)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    chans = []
    for _c in range(channels):
        a, b, c = rng.uniform(60, 196, 3)
        fy, fx = rng.uniform(0.02, 0.08, 2)
        chans.append(a + (b - a) * 0.5 * (1 + np.sin(fy * yy + fx * xx + c)))
    arr = np.stack(chans, axis=2) if channels > 1 else chans[0]
    return np.clip(arr, 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------


def test_gray_solid():
    img = np.full((8, 8), 130, dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(img))
    assert dec.shape == (8, 8, 1)
    assert np.abs(dec[..., 0].astype(int) - 130).max() <= 2


def test_gray_smooth_roundtrip():
    img = _smooth_image(24, 40, channels=1, seed=3)
    dec = decode_jpeg(encode_jpeg(img))[..., 0].astype(int)
    err = np.abs(dec - img.astype(int))
    assert dec.shape == img.shape
    assert err.mean() < 3.0
    assert err.max() <= 20


def test_color_444_roundtrip():
    img = _smooth_image(16, 24, channels=3, seed=11)
    dec = decode_jpeg(encode_jpeg(img)).astype(int)
    err = np.abs(dec - img.astype(int))
    assert dec.shape == img.shape
    assert err.mean() < 4.0
    assert err.max() <= 32


def test_color_420_subsampled_roundtrip():
    img = _smooth_image(32, 48, channels=3, seed=5)
    dec = decode_jpeg(encode_jpeg(img, subsample=True)).astype(int)
    err = np.abs(dec - img.astype(int))
    assert dec.shape == img.shape
    # chroma is 2x2-averaged then replicated; still tight on smooth data
    assert err.mean() < 5.0
    assert err.max() <= 40


def test_restart_markers():
    img = _smooth_image(24, 64, channels=1, seed=9)
    plain = decode_jpeg(encode_jpeg(img))
    with_rst = decode_jpeg(encode_jpeg(img, restart_interval=2))
    assert np.array_equal(plain, with_rst)


def test_non_multiple_of_8_dims():
    img = _smooth_image(13, 21, channels=3, seed=2)
    dec = decode_jpeg(encode_jpeg(img))
    assert dec.shape == (13, 21, 3)


def test_decode_media_dispatches_jpeg():
    img = _smooth_image(16, 16, channels=3, seed=4)
    vec = decode_media(encode_jpeg(img), "image", fake=False)
    assert vec.shape == (16,)
    assert abs(float(np.linalg.norm(vec)) - 1.0) < 1e-5


_REAL_JPEGS = [
    # (path, height, width) — files shipped with the container's Python
    # installations, written by real-world encoders.
    ("/root/.pyenv/versions/3.13.0/lib/python3.13/test/test_email/data/python.jpg", None, None),
]


@pytest.mark.parametrize("path,h,w", _REAL_JPEGS)
def test_real_world_jpeg(path, h, w):
    if not os.path.exists(path):
        pytest.skip(f"fixture not present: {path}")
    payload = open(path, "rb").read()
    try:
        dec = decode_jpeg(payload)
    except NotImplementedError as e:
        pytest.skip(f"real file uses unsupported variant: {e}")
    assert dec.ndim == 3 and dec.shape[2] in (1, 3)
    assert dec.shape[0] > 0 and dec.shape[1] > 0
    # plausible content: not all-zero, not all-saturated
    assert 1 < dec.mean() < 254


# --- progressive (SOF2) — spec-direct test encoder + real-world files ------
#
# The progressive encoder below is built from T.81 G.1.2 independently of
# the decoder (same separation as the baseline encoder above): its own
# point transforms (sign-magnitude AC, arithmetic DC), EOB/ZRL run logic,
# and the correction-bit buffering of refinement scans. Progressive
# encoding is a lossless reorganization of the SAME quantized
# coefficients, so decode(progressive) must equal decode(baseline)
# PIXEL-FOR-PIXEL on the same raster — the strongest available oracle.


def _quantized_blocks(img):
    """(H, W[,3]) raster -> per-component zigzag-quantized block grids
    {cid: (BY, BX, 64) int32} at 4:4:4/grayscale, plus the comps list."""
    img = np.asarray(img, dtype=np.float64)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    comps = [(1, 1, 1, 0)] if gray else [
        (1, 1, 1, 0), (2, 1, 1, 1), (3, 1, 1, 1)
    ]
    if gray:
        planes = {1: img}
    else:
        r, g, b = img[..., 0], img[..., 1], img[..., 2]
        planes = {
            1: 0.299 * r + 0.587 * g + 0.114 * b,
            2: 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
            3: 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
        }
    mcux, mcuy = -(-w // 8), -(-h // 8)
    qts = {0: K1_LUMA_QT, 1: K2_CHROMA_QT}
    grids = {}
    for cid, _ch, _cv, tq in comps:
        p = np.pad(
            planes[cid],
            ((0, mcuy * 8 - h), (0, mcux * 8 - w)),
            mode="edge",
        )
        grid = np.zeros((mcuy, mcux, 64), dtype=np.int32)
        qnat = np.array(qts[tq], dtype=np.float64)
        for by in range(mcuy):
            for bx in range(mcux):
                coef = _fdct(p[by * 8: by * 8 + 8, bx * 8: bx * 8 + 8] - 128.0)
                flat = coef.flatten()
                for k in range(64):
                    grid[by, bx, k] = int(np.round(flat[ZIGZAG[k]] / qnat[k]))
        grids[cid] = grid
    return comps, grids, h, w, mcux, mcuy


def _enc_ac_first_block(writer, qz, ac_codes, ss, se, al):
    """AC first scan, one block: sign-magnitude point transform by Al,
    ZRL runs, explicit per-block EOB (an EOB run of exactly 1)."""
    vp = []
    for k in range(ss, se + 1):
        v = int(qz[k])
        a = abs(v) >> al
        vp.append(a if v >= 0 else -a)
    last = max((i for i, v in enumerate(vp) if v), default=-1)
    r = 0
    for i, v in enumerate(vp):
        if i > last:
            break
        if v == 0:
            r += 1
            continue
        while r > 15:
            c, ln = ac_codes[0xF0]
            writer.write(c, ln)
            r -= 16
        s, bits = _magnitude(v)
        c, ln = ac_codes[(r << 4) | s]
        writer.write(c, ln)
        writer.write(bits, s)
        r = 0
    if last < len(vp) - 1:
        c, ln = ac_codes[0x00]
        writer.write(c, ln)


def _enc_ac_refine_block(writer, qz, ac_codes, ss, se, al):
    """AC refinement scan, one block (T.81 G.1.2.3 / libjpeg
    encode_mcu_AC_refine shape): correction bits for history-nonzero
    coefficients are BUFFERED and flushed with the next emitted symbol,
    so the decoder reads them while walking that symbol's span."""
    absv = [abs(int(qz[k])) >> al for k in range(64)]
    newly = [k for k in range(ss, se + 1) if absv[k] == 1]
    eob = max(newly, default=ss - 1)
    r = 0
    pending: list[int] = []
    for k in range(ss, se + 1):
        temp = absv[k]
        if temp == 0:
            r += 1
            continue
        while r > 15 and k <= eob:
            c, ln = ac_codes[0xF0]
            writer.write(c, ln)
            r -= 16
            for b in pending:
                writer.write(b, 1)
            pending = []
        if temp > 1:  # history-nonzero: correction bit rides the next symbol
            pending.append(temp & 1)
            continue
        c, ln = ac_codes[(r << 4) | 1]
        writer.write(c, ln)
        writer.write(1 if int(qz[k]) > 0 else 0, 1)
        for b in pending:
            writer.write(b, 1)
        pending = []
        r = 0
    if r > 0 or pending:
        c, ln = ac_codes[0x00]  # EOB run of 1, then the tail's bits
        writer.write(c, ln)
        for b in pending:
            writer.write(b, 1)


def encode_jpeg_progressive(img):
    """Spec-direct progressive (SOF2) test encoder at 4:4:4/grayscale:
    interleaved DC first scan (Al=1), DC refinement (raw bits), two AC
    spectral-selection first scans per component (Ss 1-5 and 6-63, Al=1),
    one AC refinement scan per component (Ss 1-63, Ah=1, Al=0) — the
    same scan-script shape real encoders emit (cf. the container's
    grayscale.jpg: split first bands + one full-band refine)."""
    comps, grids, h, w, mcux, mcuy = _quantized_blocks(img)
    gray = len(comps) == 1
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + bytes(K1_LUMA_QT))
    if not gray:
        out += _seg(0xDB, bytes([0x01]) + bytes(K2_CHROMA_QT))
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, ch, cv, tq in comps:
        sof += bytes([cid, (ch << 4) | cv, tq])
    out += _seg(0xC2, sof)
    out += _seg(0xC4, _dht_body(0, 0, DC_LUMA) + _dht_body(1, 0, AC_LUMA))
    if not gray:
        out += _seg(0xC4, _dht_body(0, 1, DC_CHROMA) + _dht_body(1, 1, AC_CHROMA))
    dc_tabs = {1: _codes(*DC_LUMA), 2: _codes(*DC_CHROMA), 3: _codes(*DC_CHROMA)}
    ac_tabs = {1: _codes(*AC_LUMA), 2: _codes(*AC_CHROMA), 3: _codes(*AC_CHROMA)}

    def sos(scan_comps, ss, se, ah, al, tc_ac):
        body = bytes([len(scan_comps)])
        for cid in scan_comps:
            td_ta = (0x00 if cid == 1 else 0x11) if not tc_ac else (
                0x00 if cid == 1 else 0x01
            )
            body += bytes([cid, td_ta])
        return _seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))

    # scan 1: DC first, interleaved, Al=1 (arithmetic point transform)
    out += sos([c[0] for c in comps], 0, 0, 0, 1, tc_ac=False)
    writer = _BitWriter()
    pred = {cid: 0 for cid, *_ in comps}
    for by in range(mcuy):
        for bx in range(mcux):
            for cid, *_ in comps:
                dc = int(grids[cid][by, bx, 0]) >> 1
                diff = dc - pred[cid]
                pred[cid] = dc
                s, bits = _magnitude(diff)
                c, ln = dc_tabs[cid][s]
                writer.write(c, ln)
                if s:
                    writer.write(bits, s)
    writer.flush()
    out += writer.out

    # scan 2: DC refinement, interleaved, Ah=1 Al=0 (raw bits, no huffman)
    out += sos([c[0] for c in comps], 0, 0, 1, 0, tc_ac=False)
    writer = _BitWriter()
    for by in range(mcuy):
        for bx in range(mcux):
            for cid, *_ in comps:
                writer.write(int(grids[cid][by, bx, 0]) & 1, 1)
    writer.flush()
    out += writer.out

    # per component: AC first scans in two bands, then one refine scan
    for cid, *_ in comps:
        ac = ac_tabs[cid]
        for ss, se in ((1, 5), (6, 63)):
            out += sos([cid], ss, se, 0, 1, tc_ac=True)
            writer = _BitWriter()
            for by in range(mcuy):
                for bx in range(mcux):
                    _enc_ac_first_block(writer, grids[cid][by, bx], ac, ss, se, 1)
            writer.flush()
            out += writer.out
        out += sos([cid], 1, 63, 1, 0, tc_ac=True)
        writer = _BitWriter()
        for by in range(mcuy):
            for bx in range(mcux):
                _enc_ac_refine_block(writer, grids[cid][by, bx], ac, 1, 63, 0)
        writer.flush()
        out += writer.out

    out += b"\xff\xd9"
    return bytes(out)


def test_progressive_equals_baseline_gray():
    img = _smooth_image(24, 40, channels=1, seed=11)
    base = decode_jpeg(encode_jpeg(img))
    prog = decode_jpeg(encode_jpeg_progressive(img))
    assert base.shape == prog.shape
    assert np.array_equal(base, prog)  # same coefficients, same pixels


def test_progressive_equals_baseline_color():
    img = _smooth_image(21, 19, channels=3, seed=12)  # non-multiple-of-8
    base = decode_jpeg(encode_jpeg(img))
    prog = decode_jpeg(encode_jpeg_progressive(img))
    assert base.shape == prog.shape
    assert np.array_equal(base, prog)


def test_progressive_high_contrast_exercises_zrl_and_eobrun():
    # sparse spikes on flat background: long zero runs (ZRL), early EOBs,
    # and sign flips in the refinement pass
    rng = np.random.RandomState(5)
    img = np.full((32, 48), 128, dtype=np.uint8)
    ys, xs = rng.randint(0, 32, 60), rng.randint(0, 48, 60)
    img[ys, xs] = rng.choice([0, 255], 60)
    base = decode_jpeg(encode_jpeg(img))
    prog = decode_jpeg(encode_jpeg_progressive(img))
    assert np.array_equal(base, prog)


def test_progressive_header_only_raises():
    """A SOF2 stream truncated before its first SOS must raise like the
    baseline 'missing SOS' case — not silently reconstruct the zero
    coefficient planes into a solid-gray raster (regression: the
    best-effort truncated-stream guard keyed on the coefficient dict
    being non-empty, which is true from SOF2 parse time onward)."""
    img = _smooth_image(16, 16, channels=1, seed=13)
    prog = encode_jpeg_progressive(img)
    first_sos = prog.index(b"\xff\xda")
    for tail in (b"", b"\xff\xd9"):  # no EOI / immediate EOI
        with pytest.raises(ValueError, match="missing SOS"):
            decode_jpeg(prog[:first_sos] + tail)
    # one decoded scan keeps the documented truncated-stream best effort
    second_sos = prog.index(b"\xff\xda", first_sos + 2)
    partial = decode_jpeg(prog[:second_sos])
    assert partial.shape == (16, 16, 1)


_REAL_PROGRESSIVE = [
    "/usr/share/doc/nodejs/thin-white-stripe.jpg",       # spectral-only, color
    "/usr/share/doc/nodejs/full-white-stripe.jpg",       # spectral-only, color
    # full successive approximation: DC Al=1, AC first Al=2 (two bands),
    # AC refine 2->1, DC refine, AC refine 1->0
    "/opt/spark-4.1.2-bin-hadoop3/data/mllib/images/origin/multi-channel/grayscale.jpg",
]


@pytest.mark.parametrize("path", _REAL_PROGRESSIVE)
def test_real_world_progressive_jpeg(path):
    if not os.path.exists(path):
        pytest.skip(f"fixture not present: {path}")
    dec = decode_jpeg(open(path, "rb").read())
    assert dec.ndim == 3 and dec.shape[2] in (1, 3)
    assert dec.shape[0] > 0 and dec.shape[1] > 0
    assert 1 < dec.mean() < 254  # plausible content
