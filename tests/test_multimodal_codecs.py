"""Real (dependency-free) PNG and WAV decode — golden-file round trips.

The test encodes known rasters/samples with its own straight-from-spec
writer (zlib/struct only) and asserts the decoders recover them exactly,
covering every PNG scanline filter type.
"""

import struct
import zlib

import numpy as np
import pytest

from llm_text_to_knowledge_graph_spark.operators.multimodal import (
    decode_media,
    decode_png,
    decode_wav,
)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _paeth(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)


def _encode_png(arr: np.ndarray, filters: list[int]) -> bytes:
    """Spec-direct PNG writer for the test: 8-bit, one filter per row."""
    h, w, ch = arr.shape
    color = {1: 0, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raster = bytearray()
    prev = np.zeros(w * ch, dtype=np.int32)
    for y in range(h):
        row = arr[y].reshape(-1).astype(np.int32)
        f = filters[y % len(filters)]
        raster.append(f)
        for x in range(w * ch):
            a = int(row[x - ch]) if x >= ch else 0
            b = int(prev[x])
            c = int(prev[x - ch]) if x >= ch else 0
            if f == 0:
                v = row[x]
            elif f == 1:
                v = row[x] - a
            elif f == 2:
                v = row[x] - b
            elif f == 3:
                v = row[x] - ((a + b) >> 1)
            else:
                v = row[x] - _paeth(a, b, c)
            raster.append(int(v) & 0xFF)
        prev = row
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raster)))
        + _chunk(b"IEND", b"")
    )


def _encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    data = samples.astype("<i2").tobytes()
    n_ch = samples.shape[1]
    fmt = struct.pack("<HHIIHH", 1, n_ch, rate, rate * 2 * n_ch, 2 * n_ch, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


@pytest.mark.parametrize("ch", [1, 3, 4])
def test_png_roundtrip_all_filters(ch):
    rng = np.random.RandomState(5 + ch)
    arr = rng.randint(0, 256, size=(10, 7, ch), dtype=np.uint8)
    payload = _encode_png(arr, filters=[0, 1, 2, 3, 4])
    got = decode_png(payload)
    assert got.shape == arr.shape
    assert np.array_equal(got, arr)


def test_wav_roundtrip():
    rng = np.random.RandomState(11)
    samples = rng.randint(-30000, 30000, size=(400, 2), dtype=np.int16)
    payload = _encode_wav(samples, rate=16000)
    got, rate = decode_wav(payload)
    assert rate == 16000
    assert np.array_equal(got, samples)


def test_decode_media_real_paths_and_fallback():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(8, 8, 3), dtype=np.uint8)
    feat = decode_media(_encode_png(img, [0, 2]), "image")
    assert feat.shape == (16,) and abs(float(np.linalg.norm(feat)) - 1.0) < 1e-5
    wav = _encode_wav(rng.randint(-100, 100, size=(64, 1), dtype=np.int16))
    feat_a = decode_media(wav, "audio")
    assert feat_a.shape == (16,)
    with pytest.raises(NotImplementedError):
        decode_media(b"ID3\x03 MP3-ish", "audio")  # still honest: no MP3
    with pytest.raises(ValueError):
        # JPEG is real as of r3: a truncated payload is a decode ERROR now,
        # not an unimplemented-codec fallthrough
        decode_media(b"\xff\xd8\xff JPEG-ish", "image")


def test_extract_features_real_decode_in_spark(spark):
    from llm_text_to_knowledge_graph_spark.operators.multimodal import (
        extract_features,
    )

    rng = np.random.RandomState(7)
    rows = []
    for i in range(6):
        img = rng.randint(0, 256, size=(6, 6, 3), dtype=np.uint8)
        rows.append((i, "image", bytearray(_encode_png(img, [0, 1, 4])), 6, 6, None))
    media = spark.createDataFrame(
        rows,
        "media_id long, media_type string, payload binary, "
        "width int, height int, duration_ms int",
    )
    out = extract_features(media, fake=False).collect()
    assert len(out) == 6
    for r in out:
        assert len(r["feature"]) == 16
        assert abs(sum(x * x for x in r["feature"]) - 1.0) < 1e-4
