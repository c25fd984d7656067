"""Real PNG/WAV decode path (functions/png_codec.py): spec-correct
filter reconstruction, roundtrips, and the multimodal operators running
a REAL decode end-to-end on synthetic PNG bytes."""

from __future__ import annotations

import struct
import zlib
from binascii import crc32

import numpy as np
import pytest

from spartan2_spark.functions.png_codec import (
    decode_png,
    decode_wav,
    encode_png_gray,
    png_image_decoder,
)


def _img(h, w, seed=3):
    return np.random.default_rng(seed).integers(0, 256, (h, w), dtype=np.uint8)


@pytest.mark.parametrize("ft", [0, 1, 2])
def test_png_roundtrip_gray_filters(ft):
    a = _img(17, 23)
    buf = encode_png_gray(a, filter_type=ft)
    assert buf[:8] == b"\x89PNG\r\n\x1a\n"
    out = decode_png(buf)
    assert out.dtype == np.uint8 and (out == a).all()
    # byte-stable: same input -> same bytes, same decode
    assert encode_png_gray(a, filter_type=ft) == buf


def _chunk(tag, payload):
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", crc32(tag + payload) & 0xFFFFFFFF)
    )


def _encode_with_filters(a: np.ndarray, fts: list[int]) -> bytes:
    """Hand-filter each scanline (including Average/Paeth, which the
    simple encoder doesn't emit) so the decoder's reconstruction of
    every filter type is exercised against an independent forward
    implementation."""

    def paeth(pa, pb, pc):
        p = pa + pb - pc
        da, db, dc = abs(p - pa), abs(p - pb), abs(p - pc)
        return pa if (da <= db and da <= dc) else (pb if db <= dc else pc)

    h, w = a.shape
    rows = []
    for r in range(h):
        ft = fts[r % len(fts)]
        line = a[r].astype(int)
        above = a[r - 1].astype(int) if r else np.zeros(w, int)
        filt = np.zeros(w, int)
        for i in range(w):
            left = int(line[i - 1]) if i else 0
            ul = int(above[i - 1]) if i else 0
            if ft == 0:
                filt[i] = line[i]
            elif ft == 1:
                filt[i] = line[i] - left
            elif ft == 2:
                filt[i] = line[i] - above[i]
            elif ft == 3:
                filt[i] = line[i] - (left + int(above[i])) // 2
            else:
                filt[i] = line[i] - paeth(left, int(above[i]), ul)
        rows.append(bytes([ft]) + (filt % 256).astype(np.uint8).tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + _chunk(b"IEND", b"")
    )


def test_png_decode_all_five_filters():
    a = _img(10, 12, seed=9)
    buf = _encode_with_filters(a, [0, 1, 2, 3, 4])
    assert (decode_png(buf) == a).all()


def test_png_decode_rgb():
    h, w = 6, 5
    rgb = np.random.default_rng(1).integers(0, 256, (h, w, 3), dtype=np.uint8)
    rows = b"".join(b"\x00" + rgb[r].tobytes() for r in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    buf = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(rows))
        + _chunk(b"IEND", b"")
    )
    assert (decode_png(buf) == rgb).all()


def test_png_decode_rejects_garbage_and_variants():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"not a png at all")
    a = _img(4, 4)
    # 16-bit depth IHDR
    ihdr = struct.pack(">IIBBBBB", 4, 4, 16, 0, 0, 0, 0)
    buf = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"\x00" * (4 * 8 + 4)))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="unsupported"):
        decode_png(buf)
    with pytest.raises(ValueError, match="expected"):
        png_image_decoder(encode_png_gray(a), (8, 8))


def test_wav_roundtrip():
    import io
    import wave

    rate = 8000
    t = np.arange(400) / rate
    sig = (np.sin(2 * np.pi * 440 * t) * 32000).astype("<i2")
    bio = io.BytesIO()
    with wave.open(bio, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(sig.tobytes())
    samples, got_rate = decode_wav(bio.getvalue())
    assert got_rate == rate and len(samples) == 400
    assert np.allclose(samples, sig / 32768.0)


def test_resize_media_real_png_decode(spark):
    """End-to-end through Spark: synthetic PNG bytes -> real decode ->
    block-mean pooling equals the numpy pooling of the source array,
    and the run is deterministic (two executions byte-identical)."""
    from spartan2_spark.operators.multimodal import resize_media

    imgs = {f"u{i}": _img(16, 16, seed=i) for i in range(6)}
    rows = [(k, bytearray(encode_png_gray(v, filter_type=i % 3))) for i, (k, v) in enumerate(imgs.items())]
    df = spark.createDataFrame(rows, "url string, html binary")
    out = resize_media(df, src_hw=(16, 16), out_hw=(4, 4), decoder="png")
    got = {r["url"]: np.array(r["pixels"]) for r in out.collect()}
    got2 = {r["url"]: np.array(r["pixels"]) for r in out.collect()}
    for k, a in imgs.items():
        want = (a / 255.0).reshape(4, 4, 4, 4).mean(axis=(1, 3)).ravel()
        assert np.allclose(got[k], want), k
        assert (got[k] == got2[k]).all()


def test_extract_features_real_png_decode(spark):
    from spartan2_spark.functions.png_codec import png_feature_decoder
    from spartan2_spark.operators.multimodal import extract_features

    a = _img(8, 8, seed=5)
    df = spark.createDataFrame(
        [("u0", bytearray(encode_png_gray(a)))], "url string, html binary"
    )
    out = extract_features(df, n_features=4, decoder="png").collect()[0]
    want = png_feature_decoder(encode_png_gray(a), 4)
    assert np.allclose(np.array(out["features"]), want)
    # strided means of DECODED pixels, not raw file bytes
    px = a.ravel().astype(float).reshape(4, -1).mean(axis=1) / 255.0
    assert np.allclose(want, px)
