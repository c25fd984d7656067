"""Minimal pure-Python PNG (and WAV) codec — the real-decode path for
the multimodal operators.

The container has no native codec libraries (PIL/ffmpeg), but PNG's
format needs only stdlib ``zlib`` + ``struct``: this module implements
a correct 8-bit grayscale/RGB decoder (signature, IHDR, concatenated
IDAT inflate, and all five scanline filters — None/Sub/Up/Average/
Paeth per the PNG spec §9 'Filtering') plus a matching encoder used to
build deterministic test fixtures. WAV decode rides stdlib ``wave``.

These are REAL decoders, not stand-ins: any spec-conforming 8-bit
gray/RGB PNG (whatever encoder produced it, whatever filter heuristics
it chose) decodes to the exact pixel array. The multimodal operators
accept them through the same ``decoder=`` seam used for the fake
stand-ins (``operators/multimodal.py``); ffmpeg-class formats (JPEG,
video, compressed audio) keep the documented stub seam.

Per-pixel Python runs only inside Sub/Average/Paeth filter rows of an
Arrow batch's images (None/Up rows are numpy-vectorized); for
thumbnail-class media this is microseconds per image. A real cluster
deployment would swap a SIMD codec through the same seam.
"""

from __future__ import annotations

import struct
import zlib
from binascii import crc32

import numpy as np

__all__ = [
    "encode_png_gray",
    "decode_png",
    "png_image_decoder",
    "png_feature_decoder",
    "decode_wav",
]

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png_gray(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """8-bit grayscale PNG bytes from an (h, w) uint8 array.

    ``filter_type`` applies one filter to every scanline (0=None,
    1=Sub, 2=Up) — exercising the decoder's filter reconstruction in
    tests; real encoders mix filters per row, which the decoder
    handles regardless.
    """
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 2:
        raise ValueError("encode_png_gray wants an (h, w) uint8 array")
    h, w = a.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    rows = []
    prev = np.zeros(w, dtype=np.uint8)
    for r in range(h):
        line = a[r]
        if filter_type == 0:
            filt = line
        elif filter_type == 1:  # Sub: raw - left
            filt = (line.astype(np.int16) - np.concatenate(([0], line[:-1]))) % 256
        elif filter_type == 2:  # Up: raw - above
            filt = (line.astype(np.int16) - prev) % 256
        else:
            raise ValueError("encoder supports filter types 0/1/2")
        rows.append(bytes([filter_type]) + filt.astype(np.uint8).tobytes())
        prev = line
    idat = zlib.compress(b"".join(rows), 6)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(buf: bytes) -> np.ndarray:
    """Decode an 8-bit grayscale or RGB PNG to an (h, w) or (h, w, 3)
    uint8 array. Raises ValueError on non-PNG bytes or unsupported
    variants (bit depth != 8, palette/alpha, interlaced)."""
    if buf[:8] != _SIG:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    ihdr = None
    idat = bytearray()
    while pos + 8 <= len(buf):
        (length,) = struct.unpack(">I", buf[pos : pos + 4])
        tag = buf[pos + 4 : pos + 8]
        payload = buf[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
    if ihdr is None:
        raise ValueError("no IHDR chunk")
    w, h, depth, color, _comp, _filt, interlace = ihdr
    if depth != 8 or color not in (0, 2) or interlace:
        raise ValueError(
            f"unsupported PNG variant (depth={depth}, color={color}, "
            f"interlace={interlace}): only 8-bit gray/RGB, non-interlaced"
        )
    ch = 1 if color == 0 else 3
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT length does not match dimensions")
    out = np.zeros((h, stride), dtype=np.uint8)
    for r in range(h):
        ft = raw[r * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=r * (stride + 1) + 1
        ).astype(np.int32)
        above = out[r - 1].astype(np.int32) if r else np.zeros(stride, np.int32)
        if ft == 0:  # None
            rec = line
        elif ft == 2:  # Up (vectorized)
            rec = (line + above) % 256
        elif ft == 1:  # Sub: per-channel prefix sum mod 256 (vectorized)
            rec = line.reshape(w, ch).cumsum(axis=0).reshape(stride) % 256
        elif ft == 3:  # Average
            rec = np.zeros(stride, np.int32)
            for i in range(stride):
                left = rec[i - ch] if i >= ch else 0
                rec[i] = (line[i] + (left + above[i]) // 2) % 256
        elif ft == 4:  # Paeth
            rec = np.zeros(stride, np.int32)
            for i in range(stride):
                left = rec[i - ch] if i >= ch else 0
                ul = above[i - ch] if i >= ch else 0
                rec[i] = (line[i] + _paeth(int(left), int(above[i]), int(ul))) % 256
        else:
            raise ValueError(f"bad filter type {ft}")
        out[r] = rec.astype(np.uint8)
    return out if ch == 1 else out.reshape(h, w, 3)


def png_image_decoder(buf: bytes, src_hw: tuple[int, int]) -> np.ndarray:
    """``resize_media`` decoder seam: PNG bytes -> (h, w) float grid in
    [0, 1] (RGB collapses to the mean channel). The decoded size must
    match ``src_hw`` — a silent mismatch would pool the wrong blocks."""
    img = decode_png(buf)
    if img.ndim == 3:
        img = img.mean(axis=2)
    if img.shape != tuple(src_hw):
        raise ValueError(f"decoded {img.shape}, expected {tuple(src_hw)}")
    return img / 255.0


def png_feature_decoder(buf: bytes, n_features: int) -> np.ndarray:
    """``extract_features`` decoder seam: PNG bytes -> n strided means
    of the DECODED pixel stream (vs the fake decoder's raw-byte means)."""
    px = decode_png(buf).ravel().astype(np.float64)
    pad = (-len(px)) % n_features
    px = np.pad(px, (0, pad)).reshape(n_features, -1)
    return px.mean(axis=1) / 255.0


def decode_wav(buf: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV bytes -> (samples float64 in [-1, 1] shaped (n,) or
    (n, channels), sample_rate). stdlib ``wave`` does the container
    parsing; 8/16/32-bit integer PCM supported."""
    import io
    import wave

    with wave.open(io.BytesIO(buf)) as wf:
        n, ch, width = wf.getnframes(), wf.getnchannels(), wf.getsampwidth()
        rate = wf.getframerate()
        raw = wf.readframes(n)
    if width == 1:  # unsigned 8-bit
        a = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif width == 2:
        a = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 4:
        a = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise ValueError(f"unsupported sample width {width}")
    return (a.reshape(-1, ch) if ch > 1 else a), rate
