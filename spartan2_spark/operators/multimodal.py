"""Multimodal columns: image/audio/video as opaque binary + typed
metadata; decode / feature-extract / resize / frame-sample as
Arrow-batched kernels over ``mapInPandas``.

Decoders plug in through the ``decoder=`` seam: ``'png'`` is a REAL
decode path (pure-stdlib zlib PNG codec, functions/png_codec.py — any
spec-conforming 8-bit gray/RGB PNG), ``'fake'`` is the deterministic
bytes-derived stand-in for plumbing tests, ``'none'`` raises at
execution, and a CALLABLE swaps in an external codec (PIL/ffmpeg on a
real cluster). ffmpeg-class formats (JPEG/video/compressed audio) have
no in-container codec and keep the stub seam; WAV audio decodes for
real via png_codec.decode_wav (stdlib ``wave``); ``'jpeg'`` is a
REAL baseline-JPEG decode path (functions/jpeg_codec.py, pure numpy
Huffman + IDCT — libjpeg-encoded baseline files included). The
remaining ffmpeg-class seam (video, compressed audio, progressive
JPEG) keeps the documented NotImplementedError.

Scale notes: binary payloads ride in Arrow record batches; keep
``spark.sql.execution.arrow.maxRecordsPerBatch`` modest (the session
default 65536 assumes ~KB rows — for MB media set 256-1024) and
partition by size not count (``maxPartitionBytes``).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["attach_media_meta", "extract_features", "frame_sample", "resize_media"]


def attach_media_meta(
    df: DataFrame, bin_col: str = "html", kind: str = "image"
) -> DataFrame:
    """Typed metadata struct for an opaque media column (no decode):
    byte length + xxhash64 content id + declared kind."""
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(kind).alias("kind"),
            F.length(F.col(bin_col)).alias("n_bytes"),
            F.xxhash64(F.col(bin_col)).alias("content_id"),
        ),
    )


def _decode_fake(buf: bytes, n_features: int) -> np.ndarray:
    """Deterministic stand-in for a real decoder: per-feature means of
    the byte stream's strided slices (stable, content-sensitive)."""
    a = np.frombuffer(buf, dtype=np.uint8)
    if len(a) == 0:
        return np.zeros(n_features)
    pad = (-len(a)) % n_features
    a = np.pad(a, (0, pad)).reshape(n_features, -1)
    return a.mean(axis=1) / 255.0


def extract_features(
    df: DataFrame,
    bin_col: str = "html",
    id_col: str = "url",
    n_features: int = 16,
    decoder="fake",
) -> DataFrame:
    """binary -> float feature vector, Arrow-batched.

    ``decoder`` is the swap seam for real codecs: pass a CALLABLE
    ``(buf: bytes, n_features: int) -> np.ndarray`` (a PIL/ffmpeg
    wrapper on a real cluster — it is closure-shipped to executors and
    runs inside the Arrow batch loop), or ``'fake'`` (deterministic
    bytes-derived stand-in), or ``'none'`` (raise at execution).
    """
    schema = f"{id_col} string, n_bytes long, features array<double>"

    if not callable(decoder) and decoder not in ("fake", "none", "png", "jpeg"):
        raise ValueError(
            f"unknown decoder {decoder!r}: pass a callable "
            "(buf, n_features) -> ndarray, or 'png' (real stdlib-zlib "
            "PNG decode), or 'jpeg' (real numpy baseline-JPEG decode), "
            "or 'fake' (deterministic stand-in), or "
            "'none' (raise at execution) — a typo must not silently "
            "produce fake features"
        )
    if decoder == "png":
        from spartan2_spark.functions.png_codec import png_feature_decoder

        decode_fn = png_feature_decoder
    elif decoder == "jpeg":
        from spartan2_spark.functions.jpeg_codec import jpeg_feature_decoder

        decode_fn = jpeg_feature_decoder
    else:
        decode_fn = decoder if callable(decoder) else _decode_fake

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "none":
                raise NotImplementedError(
                    "real media decode requires codec libs not present in "
                    "this container; use decoder='fake' for plumbing tests"
                )
            feats = [
                np.asarray(decode_fn(bytes(b), n_features), dtype=np.float64).tolist()
                for b in pdf[bin_col]
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype(str),
                    "n_bytes": pdf[bin_col].map(len),
                    "features": feats,
                }
            )

    return df.select(id_col, bin_col).mapInPandas(kernel, schema)


def frame_sample(
    df: DataFrame,
    bin_col: str = "html",
    id_col: str = "url",
    frame_bytes: int = 256,
    every_n: int = 4,
) -> DataFrame:
    """'Video' frame sampling stand-in: split the byte stream into
    fixed-size frames, keep every n-th; one output row per kept frame
    (the explode shape a real frame sampler produces)."""
    schema = f"{id_col} string, frame_idx long, frame binary"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for i, b in zip(pdf[id_col], pdf[bin_col]):
                raw = bytes(b)
                n_frames = max(len(raw) // frame_bytes, 1)
                for fi in range(0, n_frames, every_n):
                    ids.append(str(i))
                    idxs.append(fi)
                    frames.append(raw[fi * frame_bytes : (fi + 1) * frame_bytes])
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame": frames})

    return df.select(id_col, bin_col).mapInPandas(kernel, schema)


def _decode_image_fake(buf: bytes, hw: tuple[int, int]) -> np.ndarray:
    """Deterministic image-decode stand-in: byte stream tiled into an
    (h, w) float grid — same role as _decode_fake, 2-D shape."""
    h, w = hw
    a = np.frombuffer(buf, dtype=np.uint8)
    if len(a) == 0:
        return np.zeros((h, w))
    reps = -(-(h * w) // len(a))
    return np.tile(a, reps)[: h * w].reshape(h, w) / 255.0


def resize_media(
    df: DataFrame,
    bin_col: str = "html",
    id_col: str = "url",
    src_hw: tuple[int, int] = (32, 32),
    out_hw: tuple[int, int] = (8, 8),
    decoder="fake",
) -> DataFrame:
    """binary image -> decoded grid -> mean-pooled resize, Arrow-batched
    over ``mapInPandas``. Same swap seam as extract_features: pass a
    CALLABLE ``(buf, src_hw) -> ndarray(h, w)`` wrapping a real codec
    (PIL on a real cluster), ``'fake'`` (deterministic byte-tile
    stand-in), or ``'none'`` (raise at execution). The POOLING step is
    real (block mean via reshape, the standard area resampler) and runs
    on whatever the decoder returns; src_hw must be divisible by
    out_hw. Output: one row per media item with the flattened
    (out_h * out_w) pixel array.
    """
    (sh, sw), (oh, ow) = src_hw, out_hw
    if sh % oh or sw % ow:
        raise ValueError(f"src_hw {src_hw} not divisible by out_hw {out_hw}")
    if not callable(decoder) and decoder not in ("fake", "none", "png", "jpeg"):
        raise ValueError(
            f"unknown decoder {decoder!r}: callable, 'png', 'jpeg', "
            "'fake', or 'none'"
        )
    if decoder == "png":
        from spartan2_spark.functions.png_codec import png_image_decoder

        decode_fn = png_image_decoder
    elif decoder == "jpeg":
        from spartan2_spark.functions.jpeg_codec import jpeg_image_decoder

        decode_fn = jpeg_image_decoder
    else:
        decode_fn = decoder if callable(decoder) else _decode_image_fake
    schema = f"{id_col} string, out_h int, out_w int, pixels array<double>"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "none":
                raise NotImplementedError(
                    "real image decode requires codec libs not present in "
                    "this container; use decoder='fake' for plumbing tests"
                )
            out = []
            for b in pdf[bin_col]:
                img = np.asarray(decode_fn(bytes(b), (sh, sw)), dtype=np.float64)
                pooled = img.reshape(oh, sh // oh, ow, sw // ow).mean(axis=(1, 3))
                out.append(pooled.ravel().tolist())
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype(str),
                    "out_h": oh,
                    "out_w": ow,
                    "pixels": out,
                }
            )

    return df.select(id_col, bin_col).mapInPandas(kernel, schema)
