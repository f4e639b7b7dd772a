"""Decode / feature-extraction stubs for multimodal payloads.

The container ships no image/audio/video codecs (no PIL, no ffmpeg,
no torchvision), so the actual decode step raises NotImplementedError
with a clear message — per the project contract, the Spark-side
plumbing (schemas, mapInPandas batch shapes, feature vector widths) is
real and exercised with ``extract_fake_features``, a deterministic
byte-level stand-in with the same signature a real extractor would
have.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

FEATURE_DIM = 8

_CODEC_MSG = (
    "{kind} decoding requires a codec library (PIL/ffmpeg) not present in "
    "this environment; wire a real decoder here. The surrounding Spark "
    "plumbing (binary columns, Arrow batches, schema) is production-shaped."
)


def decode_image(payload: bytes, mime_type: str):  # pragma: no cover - stub
    raise NotImplementedError(_CODEC_MSG.format(kind="Image"))


def decode_audio(payload: bytes, mime_type: str):  # pragma: no cover - stub
    raise NotImplementedError(_CODEC_MSG.format(kind="Audio"))


def resize_image(payload: bytes, mime_type: str, width: int, height: int):  # pragma: no cover - stub
    raise NotImplementedError(_CODEC_MSG.format(kind="Image resize"))


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
