"""Deterministic synthetic BMP/WAV assets + decode audit operators.

The testdata has no real image/audio columns, so the decode catalog
queries build payloads from a PIXEL FORMULA in the asset id — pure
integer arithmetic a SQL oracle can replay with generate_series —
then round-trip them through the REAL byte-level codecs
(multimodal/codecs.py): formula → encode_bmp → decode_bmp → aggregate.
The DuckDB oracle computes the same aggregates straight from the
formula, so any codec defect (row padding, BGR order, bottom-up rows,
RIFF chunk walking) shifts a decoded byte and fails the value hash.
Dimensions vary per asset (widths 8..15 sweep every 4-byte padding
residue; heights 4..7) so the whole padding space is exercised.

Image formula (k: 0=R 1=G 2=B):
    w = 8 + id % 8,  h = 4 + id % 4
    pixel(r, c, k) = (id·31 + r·7 + c·3 + k·11) mod 256
Audio formula (PCM16 mono):
    n = 256 + id % 128,  rate = 8000 + (id % 4)·4000
    sample(i) = ((id·17 + i·13) mod 4096) − 2048

All per-payload work is vectorized numpy inside Arrow-batched
``mapInPandas`` — the production multimodal execution shape
(multimodal/assets.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

from .codecs import (
    decode_bmp,
    decode_png,
    decode_wav_pcm16,
    encode_bmp,
    encode_png,
    encode_wav_pcm16,
    resize_nearest,
)

# positional weights for the decode checksums: any pixel/sample landing
# at the wrong (r, c, k) / i changes the weighted sum
_W_ROW, _W_COL, _W_CHAN = 1000003, 1009, 1


def _image_pixels(asset_id: int) -> np.ndarray:
    w = 8 + asset_id % 8
    h = 4 + asset_id % 4
    r = np.arange(h)[:, None, None]
    c = np.arange(w)[None, :, None]
    k = np.arange(3)[None, None, :]
    return ((asset_id * 31 + r * 7 + c * 3 + k * 11) % 256).astype(np.uint8)


def _audio_samples(asset_id: int) -> tuple[np.ndarray, int]:
    n = 256 + asset_id % 128
    rate = 8000 + (asset_id % 4) * 4000
    i = np.arange(n)
    return ((asset_id * 17 + i * 13) % 4096 - 2048).astype(np.int16), rate


def synthetic_image_assets(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(asset_id, modality, payload, mime_type) with real BMP bytes."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids_ = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {
                    "asset_id": ids_,
                    "modality": "image",
                    "payload": [encode_bmp(_image_pixels(int(i))) for i in ids_],
                    "mime_type": "image/bmp",
                }
            )

    return ids.select(id_col).mapInPandas(
        batches,
        schema="asset_id long, modality string, payload binary, mime_type string",
    )


def _png_pixels(asset_id: int) -> np.ndarray:
    """PNG asset formula — distinct constants from the BMP formula so
    the two decode oracles cannot mask each other, and h = 5..8 so the
    row-cycled encoder filter (row % 5) exercises ALL five predictors
    on every asset."""
    w = 5 + asset_id % 7
    h = 5 + asset_id % 4
    r = np.arange(h)[:, None, None]
    c = np.arange(w)[None, :, None]
    k = np.arange(3)[None, None, :]
    return ((asset_id * 37 + r * 5 + c * 13 + k * 7) % 256).astype(np.uint8)


def synthetic_png_assets(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(asset_id, modality, payload, mime_type) with real PNG bytes —
    zlib-compressed, filter types cycling None/Sub/Up/Average/Paeth,
    IDAT split across two chunks."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids_ = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {
                    "asset_id": ids_,
                    "modality": "image",
                    "payload": [encode_png(_png_pixels(int(i))) for i in ids_],
                    "mime_type": "image/png",
                }
            )

    return ids.select(id_col).mapInPandas(
        batches,
        schema="asset_id long, modality string, payload binary, mime_type string",
    )


def png_decode_audit(assets: DataFrame) -> DataFrame:
    """Decode each PNG payload and aggregate the pixel array exactly as
    ``image_decode_audit`` does for BMP — dimensions, exact integer
    channel sums, position-weighted checksum. Any defilter defect
    (Paeth tie-breaking, Average floor, Sub carry, chunk concatenation)
    shifts a decoded byte and fails the value hash."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                px = decode_png(payload).astype(np.int64)
                h, w, _ = px.shape
                weights = (
                    np.arange(h)[:, None, None] * _W_ROW
                    + np.arange(w)[None, :, None] * _W_COL
                    + np.arange(3)[None, None, :] * _W_CHAN
                )
                rows.append(
                    (
                        int(asset_id), h, w,
                        int(px[:, :, 0].sum()),
                        int(px[:, :, 1].sum()),
                        int(px[:, :, 2].sum()),
                        int((px * weights).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "height", "width",
                    "sum_r", "sum_g", "sum_b", "pos_checksum",
                ],
            )

    return assets.mapInPandas(
        batches,
        schema=(
            "asset_id long, height long, width long, "
            "sum_r long, sum_g long, sum_b long, pos_checksum long"
        ),
    )


def synthetic_audio_assets(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(asset_id, modality, payload, mime_type) with real WAV bytes."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids_ = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {
                    "asset_id": ids_,
                    "modality": "audio",
                    "payload": [
                        encode_wav_pcm16(s, sample_rate=r)
                        for s, r in (_audio_samples(int(i)) for i in ids_)
                    ],
                    "mime_type": "audio/wav",
                }
            )

    return ids.select(id_col).mapInPandas(
        batches,
        schema="asset_id long, modality string, payload binary, mime_type string",
    )


def image_decode_audit(assets: DataFrame) -> DataFrame:
    """Decode each BMP payload and aggregate the pixel array: dimensions,
    exact integer channel sums (divide-then-round happens on both
    engines identically), and a position-weighted checksum. One decoded
    byte out of place — wrong row order, channel order, or padding —
    changes the output."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                px = decode_bmp(payload).astype(np.int64)
                h, w, _ = px.shape
                weights = (
                    np.arange(h)[:, None, None] * _W_ROW
                    + np.arange(w)[None, :, None] * _W_COL
                    + np.arange(3)[None, None, :] * _W_CHAN
                )
                rows.append(
                    (
                        int(asset_id), h, w,
                        int(px[:, :, 0].sum()),
                        int(px[:, :, 1].sum()),
                        int(px[:, :, 2].sum()),
                        int((px * weights).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "height", "width",
                    "sum_r", "sum_g", "sum_b", "pos_checksum",
                ],
            )

    return assets.mapInPandas(
        batches,
        schema=(
            "asset_id long, height long, width long, "
            "sum_r long, sum_g long, sum_b long, pos_checksum long"
        ),
    )


def audio_decode_audit(assets: DataFrame) -> DataFrame:
    """Decode each WAV payload: sample_rate/n_samples from the headers,
    exact integer sample sum, max |sample|, and a position-weighted
    checksum."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                samples, rate = decode_wav_pcm16(payload)
                s = samples.astype(np.int64)
                rows.append(
                    (
                        int(asset_id), rate, len(s),
                        int(s.sum()),
                        int(np.abs(s).max()) if len(s) else 0,
                        int((s * np.arange(len(s))).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "sample_rate", "n_samples",
                    "sum_samples", "max_abs", "pos_checksum",
                ],
            )

    return assets.mapInPandas(
        batches,
        schema=(
            "asset_id long, sample_rate long, n_samples long, "
            "sum_samples long, max_abs long, pos_checksum long"
        ),
    )


def image_resize_audit(assets: DataFrame, *, width: int, height: int) -> DataFrame:
    """Decode → nearest-neighbor resize → position-weighted checksum of
    the RESIZED pixels. The floor sampling map ``src = dst·srcdim //
    dstdim`` is integer arithmetic, so the oracle replays the sampled
    positions exactly."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        weights = (
            np.arange(height)[:, None, None] * _W_ROW
            + np.arange(width)[None, :, None] * _W_COL
            + np.arange(3)[None, None, :] * _W_CHAN
        )

        for pdf in it:
            rows = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                small = resize_nearest(decode_bmp(payload), width, height).astype(
                    np.int64
                )
                rows.append(
                    (int(asset_id), height, width, int((small * weights).sum()))
                )
            yield pd.DataFrame(
                rows, columns=["asset_id", "height", "width", "pos_checksum"]
            )

    return assets.mapInPandas(
        batches,
        schema="asset_id long, height long, width long, pos_checksum long",
    )


def image_dhash_audit(assets: DataFrame) -> DataFrame:
    """Decode → perceptual difference hash (dHash): grayscale by
    integer mean ((r+g+b) div 3), nearest-neighbor sample onto an
    8-row × 9-column grid with the same floor map as resize_nearest
    (src = dst·srcdim // dstdim), then one bit per horizontal
    neighbor comparison gray[r][c] > gray[r][c+1] — the classic
    64-bit near-duplicate image fingerprint (robust to resizing,
    cheap to Hamming-band, the image-side analogue of SimHash).

    The 64 bits ship as TWO bigints (rows 0-3 → ``phash_hi``, rows
    4-7 → ``phash_lo``, bit (r mod 4)·8+c): bit 63 of a single
    packed hash would need 1<<63, signed-overflow territory in
    numpy, Spark, and DuckDB alike. Every step is integer
    arithmetic, so a SQL oracle replays the hash from the pixel
    formula exactly; dup GROUPS are real — the BMP formula and
    dimensions repeat with period 256 in the asset id, so corpora
    larger than 256 docs contain exact perceptual duplicates."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rsel = np.arange(8)
        csel = np.arange(9)
        bitw = np.arange(4)[:, None] * 8 + np.arange(8)[None, :]

        for pdf in it:
            rows = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                px = decode_bmp(payload).astype(np.int64)
                h, w, _ = px.shape
                gray = px.sum(axis=2) // 3
                small = gray[np.ix_((rsel * h) // 8, (csel * w) // 9)]
                bits = (small[:, :-1] > small[:, 1:]).astype(np.int64)
                hi = int((bits[:4] << bitw).sum())
                lo = int((bits[4:] << bitw).sum())
                rows.append((int(asset_id), hi, lo))
            yield pd.DataFrame(
                rows, columns=["asset_id", "phash_hi", "phash_lo"]
            )

    return assets.mapInPandas(
        batches, schema="asset_id long, phash_hi long, phash_lo long"
    )


def audio_feature_audit(assets: DataFrame, *, n_frames: int = 4) -> DataFrame:
    """Decode → classic audio front-end features, all in exact integer
    arithmetic so a SQL oracle can replay them from the sample formula:

    - ``energy``        Σ sᵢ²  (the un-normalized RMS numerator)
    - ``zero_crossings``  #{i ≥ 1 : sᵢ₋₁·sᵢ < 0} — strict sign flips,
      the standard voiced/unvoiced discriminator
    - ``peak``          max |sᵢ|
    - ``loudest_frame`` argmax over ``n_frames`` balanced frames of the
      frame energy (frame of sample i = (i·n_frames) div n — the
      balanced-partition map SQL replays with integer division), ties
      to the lowest frame index

    Same execution shape as the decode audits: vectorized numpy inside
    Arrow-batched ``mapInPandas``, payload bytes never become Python
    row objects. int64 bounds: n ≤ 384 samples of |s| ≤ 2048 →
    energy ≤ 1.7e9, far inside the exact range."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                samples, _rate = decode_wav_pcm16(payload)
                s = samples.astype(np.int64)
                n = len(s)
                if n:
                    frames = (np.arange(n) * n_frames) // n
                    fe = np.bincount(frames, weights=(s * s).astype(np.float64),
                                     minlength=n_frames).astype(np.int64)
                    loudest = int(np.argmax(fe))  # argmax ties → lowest index
                    zc = int(np.sum(s[:-1] * s[1:] < 0))
                    peak = int(np.abs(s).max())
                else:
                    loudest, zc, peak = 0, 0, 0
                rows.append(
                    (int(asset_id), n, int((s * s).sum()), zc, peak, loudest)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "n_samples", "energy",
                    "zero_crossings", "peak", "loudest_frame",
                ],
            )

    return assets.mapInPandas(
        batches,
        schema=(
            "asset_id long, n_samples long, energy long, "
            "zero_crossings long, peak long, loudest_frame long"
        ),
    )
