"""Sliding-window document chunking — long docs → training chunks.

The other half of sequence preparation next to packing.py: packing
concatenates SHORT docs into fixed budgets; chunking splits LONG docs
into overlapping windows (stride < chunk_size keeps ``chunk_size −
stride`` tokens of context across the cut — the standard long-document
pretraining/fine-tuning treatment, and the retrieval-index unit for
RAG corpora).

Semantics (deterministic, SQL-replayable): tokens = whitespace split;
chunk k covers tokens [k·stride, k·stride + chunk_size) for every
k·stride < n_tokens — so the tail chunk may be short, every token is
covered, and a doc shorter than chunk_size yields exactly one chunk.
The chunk fingerprint is md5 of the space-rejoined token slice, so an
oracle pins the chunk CONTENT byte-for-byte, not just offsets.

Scale shape: pure per-row expressions — split, a sequence() explode
bounded by ceil(n/stride) per doc, slice + array_join + md5. No
shuffle, no UDF; a 100 TB corpus chunks in one map-only stage and the
explode fan-out is exactly the output size (no intermediate blowup).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..text.analysis import tokens_col


def chunk_documents(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    chunk_size: int = 32,
    stride: int = 24,
) -> DataFrame:
    """(id, chunk_idx, start_token, n_tokens, chunk_fp) — one row per
    sliding window. ``stride`` ≤ ``chunk_size`` gives overlapping
    context; ``stride`` == ``chunk_size`` gives disjoint blocks."""
    if not 0 < stride <= chunk_size:
        raise ValueError(f"need 0 < stride <= chunk_size, got {stride}/{chunk_size}")
    # NULL text yields NO chunks on both engines: without the filter,
    # Spark's greatest(NULL-last_k, 0) emits a garbage chunk-0 row
    # while SQL generate_series(0, NULL) emits none (review finding)
    df = df.filter(F.col(text_col).isNotNull())
    toks: Column = tokens_col(F.col(text_col))
    n = F.size(toks)
    # k = 0 .. ceil(n/stride) - 1  ==  floor((n-1)/stride), n ≥ 1
    last_k = F.floor((n - F.lit(1)) / stride).cast("int")
    return (
        df.select(
            F.col(id_col).alias("id"),
            toks.alias("_toks"),
            F.explode(F.sequence(F.lit(0), F.greatest(last_k, F.lit(0)))).alias(
                "chunk_idx"
            ),
        )
        .select(
            "id",
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            (F.col("chunk_idx") * stride).cast("long").alias("start_token"),
            F.size(F.slice(F.col("_toks"), F.col("chunk_idx") * stride + 1, chunk_size))
            .cast("long")
            .alias("n_tokens"),
            F.md5(
                F.array_join(
                    F.slice(F.col("_toks"), F.col("chunk_idx") * stride + 1, chunk_size),
                    " ",
                )
            ).alias("chunk_fp"),
        )
    )
