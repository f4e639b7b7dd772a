"""Bigram-LM perplexity scoring — CCNet-style model-based quality
bucketing (Wenzek et al. 2020 scored CommonCrawl by Wikipedia-LM
perplexity; the buckets drive keep/drop/down-sample decisions).

This is the EXECUTION SHAPE of that pipeline with the reference model
built in-frame from a held-out corpus slice instead of a shipped KenLM
binary: count bigrams over the reference slice, then score every
document by the mean negative log2 probability of its bigrams under
add-one smoothing,

    bits(doc) = -(1/n) * sum log2( (c(w1,w2)+1) / (c(w1)+V) )

where c(.) are reference counts, V the reference vocabulary size, and
n the document's bigram count. Lower bits = more reference-like.
Swapping the in-frame counts for a real pretrained table changes no
plan shape (the counts arrive as two join-able tables either way).

Scale shape (100 TB): the reference model is two hash-aggregates over
the reference slice (bigram counts; history counts). Scoring is one
explode to bigram rows, one shuffle join on the bigram key (uniformly
md5-distributed vocabulary, no skew), one broadcast-able join on the
history key, and a per-doc hash-agg. No window, no driver state, no
row-at-a-time Python. Expression shapes follow docs/expression-shapes
.md: tokens are bound ONCE per row (``bind_once``) and the bigram
array is emitted from that binding, so nothing re-tokenizes per gram.

Engine parity: counts are exact integers; each per-bigram term is one
IEEE division + one log2. log2 is within 1 ulp on both engines
(same-class libm) and the final figure is rounded to 6 dp after a
division by n — the same transcendental-plus-round-6 contract
text/quality_classifier.py's sigmoid established (a mismatch needs a
sum landing within ~1e-10 of a rounding boundary).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .analysis import bind_once, tokens_col


def bigrams_col(text: Column) -> Column:
    """array<struct<w1,w2>> of adjacent token pairs; empty for docs
    with fewer than 2 tokens. Tokens bound once per row."""

    def over_toks(toks: Column) -> Column:
        idx = F.sequence(F.lit(1), F.size(toks) - 1)
        return F.when(
            F.size(toks) >= 2,
            F.transform(
                idx,
                lambda i: F.struct(
                    F.element_at(toks, i).alias("w1"),
                    F.element_at(toks, i + 1).alias("w2"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))

    return bind_once(tokens_col(text), over_toks)


def bigram_reference_model(
    ref_docs: DataFrame, *, text_col: str
) -> tuple[DataFrame, DataFrame, int]:
    """(bigram_counts(w1, w2, c12), history_counts(w1, c1), V) from a
    reference corpus. ``c1`` counts w1 as a bigram HISTORY (every
    occurrence except document-final), matching the denominator the
    add-one estimator needs; ``V`` is the reference's distinct-token
    vocabulary size (one scalar aggregate)."""
    pairs = ref_docs.select(
        F.explode(bigrams_col(F.col(text_col))).alias("_b")
    ).select(F.col("_b.w1").alias("w1"), F.col("_b.w2").alias("w2"))
    bigram_counts = pairs.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("c12")
    )
    history_counts = pairs.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab_size = (
        ref_docs.select(F.explode(tokens_col(F.col(text_col))).alias("_t"))
        .agg(F.count_distinct("_t"))
        .first()[0]
    )
    return bigram_counts, history_counts, int(vocab_size)


def perplexity_scores(
    docs: DataFrame,
    *,
    id_col: str,
    text_col: str,
    ref_mod: int = 10,
) -> DataFrame:
    """(id, n_bigrams, ppl_bits) for every document, scored against the
    reference slice ``id % ref_mod == 0`` (deterministic, replayable —
    the same id-arithmetic slicing the curation splitters use).
    Documents with no bigrams score NULL bits (no evidence; the
    CCNet-style pipeline buckets them separately). Unseen bigrams fall
    back to the add-one floor (c12=0, and c1=0 for unseen histories →
    P = 1/V), so scores are defined for every scorable document."""
    ref = docs.filter((F.col(id_col) % ref_mod) == 0)
    bigram_counts, history_counts, v = bigram_reference_model(
        ref, text_col=text_col
    )
    doc_pairs = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(bigrams_col(F.col(text_col))).alias("_b"),
    ).select("_id", F.col("_b.w1").alias("w1"), F.col("_b.w2").alias("w2"))
    # history_counts is keyed by every distinct reference token — an
    # UNBOUNDED vocabulary at the 100 TB posture, so forcing a
    # broadcast here would be a driver/executor OOM risk on a large
    # reference slice (round-12 advice).  Left to AQE: below
    # autoBroadcastJoinThreshold it still broadcasts at runtime from
    # measured stats; above it the join shuffles on w1, which is the
    # correct plan for a big vocabulary.
    scored = (
        doc_pairs.join(bigram_counts, ["w1", "w2"], "left")
        .join(history_counts, ["w1"], "left")
        .select(
            "_id",
            (
                -F.log2(
                    (F.coalesce(F.col("c12"), F.lit(0)) + 1).cast("double")
                    / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(v)).cast(
                        "double"
                    )
                )
            ).alias("_bits"),
        )
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.round(F.sum("_bits") / F.count(F.lit(1)), 6).alias("ppl_bits"),
        )
    )
    base = docs.select(F.col(id_col).alias("_id"))
    return base.join(scored, "_id", "left").select(
        F.col("_id").alias(id_col),
        F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
        F.col("ppl_bits"),
    )
