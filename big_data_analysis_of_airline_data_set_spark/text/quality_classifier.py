"""Hashed n-gram linear quality scorer — fastText-shaped, JVM-only.

Production corpora are scored by a pretrained linear classifier over
hashed bag-of-n-grams features (fastText: unigrams + bigrams hashed to
B buckets, mean of bucket weights through a sigmoid). This operator is
that EXECUTION SHAPE with a deterministic md5-derived weight table
standing in for trained weights: every step — tokenize, bigram
construction, feature hashing, weight lookup, mean, sigmoid — is a
pure Column expression (split / transform / aggregate higher-order
functions). ZERO shuffle, zero Python: at 100 TB this is a map-only
pass that scales linearly with input splits, which is exactly how a
corpus-wide quality sweep must behave.

The md5 bucket hash is the repo's replayable construction
(14-hex-digit prefix → BIGINT, same as sketches/countmin.py), so the
DuckDB oracle recomputes identical scores; swapping the synthetic
weight array for a trained one changes no plan shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .analysis import bind_once

N_BUCKETS = 4096
_W_MOD = 101  # weight(b) = (b % 101)/50 − 1  ∈ [−1, 1]
_SIGMOID_SCALE = 4.0


def _bucket(gram: Column) -> Column:
    """md5-derived feature bucket in [0, N_BUCKETS) — 14 hex digits
    < 2^56 keeps the int exact on both engines."""
    return F.conv(F.substring(F.md5(F.concat(F.lit("q_"), gram)), 1, 14), 16, 10).cast(
        "long"
    ) % N_BUCKETS


def _weight_numerator(bucket: Column) -> Column:
    """Integer weight numerator in [−50, 50]; weight = numerator / 50.
    Accumulating NUMERATORS keeps the fold exact int64 arithmetic, so
    the engines cannot diverge on float addition order — the single
    float op (one division + sigmoid at the end) is identical on both."""
    return (bucket % _W_MOD) - (_W_MOD // 2)


def quality_scores(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_grams, quality_score): sigmoid of the mean hashed-gram
    weight over unigrams + adjacent bigrams. Empty docs score 0.5
    (sigmoid(0) — no evidence).

    Evaluation structure (round 10): the token array and the gram
    array are each bound ONCE per row via ``text.analysis.bind_once``,
    and the three outputs emerge from ONE struct through an
    ``inline(array(struct))`` generator — Generate evaluates its input
    once per row and CollapseProject cannot merge a projection into a
    generator, so nothing gets textually duplicated. The previous body
    referenced the split inside the bigram lambda (re-tokenize per
    bigram) and the gram array in four places: measured 19-25 s →
    2.8-4 s at sf0.1 with byte-identical output (BASELINE.md
    round-10)."""

    def over_grams(grams):
        n_grams = F.size(grams)
        total_num = F.aggregate(
            grams,
            F.lit(0).cast("long"),
            lambda acc, g: acc + _weight_numerator(_bucket(g)),
        )
        raw = F.when(
            n_grams > 0,
            total_num.cast("double") / ((_W_MOD // 2) * n_grams),
        ).otherwise(F.lit(0.0))
        score = 1.0 / (1.0 + F.exp(-_SIGMOID_SCALE * raw))
        return F.struct(
            n_grams.cast("long").alias("n_grams"),
            total_num.alias("weight_numerator"),
            F.round(score, 6).alias("quality_score"),
        )

    def over_toks(toks):
        bigram_idx = F.sequence(F.lit(1), F.size(toks) - 1)
        bigrams = F.when(
            F.size(toks) >= 2,
            F.transform(
                bigram_idx,
                lambda i: F.concat(
                    F.element_at(toks, i), F.lit("_"), F.element_at(toks, i + 1)
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        return bind_once(F.concat(toks, bigrams), over_grams)

    scored = bind_once(F.split(F.trim(F.col(text_col)), r"\s+"), over_toks)
    # per-gram md5 multiplies per-row work ~100× over the input bytes —
    # rebalance a small input first (no-op on large ones)
    from ..operators.transforms import rebalance_for_fanout

    docs = rebalance_for_fanout(docs.select(F.col(id_col), F.col(text_col)))
    return docs.select(F.col(id_col), F.inline(F.array(scored)))
