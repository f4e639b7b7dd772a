"""Benchmark-contamination check: flag training documents sharing any
word n-gram with a held-out benchmark set.

The standard decontamination pass before LLM pretraining (n-gram
overlap against eval benchmarks). Shape at 100 TB: the benchmark
shingle set is tiny (benchmarks are MBs, the corpus is TBs) — it
becomes a broadcast hash set, so the corpus side is a single scan with
a map-side join + one groupBy on doc id. No corpus-vs-corpus shuffle
ever happens.

Shingles are md5-hashed (engine-universal) so an external SQL oracle
replays the exact hit set — same discipline as dedup.minhash.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..dedup.ngram import shingles_from_tokens
from ..text.analysis import bind_once, tokens_col


def _hashed_shingles(text: Column, n: int) -> Column:
    # bind_once materializes the token array per row BEFORE the gram
    # lambdas see it; passing tokens_col(text) straight into
    # shingles_from_tokens re-tokenizes per gram (its docstring's
    # warning — this function did exactly that until round 10:
    # ~(2 + grams) regexp splits per document, measured 28.5 s vs
    # 0.9 s at sf0.1 for the identical output; BASELINE.md round-10).
    return bind_once(
        tokens_col(text),
        lambda toks: F.transform(
            shingles_from_tokens(toks, n), lambda g: F.md5(g)
        ),
    )


def contamination_hits(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    is_benchmark: Column,
    n: int = 5,
) -> DataFrame:
    """Per TRAINING document: how many of its distinct ``n``-gram
    shingles also occur in any benchmark document. Returns every
    training row — ``n_hits = 0`` for clean docs, ``contaminated``
    boolean alongside — so downstream filtering is a plain predicate.
    """
    from ..operators.transforms import rebalance_for_fanout

    # per-gram md5 shingling multiplies per-row work well past the
    # input bytes the scan partitioning was sized by — rebalance a
    # small input first (no-op on large ones)
    src = rebalance_for_fanout(
        df.select(F.col(id_col), is_benchmark.alias("_bench_src"), F.col(text_col))
    )
    sh = src.select(
        F.col(id_col).alias("_id"),
        F.col("_bench_src").alias("_bench"),
        _hashed_shingles(F.col(text_col), n).alias("_sh"),
    )
    bench = (
        sh.filter(F.col("_bench"))
        .select(F.explode("_sh").alias("h"))
        .distinct()
    )
    train = sh.filter(~F.col("_bench"))
    hits = (
        train.select("_id", F.explode("_sh").alias("h"))
        .join(F.broadcast(bench), "h")
        .groupBy("_id")
        .agg(F.count(F.lit(1)).alias("_hits"))
    )
    return (
        train.select("_id")
        .join(hits, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce(F.col("_hits"), F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce(F.col("_hits"), F.lit(0)) > 0).alias("contaminated"),
        )
    )
