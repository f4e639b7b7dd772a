"""Cross-document span-level dedup (C4/RefinedWeb-style boilerplate
detection).

Document-level dedup (exact/minhash/simhash — siblings in this package)
misses the common pathology of PARTIAL duplication: navigation chrome,
license headers, templated paragraphs repeated across otherwise-distinct
pages. The standard remedy is span-granular: split every document into
fixed-width token spans, fingerprint each span, and flag spans whose
fingerprint occurs in more than one document.

Scale shape (100 TB): explode to one row per span (JVM generator, no
Python), hash-aggregate fingerprint → distinct-doc count (partial maps
combine before the shuffle), equi-join the span table back on the
fingerprint, and re-aggregate per document. Two shuffles total, both on
well-distributed md5 keys — no skew, no cartesian, no driver state.

The fingerprint is md5 over the space-joined span, so any SQL engine
replays the identical span set (DuckDB oracle in plans/content.py).
No reference analogue (the reference has no text operators at all);
beyond-reference per the training-data-pipeline brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..text.analysis import tokens_col


def cross_doc_span_stats(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    span_words: int = 8,
    persist_spans: bool = False,
) -> DataFrame:
    """(id, n_spans, n_dup_spans, dup_span_ratio) per document.

    Spans are consecutive NON-overlapping ``span_words``-token windows;
    the ragged tail shorter than ``span_words`` is dropped (documents
    with fewer tokens than one span get ``n_spans = 0``). A span is
    duplicated when its fingerprint appears in ≥ 2 distinct documents —
    intra-document repetition is a different signal (text_repetition)
    and deliberately does not count here.

    ``persist_spans``: the span table feeds TWO consumers (the
    fingerprint-count aggregate and the join back), so the
    tokenize+md5 subtree executes twice by default. A lazy
    localCheckpoint trades that recompute for materializing the span
    table (≈ the corpus text bytes) to local disk — output-identical,
    and corpus-DEPENDENT (r11 A/B at local[32]): 3× faster on the
    long-document sf0.1 corpus (6.8 → 2.3 s), 18 % slower on a
    short-document 50k corpus where spans are cheap to recompute
    (6.8 → 8.0 s). Enable when documents are long relative to the
    span width or the source scan is remote/expensive; the catalog
    query keeps the recompute default.
    """
    toks = df.select(
        F.col(id_col).alias("_id"), tokens_col(F.col(text_col)).alias("_toks")
    )
    n_spans = F.floor(F.size("_toks") / span_words).cast("int")
    span_idx = F.sequence(F.lit(0), n_spans - 1)
    span_str = lambda j: F.concat_ws(  # noqa: E731
        " ", F.slice("_toks", j * span_words + 1, span_words)
    )
    spans = (
        toks.select(
            "_id",
            F.when(n_spans > 0, F.transform(span_idx, span_str))
            .otherwise(F.array().cast("array<string>"))
            .alias("_spans"),
        )
        .select("_id", F.explode("_spans").alias("_span"))
        .select("_id", F.md5(F.col("_span")).alias("_fp"))
    )
    if persist_spans:
        spans = spans.localCheckpoint(eager=False)
    # fingerprint → how many DISTINCT documents contain it
    fp_docs = spans.groupBy("_fp").agg(
        F.count_distinct("_id").alias("_n_docs")
    )
    per_doc = (
        spans.join(fp_docs, "_fp")
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum((F.col("_n_docs") > 1).cast("long")).alias("n_dup_spans"),
        )
    )
    base = df.select(F.col(id_col).alias("_id"))
    return (
        base.join(per_doc, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
            F.coalesce("n_dup_spans", F.lit(0)).cast("long").alias("n_dup_spans"),
            F.when(
                F.coalesce("n_spans", F.lit(0)) > 0,
                F.round(
                    F.coalesce("n_dup_spans", F.lit(0)).cast("double")
                    / F.col("n_spans"),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_span_ratio"),
        )
    )


def scrub_duplicate_spans(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    span_words: int = 8,
) -> DataFrame:
    """Exact substring dedup WITH document rewrite (the Lee et al. 2022
    "Deduplicating Training Data Makes Language Models Better" shape):
    drop every non-overlapping ``span_words``-token span whose
    fingerprint has an earlier occurrence anywhere in the corpus, then
    reassemble each document from its kept spans plus the ragged tail.

    First-occurrence semantics: occurrences are ordered by
    (document id, span index); only the lexicographically first copy of
    each fingerprint survives. Intra-document repeats therefore also
    collapse to their first occurrence. The tail (tokens past the last
    full span) is never dropped — it is not span-aligned, so treating
    it as a span would create false cross-doc matches between unrelated
    short suffixes.

    Output: (id, n_spans, n_spans_dropped, new_n_tokens, new_fp) where
    ``new_fp`` is md5 of the space-joined rewritten text — one scalar a
    SQL oracle can replay to prove the whole rewrite byte-for-byte.

    Scale shape: explode to one row per span, ONE window over the
    md5-fingerprint key (well-distributed — no skew) for the
    first-occurrence rank, then a per-document sort-aggregate to
    reassemble. Two shuffles, both on bounded keys; no driver state.
    """
    toks = df.select(
        F.col(id_col).alias("_id"), tokens_col(F.col(text_col)).alias("_toks")
    )
    n_spans = F.floor(F.size("_toks") / span_words).cast("int")
    span_idx = F.sequence(F.lit(0), n_spans - 1)
    span_str = lambda j: F.concat_ws(  # noqa: E731
        " ", F.slice("_toks", j * span_words + 1, span_words)
    )
    tail = F.concat_ws(
        " ", F.slice("_toks", n_spans * span_words + 1, F.size("_toks"))
    )
    base = toks.select(
        "_id",
        n_spans.alias("_n_spans"),
        F.when(n_spans > 0, F.transform(span_idx, span_str))
        .otherwise(F.array().cast("array<string>"))
        .alias("_spans"),
        tail.alias("_tail"),
    )
    # consumed twice (span explode + per-doc tail rejoin) WITHOUT a
    # persist: the recompute is one extra tokenize scan that stays
    # pipelined, cheaper than owning an unpersist contract here

    from pyspark.sql.window import Window

    spans = base.select(
        "_id", F.posexplode("_spans").alias("_idx", "_span")
    ).withColumn("_fp", F.md5("_span"))
    w = Window.partitionBy("_fp").orderBy(F.asc("_id"), F.asc("_idx"))
    kept = (
        spans.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("_n_kept"),
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_idx", "_span"))),
                    lambda s: s["_span"],
                ),
            ).alias("_kept_text"),
        )
    )
    out = (
        base.join(kept, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.col("_n_spans").cast("long").alias("n_spans"),
            (F.col("_n_spans") - F.coalesce("_n_kept", F.lit(0)))
            .cast("long")
            .alias("n_spans_dropped"),
            F.concat_ws(
                " ", F.coalesce("_kept_text", F.lit("")), F.col("_tail")
            ).alias("_joined"),
            F.coalesce("_n_kept", F.lit(0)).alias("_n_kept"),
            F.col("_tail"),
        )
        .select(
            id_col,
            "n_spans",
            "n_spans_dropped",
            (
                F.col("_n_kept") * span_words
                + F.when(F.col("_tail") == "", 0).otherwise(
                    F.size(F.split("_tail", " "))
                )
            )
            .cast("long")
            .alias("new_n_tokens"),
            F.md5(F.trim("_joined")).alias("new_fp"),
        )
    )
    return out
