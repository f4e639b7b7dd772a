"""Text-analysis column library (beyond-reference north star: the ops a
large-scale training-data pipeline runs over a ``documents`` table).

All pure JVM-side Column expressions (no UDFs): tokenization, token
stats, stopword-based language ID, quality components, and content
fingerprints. Each is deliberately SQL-expressible so the DuckDB oracle
can replicate it exactly — the point is correctness at 100 TB with
whole-stage codegen, not Python loops.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Minimal per-language stopword lists for n-gram/stopword language ID.
# Tie-break order is the tuple order (first wins).
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "de": ("der", "die", "das", "und", "ist"),
    "es": ("el", "los", "de", "y", "es"),
    "fr": ("le", "les", "et", "une", "est"),
}


def normalized_text(text: Column) -> Column:
    """lower + whitespace-collapse + trim — canonical form for
    fingerprinting and exact dedup."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def tokens_col(text: Column) -> Column:
    """Whitespace tokenization of the trimmed text."""
    return F.split(F.trim(text), r"\s+")


def bind_once(col: Column, body) -> Column:
    """Evaluate ``col`` ONCE per row and hand it to ``body`` as a
    lambda variable: ``element_at(transform(array(col), body), 1)``.

    Catalyst substitutes aliases back into consumers (CollapseProject /
    PushDownPredicates) and neither FilterExec nor interpreted HOF
    lambdas do common-subexpression elimination, so every TEXTUAL
    occurrence of an expression executes per row — and an expression
    referenced inside a lambda executes once per ELEMENT. A regexp
    split referenced by an n-gram lambda therefore re-tokenizes the
    document once per gram (measured: 28.5 s for 250k grams at sf0.1
    vs 0.9 s through this binder — BASELINE.md round-10). Lambda
    variables are the one expression-level vehicle Catalyst never
    substitutes through, so this makes single evaluation structural
    rather than hoping a projection survives optimization. Limits:
    scalar subqueries may not appear under ``body`` (Spark rejects
    subqueries inside higher-order functions), and the HOF itself
    evaluates outside whole-stage codegen — worth it only when ``col``
    is expensive relative to an interpreted-eval round trip."""
    return F.element_at(F.transform(F.array(col), body), 1)


def token_count(text: Column) -> Column:
    return F.size(tokens_col(text)).cast("long")


def content_fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of the normalized text. (Content-hash
    fingerprinting; engine-portable by construction, unlike xxhash64
    which is Spark-specific — that variant lives in dedup.simhash.)"""
    return F.md5(normalized_text(text))


BPE_PRETOKEN_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]+"


def bpe_style_token_count(text: Column) -> Column:
    """GPT-2-style pre-tokenizer count: runs of letters, runs of digits,
    and runs of other non-space symbols each count as one token — the
    standard upper-bound proxy for BPE token counts when no vocab is
    loadable. Plain character classes (not \\p{L}) so the Java-regex
    (Spark) and RE2 (DuckDB oracle) behaviors are identical."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_PRETOKEN_RE), 0)).cast("long")


def winnowing_fingerprints(df, *, id_col: str, text_col: str, k: int = 8, window: int = 4):
    """Winnowing document fingerprints (Schleimer et al. '03) →
    (id, fingerprint) long-form rows: hash all char k-grams of the
    normalized text, slide a window of ``window`` hashes, keep each
    window's minimum, dedupe. Robust to local edits — two documents
    sharing any fingerprint share a k-char run.

    md5 (lexicographic min of hex digests) keeps the construction
    engine-portable (no UDFs, mirrors in DuckDB). Implemented as
    posexplode → one md5 per gram row → windowed min over the next
    ``window`` rows: nested-array formulations re-evaluate the gram
    array inside the window lambda (Catalyst collapses the projects),
    which measured as an O(n²) md5 blowup — the row/window form does
    exactly one hash per gram and one shuffle per doc."""
    from pyspark.sql.window import Window

    norm = df.select(
        F.col(id_col).alias("_id"), normalized_text(F.col(text_col)).alias("_norm")
    )
    positions = norm.select(
        "_id",
        (F.length("_norm") - (k - 1)).alias("_n_grams"),
        F.posexplode(
            F.sequence(F.lit(1), F.greatest(F.length("_norm") - (k - 1), F.lit(0)))
        ).alias("_p", "_i"),
        F.col("_norm"),
    )
    hashes = positions.select(
        "_id",
        "_n_grams",
        "_i",
        F.md5(F.col("_norm").substr(F.col("_i"), F.lit(k))).alias("_h"),
    )
    w = (
        Window.partitionBy("_id")
        .orderBy("_i")
        .rowsBetween(Window.currentRow, window - 1)
    )
    return (
        hashes.withColumn("_fp", F.min("_h").over(w))
        .filter(F.col("_i") <= F.col("_n_grams") - (window - 1))
        .select(F.col("_id").alias(id_col), F.col("_fp").alias("fingerprint"))
        .distinct()
    )


def stopword_count_of(tokens: Column, words: tuple[str, ...]) -> Column:
    """How many elements of a TOKEN-ARRAY column are in ``words``
    (duplicates counted) — the bound-tokens form for callers that
    already hold the array (one tokenization feeding many counts).

    The wordset is ONE array Literal (``F.lit(list)``), not
    ``F.array(*[F.lit(w) …])``: a CreateArray referenced inside the
    filter lambda re-builds the array per TOKEN (no CSE in HOF lambdas
    — docs/expression-shapes.md), while a Literal is a leaf the
    evaluator returns by reference. Same output, ~20× less per-token
    work for a 20-word list."""
    wordset = F.lit(list(words))
    return F.size(F.filter(tokens, lambda t: F.array_contains(wordset, t))).cast("long")


def stopword_count(text: Column, words: tuple[str, ...]) -> Column:
    """How many tokens of ``text`` are in ``words`` (duplicates
    counted). Tokenizes per call — when one expression needs several
    counts of the SAME text, bind the tokens once and use
    ``stopword_count_of`` (every textual occurrence of this function
    re-runs the regexp split per row; docs/expression-shapes.md)."""
    return stopword_count_of(tokens_col(text), words)


def _lang_case(counts: dict[str, Column]) -> Column:
    """Argmax CASE over per-language counts, ties resolved by
    LANG_STOPWORDS order, 'und' when nothing matches."""
    langs = list(LANG_STOPWORDS)
    expr = F.lit("und")
    # build the CASE from last to first so earlier langs win ties
    for lang in reversed(langs):
        cond = counts[lang] > 0
        for other in langs:
            if other == lang:
                continue
            # strictly greater than languages EARLIER in tie order,
            # greater-or-equal to later ones
            if langs.index(other) < langs.index(lang):
                cond = cond & (counts[lang] > counts[other])
            else:
                cond = cond & (counts[lang] >= counts[other])
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def lang_id_expr(text: Column) -> Column:
    """Stopword-count argmax over LANG_STOPWORDS, ties resolved by dict
    order, 'und' (undetermined) when no list matches at all.

    Shape (round-11 expression-shape audit): the token array is bound
    ONCE per row and the four per-language counts ONCE as a struct —
    the argmax CASE references each count ~4 times, and with inline
    count expressions each textual reference re-ran the regexp split
    (28 splits per row measured on the old plan; now 1). Struct-field
    reads of a lambda variable are free."""
    langs = list(LANG_STOPWORDS)

    def over_toks(toks: Column) -> Column:
        counts = F.struct(
            *[
                stopword_count_of(toks, LANG_STOPWORDS[lang]).alias(lang)
                for lang in langs
            ]
        )
        return bind_once(counts, lambda c: _lang_case({l: c[l] for l in langs}))

    return bind_once(tokens_col(text), over_toks)


def quality_components(text: Column) -> dict[str, Column]:
    """Document-quality signals: length, token stats, stopword ratio,
    mean token length. Combine however the pipeline needs; the catalog
    query freezes one scoring formula.

    Each dict value is an INDEPENDENT expression — selecting several
    re-tokenizes per column. Hot paths that want all of them should
    emit ``quality_struct`` through ``F.inline(F.array(...))``
    instead (one tokenization per row)."""
    n_tokens = token_count(text)
    n_chars = F.length(text).cast("long")
    non_space = F.length(F.regexp_replace(text, r"\s", ""))
    en_stop = stopword_count(text, LANG_STOPWORDS["en"])
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "mean_token_len": (non_space.cast("double") / n_tokens),
        "stopword_ratio": (en_stop.cast("double") / n_tokens),
    }


def quality_struct(text: Column) -> Column:
    """``struct(n_chars, n_tokens, mean_token_len, stopword_ratio)``
    with the token array bound ONCE per row (r11 expression-shape
    audit; same formulas as ``quality_components``).

    Emit it through ``F.inline(F.array(struct))`` — a Generate
    evaluates its input once per row and CollapseProject cannot merge
    a projection into it. Extracting fields in a PLAIN projection
    instead re-evaluates the whole struct per field
    (docs/expression-shapes.md)."""
    n_chars = F.length(text).cast("long")
    non_space = F.length(F.regexp_replace(text, r"\s", ""))

    def over_toks(toks: Column) -> Column:
        n_tokens = F.size(toks).cast("long")
        en_stop = stopword_count_of(toks, LANG_STOPWORDS["en"])
        return F.struct(
            n_chars.alias("n_chars"),
            n_tokens.alias("n_tokens"),
            (non_space.cast("double") / n_tokens).alias("mean_token_len"),
            (en_stop.cast("double") / n_tokens).alias("stopword_ratio"),
        )

    return bind_once(tokens_col(text), over_toks)


def oov_stats(
    df,
    *,
    id_col: str,
    text_col: str,
    vocab_size: int,
):
    """(id, n_tokens, n_oov, oov_rate) per document, against a reference
    vocabulary built from the corpus itself: the ``vocab_size`` most
    frequent tokens (count desc, token asc tie-break — deterministic,
    engine-replayable).

    The tokenizer-coverage check a training pipeline runs before
    committing to a vocabulary: documents with high out-of-vocabulary
    rates either need a bigger vocab or are noise. Scale shape: one
    explode + hash-agg for the vocab (top-V via TakeOrderedAndProject),
    vocab broadcast back over the exploded tokens, one per-doc agg.
    """
    from pyspark.sql import functions as F

    toks = df.select(
        F.col(id_col).alias("_id"), F.explode(tokens_col(F.col(text_col))).alias("_tok")
    )
    vocab = (
        toks.groupBy("_tok")
        .agg(F.count(F.lit(1)).alias("_n"))
        .orderBy(F.desc("_n"), F.asc("_tok"))
        .limit(vocab_size)
        .select("_tok", F.lit(True).alias("_in_vocab"))
    )
    per_doc = (
        toks.join(F.broadcast(vocab), "_tok", "left")
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum(F.col("_in_vocab").isNull().cast("long")).alias("n_oov"),
        )
    )
    base = df.select(F.col(id_col).alias("_id"))
    return base.join(per_doc, "_id", "left").select(
        F.col("_id").alias(id_col),
        F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
        F.coalesce("n_oov", F.lit(0)).cast("long").alias("n_oov"),
        F.when(
            F.coalesce("n_tokens", F.lit(0)) > 0,
            F.round(F.col("n_oov").cast("double") / F.col("n_tokens"), 6),
        )
        .otherwise(F.lit(0.0))
        .alias("oov_rate"),
    )


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(
    text: Column,
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_word_ratio: float = 0.8,
    min_stopword_hits: int = 2,
) -> dict[str, Column]:
    """The published Gopher quality-filter heuristics (Rae et al. 2021,
    appendix A) as boolean Column expressions — the standard pre-filter
    a web-scale corpus runs before any model-based scoring:

    - ``words_in_range``       min_words ≤ #words ≤ max_words
    - ``mean_word_len_ok``     3 ≤ mean word length ≤ 10
    - ``symbol_ratio_ok``      (# of '#' or '…'/'...') / words ≤ 0.1
    - ``alpha_word_ratio_ok``  ≥ 80 % of words contain a letter
    - ``stopwords_ok``         ≥ 2 occurrences from the 8-word list

    Engine parity: every ratio is one double division of two exact
    integers, compared with ≤/≥ — both engines compute the identical
    IEEE double, so the booleans match bit-for-bit. All five rules and
    the AND fold into one shuffle-free codegen projection.
    """
    toks = tokens_col(text)
    n = F.size(toks).cast("long")
    non_space = F.length(F.regexp_replace(text, r"\s", "")).cast("long")
    n_symbols = (
        F.size(F.regexp_extract_all(text, F.lit(r"#|\.\.\.|…"), 0)).cast("long")
    )
    n_alpha_words = F.size(
        F.filter(toks, lambda t: t.rlike("[a-zA-Z]"))
    ).cast("long")
    stop_hits = stopword_count(text, GOPHER_STOPWORDS)
    return {
        "words_in_range": (n >= min_words) & (n <= max_words),
        "mean_word_len_ok": (
            (non_space.cast("double") / n >= min_mean_word_len)
            & (non_space.cast("double") / n <= max_mean_word_len)
        ),
        "symbol_ratio_ok": (n_symbols.cast("double") / n <= max_symbol_ratio),
        "alpha_word_ratio_ok": (
            n_alpha_words.cast("double") / n >= min_alpha_word_ratio
        ),
        "stopwords_ok": stop_hits >= min_stopword_hits,
    }


def gopher_rules_struct(
    text: Column,
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_word_ratio: float = 0.8,
    min_stopword_hits: int = 2,
) -> Column:
    """The five ``gopher_rules`` booleans plus their AND as ONE struct
    (r11 expression-shape audit): the token array is bound once per
    row, the five integer scalars once as a struct, and every boolean
    (including ``keep``, which references all five) reads struct
    FIELDS of a lambda variable — the dict form re-tokenized per
    selected rule (16 splits per row measured on the catalog query;
    now 1 split + 2 regex passes). Same formulas, same engine-parity
    argument as ``gopher_rules``. Emit through
    ``F.inline(F.array(struct))`` (see ``quality_struct``)."""

    def over_scalars(s: Column) -> Column:
        n = s["n"]
        mean_len = s["non_space"].cast("double") / n
        words_in_range = (n >= min_words) & (n <= max_words)
        mean_word_len_ok = (mean_len >= min_mean_word_len) & (
            mean_len <= max_mean_word_len
        )
        symbol_ratio_ok = s["n_symbols"].cast("double") / n <= max_symbol_ratio
        alpha_word_ratio_ok = (
            s["n_alpha_words"].cast("double") / n >= min_alpha_word_ratio
        )
        stopwords_ok = s["stop_hits"] >= min_stopword_hits
        return F.struct(
            words_in_range.alias("words_in_range"),
            mean_word_len_ok.alias("mean_word_len_ok"),
            symbol_ratio_ok.alias("symbol_ratio_ok"),
            alpha_word_ratio_ok.alias("alpha_word_ratio_ok"),
            stopwords_ok.alias("stopwords_ok"),
            (
                words_in_range
                & mean_word_len_ok
                & symbol_ratio_ok
                & alpha_word_ratio_ok
                & stopwords_ok
            ).alias("keep"),
        )

    def over_toks(toks: Column) -> Column:
        scalars = F.struct(
            F.size(toks).cast("long").alias("n"),
            F.length(F.regexp_replace(text, r"\s", "")).cast("long").alias("non_space"),
            F.size(F.regexp_extract_all(text, F.lit(r"#|\.\.\.|…"), 0))
            .cast("long")
            .alias("n_symbols"),
            F.size(F.filter(toks, lambda t: t.rlike("[a-zA-Z]")))
            .cast("long")
            .alias("n_alpha_words"),
            stopword_count_of(toks, GOPHER_STOPWORDS).alias("stop_hits"),
        )
        return bind_once(scalars, over_scalars)

    return bind_once(tokens_col(text), over_toks)
