"""Character-level fuzzy matching: q-gram blocking + edit-distance
verify — the approximate string join.

Complements the token-level family (minhash/simhash/ngram Jaccard):
those match documents; this matches SHORT STRINGS (names, codes,
addresses) where single-character typos matter and Jaccard over tokens
is useless. The classic shape (Gravano et al., approximate string
joins):

1. block: every string emits its distinct positional q-grams; strings
   sharing a gram become candidates (equi-join on the gram — a hash
   join, never a cartesian);
2. prefix-filter (ED-Join / ppjoin family): rank every string's grams
   by GLOBAL frequency (rarest first, gram text as tiebreak) and index
   only the first d·q + 1 — the hot grams ('er', 're') that carry the
   least blocking power and all of the join skew land at the tail of
   the order and drop out of blocking entirely;
3. verify: exact Levenshtein on candidates only, keep pairs ≤ max_d.

The prefix filter is LOSSLESS for the verified output. Count argument:
d edits change ≤ d·q positional grams, so a distinct gram leaves the
set only at positional cost ≥ 1 → |A ∩ B| ≥ |A| − d·q. Let g* be the
globally-smallest shared gram; if g* were outside A's (d·q + 1)-prefix,
A would hold d·q + 1 unshared grams smaller than g*, forcing
|A ∩ B| ≤ |A| − (d·q + 1) — contradiction. Symmetrically for B, so g*
sits in BOTH prefixes and the equi-join finds every true pair. Strings
with ≤ d·q + 1 grams keep their whole gram set (prefix == set), so the
short-string regime is byte-identical to full blocking.

Scale notes: without the filter, the gram join's skew is bounded by the
per-gram name frequency — a heavy gram concentrates candidates
quadratically. The prefix filter removes exactly those grams from the
index (frequency table: one small agg, broadcast back), which is both
the skew fix and the candidate-volume fix in one move; salting
(operators/salting.py) remains the fallback for a hot RARE gram.
Levenshtein is O(|a|·|b|) per CANDIDATE pair only — the verify never
sees the full cross product. Candidate-count reduction is pinned on a
skewed fixture in tests/test_round4_late_ops.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _gram_table(df: DataFrame, *, name_col: str, q: int) -> DataFrame:
    """(name, gram): distinct q-grams per DISTINCT name."""
    names = df.select(F.col(name_col).alias("name")).distinct()
    # names shorter than q emit no grams (they can't share one anyway).
    # The explicit filter matters for engine parity: Spark's
    # sequence(1, 0) produces a DESCENDING [1, 0] while SQL
    # generate_series(1, 0) is empty — without the guard a 1-char name
    # would gram on Spark only.
    names = names.filter(F.length("name") >= q)
    return names.select(
        "name",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.length("name") - (q - 1)),
                    lambda i: F.col("name").substr(i, F.lit(q)),
                )
            )
        ).alias("gram"),
    )


def candidate_pairs(
    df: DataFrame,
    *,
    name_col: str,
    q: int = 2,
    max_distance: int = 2,
    prefix_filter: bool = True,
) -> DataFrame:
    """(name_a, name_b) blocking candidates (name_a < name_b), BEFORE
    the Levenshtein verify — exposed so the candidate-volume effect of
    the prefix filter is measurable (and pinned in tests)."""
    grams = _gram_table(df, name_col=name_col, q=q)
    if prefix_filter:
        # global gram document-frequency (grams are distinct per name,
        # so count(*) IS the name count), broadcast back; per-name
        # rarest-first rank keeps only the (d·q + 1)-prefix
        freq = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("df"))
        prefix_len = q * max_distance + 1
        w = Window.partitionBy("name").orderBy(F.asc("df"), F.asc("gram"))
        grams = (
            grams.join(F.broadcast(freq), "gram")
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= prefix_len)
            .select("name", "gram")
        )
    a = grams.alias("a")
    b = grams.alias("b")
    return (
        a.join(b, (F.col("a.gram") == F.col("b.gram")) & (F.col("a.name") < F.col("b.name")))
        .select(F.col("a.name").alias("name_a"), F.col("b.name").alias("name_b"))
        .distinct()
    )


def fuzzy_pairs(
    df: DataFrame,
    *,
    name_col: str,
    q: int = 2,
    max_distance: int = 2,
    prefix_filter: bool = True,
) -> DataFrame:
    """(name_a, name_b, lev) over DISTINCT values of ``name_col``:
    all unordered pairs within ``max_distance`` edits that share at
    least one q-gram (name_a < name_b lexicographically). The prefix
    filter (module docstring) shrinks the candidate set without
    changing this output."""
    cand = candidate_pairs(
        df,
        name_col=name_col,
        q=q,
        max_distance=max_distance,
        prefix_filter=prefix_filter,
    )
    lev = F.levenshtein(F.col("name_a"), F.col("name_b"))
    return cand.filter(lev <= max_distance).select(
        "name_a", "name_b", lev.cast("long").alias("lev")
    )
