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

REGIME BOUNDARY (round-9 scale measurement, tests/scale_stress.py):
q-gram blocking is for HIGH-entropy strings (IDs, codes, person
names, addresses). When the corpus is word-composed over a small
vocabulary (TPC-H p_name: 5 words from ~92 colors), the q-gram space
saturates — 20k such names produce only 70 distinct bigrams, and
every gram (including each name's "rarest") is shared by hundreds of
names. Candidates then grow as Θ(n²/|gram space|): measured 55% of
all pairs at q=2 and still 7% at q=8, prefix filter and all — no q
rescues it, because ANY blocking on features drawn from a constant-
size alphabet divides n² by a constant. For low-entropy corpora use
the token-level similarity family instead (dedup/minhash.py,
dedup/ngram.py — measured sub-quadratic on the same harness); edit
distance as a VERIFY step still composes with those blockers.
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
