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
2. verify: exact Levenshtein on candidates only, keep pairs ≤ max_d.

Recall guarantee (count filter): strings with edit distance ≤ d share
at least max(|a|,|b|) − q + 1 − d·q q-grams, so with q=2, d=2 every
true pair of length ≥ 6 shares a gram. Both engines replay the SAME
blocking, so oracle parity holds identically even outside the
guarantee regime.

Scale notes: the gram join's skew is bounded by the per-gram name
frequency — a heavy gram ('er', 're') concentrates candidates; at
100 TB prune the top-F most frequent grams first (they carry the least
blocking power — standard prefix-filtering) or salt the hot grams
(operators/salting.py). Levenshtein is O(|a|·|b|) per CANDIDATE pair
only — the verify never sees the full cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fuzzy_pairs(
    df: DataFrame,
    *,
    name_col: str,
    q: int = 2,
    max_distance: int = 2,
) -> DataFrame:
    """(name_a, name_b, lev) over DISTINCT values of ``name_col``:
    all unordered pairs within ``max_distance`` edits that share at
    least one q-gram (name_a < name_b lexicographically)."""
    names = df.select(F.col(name_col).alias("name")).distinct()
    # names shorter than q emit no grams (they can't share one anyway).
    # The explicit filter matters for engine parity: Spark's
    # sequence(1, 0) produces a DESCENDING [1, 0] while SQL
    # generate_series(1, 0) is empty — without the guard a 1-char name
    # would gram on Spark only.
    names = names.filter(F.length("name") >= q)
    grams = names.select(
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
    a = grams.alias("a")
    b = grams.alias("b")
    cand = (
        a.join(b, (F.col("a.gram") == F.col("b.gram")) & (F.col("a.name") < F.col("b.name")))
        .select(F.col("a.name").alias("name_a"), F.col("b.name").alias("name_b"))
        .distinct()
    )
    lev = F.levenshtein(F.col("name_a"), F.col("name_b"))
    return cand.filter(lev <= max_distance).select(
        "name_a", "name_b", lev.cast("long").alias("lev")
    )
