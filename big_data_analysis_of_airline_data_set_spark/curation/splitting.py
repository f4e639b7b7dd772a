"""Stratified train/validation/test splitting.

The reference splits temporally by Year (Scripts/3_...py:52-53 — kept
as ``ml.train_job.temporal_split``). A training-data pipeline also
needs the other standard split: STRATIFIED by a group column, so every
domain/class lands in each partition at the configured proportions —
a global random split under-represents small domains in val/test.

Deterministic (md5-ranked, not RNG) like every sampler in this package:
the assignment is a pure function of (group, id), so it is stable under
retries and incremental reruns, and any SQL engine replays it exactly.

Scale shape: one shuffle on ``group_col`` for the per-group rank +
count window. Same heavy-hitter caveat as ``sampling.quota_sample`` —
at 100 TB a pathological domain serializes on one task; pre-split such
domains by a salt on the hash prefix (the boundary ranks only need to
be exact within each salt's contiguous hash range).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def stratified_split(
    df: DataFrame,
    *,
    group_col: str,
    id_col: str,
    train_frac: float = 0.8,
    val_frac: float = 0.1,
) -> DataFrame:
    """Adds a ``split`` column ('train' | 'val' | 'test') assigned per
    group: rows md5-ranked within their group; the first
    ``floor(train_frac·n)`` go to train, the next ``floor(val_frac·n)``
    to val, the remainder to test. Floor on both boundaries means test
    absorbs the rounding — never empty when n ≥ 1.

    Both boundaries are built from integer numerators (Fraction of the
    float params), never from float sums: the Python expression
    ``0.8 + 0.1`` evaluates to 0.9000000000000001, and
    ``floor(n · that)`` would eventually disagree with an engine that
    computes ``floor(n·9/10)`` exactly. ``floor((n·num)/den)`` with
    integer ``num``/``den`` is the correctly-rounded double quotient on
    every engine while ``n·num`` stays below 2^53 — the same arithmetic
    the DuckDB oracle uses (plans/curation_queries.py)."""
    from fractions import Fraction

    f_train = Fraction(train_frac).limit_denominator(10**6)
    f_val = Fraction(val_frac).limit_denominator(10**6)
    f_tv = f_train + f_val
    h = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(id_col).asc())
    wn = Window.partitionBy(group_col)
    rank = F.row_number().over(w)
    n = F.count(F.lit(1)).over(wn)
    t_train = F.floor(
        (n * F.lit(f_train.numerator)) / F.lit(f_train.denominator)
    )
    t_val = F.floor((n * F.lit(f_tv.numerator)) / F.lit(f_tv.denominator))
    split = (
        F.when(rank <= t_train, F.lit("train"))
        .when(rank <= t_val, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn("split", split)


def split_summary(
    df: DataFrame,
    *,
    group_col: str,
    id_col: str,
    train_frac: float = 0.8,
    val_frac: float = 0.1,
) -> DataFrame:
    """(group, split, n_rows) — the audit table a pipeline checks before
    training: every group present in every split at the right size."""
    assigned = stratified_split(
        df,
        group_col=group_col,
        id_col=id_col,
        train_frac=train_frac,
        val_frac=val_frac,
    )
    return (
        assigned.groupBy(group_col, "split")
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    )


_HASH_BITS = 56
_HASH_SPACE = 1 << _HASH_BITS


def group_split(
    df: DataFrame,
    *,
    group_col: str,
    train_frac: float = 0.8,
    val_frac: float = 0.1,
) -> DataFrame:
    """Adds a ``split`` column assigned per GROUP, not per row: every
    row of a group lands in the same partition — the leakage-free split
    (all documents of one user/author/session must not straddle train
    and test, or evaluation measures memorization of the group, not
    generalization). Complements ``stratified_split``, which balances
    proportions by splitting rows WITHIN groups — the opposite
    trade-off.

    Assignment hashes the GROUP KEY to a 56-bit integer u and cuts
    [0, 2⁵⁶) at floor(train_frac·2⁵⁶) and floor((train+val)·2⁵⁶):
    a pure function of the group value — stable under retries, stable
    when a group gains rows (the property row-ranked splits lack), and
    replayable by any SQL engine. Proportions hold in expectation over
    groups (exact-count splits per group are impossible without
    breaking groups).

    Scale shape: zero shuffles — the split is a map-side expression on
    the group column; no window, no join.
    """
    from fractions import Fraction

    f_train = Fraction(train_frac).limit_denominator(10**6)
    f_tv = f_train + Fraction(val_frac).limit_denominator(10**6)
    # integer thresholds: floor(frac * 2^56) built from integer
    # numerators (same rationale as stratified_split's boundaries)
    t_train = (f_train.numerator * _HASH_SPACE) // f_train.denominator
    t_val = (f_tv.numerator * _HASH_SPACE) // f_tv.denominator
    u = F.conv(
        F.substring(F.md5(F.concat(F.lit("gs_"), F.col(group_col).cast("string"))), 1, 14),
        16,
        10,
    ).cast("long")
    split = (
        F.when(u < t_train, F.lit("train"))
        .when(u < t_val, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn("split", split)
