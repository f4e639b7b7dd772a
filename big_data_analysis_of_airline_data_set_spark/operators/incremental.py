"""Incremental aggregate maintenance: algebraic state merge.

The materialized-view maintenance primitive: a running summary table
holds per-group ALGEBRAIC aggregate states (count, sum, min, max — each
mergeable by a further count-preserving aggregate), and each new batch
contributes a delta state table. Merging states is a groupBy over the
UNION of state tables — the raw history is never rescanned, which is
the entire point at 100 TB: the daily job touches one day of data plus
a groups-sized summary, not the full fact table.

Derived measures (avg = sum/count) are computed AFTER the merge — they
are not algebraic and must never be averaged across states.

Correctness contract: merge(state(A), state(B)) must equal
state(A ∪ B) exactly. Exactness comes from the state encoding: counts
are longs, sums accumulate in DECIMAL(18,2) (order-independent,
engine-identical), min/max are trivially mergeable. The catalog
query's oracle computes the full aggregate directly from raw rows —
green means the merge is genuinely lossless, not just shaped right.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def aggregate_state(
    df: DataFrame,
    *,
    keys: list[str],
    value_col: str,
) -> DataFrame:
    """Per-group algebraic state: (keys…, cnt, sum_v DECIMAL(18,2),
    min_v, max_v)."""
    v = F.col(value_col)
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum(v.cast("decimal(18,2)")).cast("decimal(18,2)").alias("sum_v"),
        F.min(v).alias("min_v"),
        F.max(v).alias("max_v"),
    )


def merge_aggregate_states(*states: DataFrame, keys: list[str]) -> DataFrame:
    """Merge any number of state tables into one — a further aggregate
    over their union; never touches raw rows."""
    merged = states[0]
    for s in states[1:]:
        merged = merged.unionByName(s)
    return merged.groupBy(*keys).agg(
        F.sum("cnt").cast("long").alias("cnt"),
        F.sum("sum_v").cast("decimal(18,2)").alias("sum_v"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
    )


def finalize_measures(state: DataFrame, *, keys: list[str]) -> DataFrame:
    """Derived (non-algebraic) measures from a merged state: exact
    double sum, avg = sum/cnt (identical IEEE division on any engine —
    no rounding needed because both operands are exact)."""
    return state.select(
        *keys,
        "cnt",
        F.col("sum_v").cast("double").alias("total"),
        (F.col("sum_v").cast("double") / F.col("cnt")).alias("avg_v"),
        "min_v",
        "max_v",
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    *,
    key: str,
    compare_cols: list[str],
    check_unique: bool = False,
) -> DataFrame:
    """Row-level CDC delta between two snapshots of the same keyed
    table: one full-outer join on the key classifies every row as
    'added' (key only in new), 'removed' (only in old), 'changed'
    (both, any compare column differs — null-safe), or 'unchanged'.
    The change feed a MERGE/SCD pipeline consumes when the source can
    only deliver snapshots.

    CONTRACT: ``key`` must be unique within each snapshot — duplicate
    keys multiply through the full-outer join, fanning out misclassified
    rows silently. Pass ``check_unique=True`` to pay one
    count-vs-distinct aggregate per side and fail loudly instead (off
    by default: at 100 TB the caller usually knows the key is a
    primary key and shouldn't pay two extra scans).

    Scale shape: ONE shuffle (the full-outer hash join on the key);
    classification is a map-side expression. Emits (key, change_type)
    plus old_/new_ copies of the compare columns for downstream apply.
    """
    o = old.select(key, *compare_cols)
    n = new.select(key, *compare_cols)
    if check_unique:
        for side, df in (("old", o), ("new", n)):
            total, distinct, nulls = df.agg(
                F.count(F.lit(1)),
                F.count_distinct(F.col(key)),  # NULLs excluded by SQL
                F.count(F.when(F.col(key).isNull(), 1)),
            ).first()
            if nulls:
                raise ValueError(
                    f"snapshot_diff: {side} snapshot has {nulls} NULL "
                    f"{key!r} keys — NULL never equi-joins, so those rows "
                    "would misclassify as simultaneous added+removed"
                )
            if total != distinct:
                raise ValueError(
                    f"snapshot_diff: {side} snapshot has duplicate keys "
                    f"({total} rows, {distinct} distinct {key!r}) — the "
                    "full-outer join would fan out and misclassify rows"
                )
    joined = o.alias("o").join(n.alias("n"), F.col(f"o.{key}") == F.col(f"n.{key}"), "full_outer")
    # no compare columns → pure membership CDC: rows present on both
    # sides are 'unchanged' by definition
    changed = F.lit(False)
    for c in compare_cols:
        changed = changed | ~F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
    change_type = (
        F.when(F.col(f"o.{key}").isNull(), F.lit("added"))
        .when(F.col(f"n.{key}").isNull(), F.lit("removed"))
        .when(changed, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    cols = [
        F.coalesce(F.col(f"o.{key}"), F.col(f"n.{key}")).alias(key),
        change_type.alias("change_type"),
    ]
    for c in compare_cols:
        cols.append(F.col(f"o.{c}").alias(f"old_{c}"))
        cols.append(F.col(f"n.{c}").alias(f"new_{c}"))
    return joined.select(*cols)


def insert_only_join_delta(
    base_a: DataFrame,
    delta_a: DataFrame,
    base_b: DataFrame,
    delta_b: DataFrame,
    on: str,
) -> DataFrame:
    """Δ(A ⋈ B) under insert-only deltas, WITHOUT recomputing A ⋈ B:

        Δ(A⋈B) = ΔA ⋈ (B ∪ ΔB)  ∪  A ⋈ ΔB

    (the first term covers ΔA⋈B and ΔA⋈ΔB in one join). This is the
    join analog of ``merge_aggregate_states``: an incrementally
    maintained join view applies exactly these delta rows instead of
    re-joining the full tables — at 100 TB the base⋈base bulk, which
    dominates the full join, is never touched; both joins here have a
    DELTA on one side, so their shuffles are delta-sized on that side.

    Exactness: for inserts, new-join minus old-join is precisely the
    pairs with at least one delta row — which is what the two terms
    enumerate, disjointly (a-side delta | a-side base & b-side delta).
    Updates/deletes need the retraction form (emit old rows negated) —
    out of scope for this operator, stated so nobody feeds it CDC
    update streams."""
    full_b = base_b.unionByName(delta_b)
    return delta_a.join(full_b, on).unionByName(base_a.join(delta_b, on))
