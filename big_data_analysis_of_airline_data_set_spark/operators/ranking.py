"""Global exact rank via range-bucketed prefix counts — total
ordering without a whole-table ordered window.

No reference analogue (mosama1994's only ordering surfaces are the
driver-side top-1 model sort and a distributed orderBy, Scripts/2-3);
this is engine surface backing the gains/decile-table family, and the
third instance of the bucketed-prefix decomposition used by
``operators/skyline.py`` and ``operators/weighted_quantile.py``.

The textbook plan — ``row_number() OVER (ORDER BY v DESC)`` — funnels
EVERY row through one ordered-window task: a single-partition sort
that cannot scale past one executor. Decomposed:

1. one 2-number scalar aggregate finds the value span (broadcast
   back);
2. rows range-bucket on the span (descending buckets for descending
   rank); per-bucket counts are a ``buckets``-row frame;
3. prefix counts over that tiny frame give each bucket its global
   rank offset (the only ordered window over a global frame runs on
   ``buckets`` rows, not N);
4. ``row_number`` runs ONLY inside each bucket, partitioned by
   bucket — state is 1/buckets of the data, and skew is bounded by
   the value distribution, not the total row count.

The (value, tiebreak) pair must be unique per row — ranks are then
engine-deterministic with no float thresholds anywhere.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

# ntile_from_rank splices its arguments into SQL text; restrict them to
# unqualified column identifiers (or bare integer literals) so a
# malformed caller fails HERE with the offending string, not downstream
# with a parse error or wrong SQL.
_IDENTIFIER_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*|[0-9]+")


def bucketed_global_rank(
    df: DataFrame,
    val: str,
    tiebreak: str,
    buckets: int = 64,
    descending: bool = True,
    checkpoint: bool = True,
) -> DataFrame:
    """Append ``_rank`` (1-based, dense over rows, no gaps) ordering by
    ``val`` (DESC by default) with ``tiebreak`` ASC breaking ties.

    ``(val, tiebreak)`` must be unique per row; ``val`` must be
    castable to double for the range bucketing (rank comparisons
    themselves use the original column, so no precision is lost).
    Pass ``checkpoint=False`` when ``df`` is already a checkpointed /
    persisted frame (or a trivial projection of one) — the internal
    barrier would materialize a redundant copy.
    """
    from .range_bucket import with_range_bucket

    # df feeds two plan references (bounds scalar + bucketed rows) —
    # one lazy checkpoint or the upstream plan runs twice
    src = df.localCheckpoint(eager=False) if checkpoint else df
    bucketed = with_range_bucket(src, val, buckets, descending=descending)
    counts = bucketed.groupBy("_b").agg(F.count(F.lit(1)).alias("_nb"))
    off_w = W.orderBy("_b").rowsBetween(W.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "_off", F.coalesce(F.sum("_nb").over(off_w), F.lit(0)).cast("long")
    ).select("_b", "_off")
    order = (
        [F.col(val).desc(), F.col(tiebreak).asc()]
        if descending
        else [F.col(val).asc(), F.col(tiebreak).asc()]
    )
    in_bucket = W.partitionBy("_b").orderBy(*order)
    return (
        bucketed.join(F.broadcast(offsets), "_b")
        .withColumn(
            "_rank",
            (F.col("_off") + F.row_number().over(in_bucket)).cast("long"),
        )
        .drop("_b", "_off")
    )


def ntile_from_rank(rank_col: str, n_col: str, tiles: int):
    """SQL-standard NTILE group from a 1-based global ``rank`` and the
    total row count ``n`` — the first ``n % tiles`` groups take
    ``n div tiles + 1`` rows, the rest ``n div tiles``.

    ``rank_col`` / ``n_col`` are COLUMN NAMES or bare integer
    literals (identifier-validated, then spliced into a SQL
    expression string) rather than Columns
    because BIGINT integer division is only reachable through the SQL
    ``div`` operator — the Column API's ``/`` is double division,
    whose quotient can misround the tile boundary once rank exceeds
    2^52. With ``div`` and ``pmod``-free remainder arithmetic the
    assignment is integer-exact at ANY row count. The ``q == 0``
    divisor is guarded (when ``n < tiles`` every row lands in the
    first branch, but ANSI mode would still reject a reachable
    ``div 0``). Arbitrary expression strings are rejected: a quote or
    alias inside the splice would silently produce wrong SQL or an
    opaque parse error far from the call site."""
    for arg in (rank_col, n_col):
        if not isinstance(arg, str) or not _IDENTIFIER_RE.fullmatch(arg):
            # a Column or int from a pre-validation caller must get THIS
            # message, not re's opaque TypeError
            raise ValueError(
                f"ntile_from_rank takes plain column names, got {arg!r}"
            )
    r, n = f"(CAST({rank_col} AS BIGINT))", f"(CAST({n_col} AS BIGINT))"
    q = f"({n} div {tiles})"
    rem = f"({n} - {q} * {tiles})"
    big = f"({q} + 1)"
    first_span = f"({big} * {rem})"
    q_safe = f"(greatest({q}, CAST(1 AS BIGINT)))"
    return F.expr(
        f"CAST(CASE WHEN {r} <= {first_span}"
        f" THEN (({r} - 1) div {big}) + 1"
        f" ELSE {rem} + (({r} - {first_span} - 1) div {q_safe}) + 1"
        f" END AS BIGINT)"
    )
