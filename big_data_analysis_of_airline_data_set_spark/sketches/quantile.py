"""HDR-style log2-bucketed quantile sketch — the mergeable RANK sketch
completing the family (KMV = distinct, HLL = grouped distinct, CMS =
frequency, this = rank/quantile).

Per group, count value occurrences into exponentially-spaced integer
buckets: value → cents (``floor(v·100 + 0.5)`` — the repo's
engine-neutral integer quantization), cents → a bucket code built from
the integer BIT LENGTH plus ``sub_bits`` linear sub-buckets per octave
(the HDR-histogram layout; DDSketch gets the same guarantee with γ-log
buckets, but log() is libm territory — bit-length arithmetic via
LENGTH(BIN(x)) is integer-exact on every engine).

    code(c) = c                                   for 0 < c < 2^(s+1)
            = 2^(s+1) + (b−s−2)·2^s + (c >> (b−s−1)) − 2^s
                                                  for c ≥ 2^(s+1),
      where b = bitlength(c), s = sub_bits; c ≤ 0 takes code 0.

The code is monotone in c, so per-group CUMULATIVE bucket counts give
every rank: the q-quantile estimate is the lower bound (representative
value) of the first bucket whose cumulative count reaches ceil(q·n).
Bucket width over lower bound is ≤ 2^−s, so the estimate is within
relative error 2^−s of the true quantile's bucket.

Why this shape at 100 TB:

- The sketch build is ONE ``groupBy(group, code).count()`` — partial
  (map-side) aggregation collapses every partition to ≤ groups × codes
  rows before the shuffle; for 64-bit cents and s=5 that is ≤ ~1 900
  cells per group no matter the data size. No sort, no sampling state.
- Sketches MERGE by adding counts per (group, code) — cross-group
  ('ALL'), cross-day, or cross-cluster rollups never touch raw data
  again. Randomized compactors (KLL) merge too, but their state is
  sample-dependent; bucket counts are a plain additive aggregate,
  which is also exactly what Structured Streaming maintains
  incrementally (the streaming state IS the sketch — constant-size,
  no watermark needed, complete-mode output cheap).
- Everything is integer arithmetic (bit lengths, shifts, exact
  counts), so a DuckDB oracle replays every bucket and every estimate
  EXACTLY — no within-bound contract needed, unlike HLL whose
  register layout is engine-private.

The bucket-code and decode expressions are generated ONCE as SQL text
(``code_sql`` / ``rep_sql``) and consumed by BOTH engines — Spark via
``F.expr`` on the spark dialect, the DuckDB oracle via the duckdb
dialect (`div`/`shiftleft` vs `//`/`<<` are the only differences) — so
the bucketing cannot diverge between the query and its oracle.

No reference analogue (mosama1994 has no quantile surface); this is
green-field engine surface per SURVEY.md §2.9/§2.11.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

# (label, integer percent) — the rank threshold ceil(p·n/100) stays
# exact integer arithmetic in both engines
DEFAULT_PERCENTS: tuple[tuple[str, int], ...] = (
    ("p50", 50),
    ("p90", 90),
    ("p99", 99),
)

CENTS_SQL = "CAST(floor({col} * 100 + 0.5) AS BIGINT)"


def _shl(dialect: str, base: str, amount: str) -> str:
    if dialect == "spark":
        return f"shiftleft(CAST({base} AS BIGINT), {amount})"
    return f"(CAST({base} AS BIGINT) << ({amount}))"


def _div(dialect: str) -> str:
    return "div" if dialect == "spark" else "//"


def code_sql(col: str, sub_bits: int, dialect: str) -> str:
    """Bucket code of positive cents column ``col`` (≤ 0 → 0),
    monotone in the value. ``dialect``: 'spark' | 'duckdb'."""
    split = 1 << (sub_bits + 1)
    sub = 1 << sub_bits
    d = _div(dialect)
    octave = _shl(dialect, "1", f"length(bin({col})) - {sub_bits + 1}")
    return (
        f"CAST(CASE WHEN {col} <= 0 THEN 0 "
        f"WHEN {col} < {split} THEN {col} "
        f"ELSE {split} + (length(bin({col})) - {sub_bits + 2}) * {sub} "
        f"+ (({col} {d} {octave}) - {sub}) END AS BIGINT)"
    )


def rep_sql(col: str, sub_bits: int, dialect: str) -> str:
    """Lower-bound cents of bucket code ``col`` (exact decode of
    ``code_sql``; code 0 → 0 cents)."""
    split = 1 << (sub_bits + 1)
    sub = 1 << sub_bits
    d = _div(dialect)
    mant = f"CAST({sub} AS BIGINT) + (({col} - {split}) % {sub})"
    shift = f"(({col} - {split}) {d} {sub}) + 1"
    return (
        f"CAST(CASE WHEN {col} < {split} THEN {col} "
        f"ELSE {_shl(dialect, mant, shift)} END AS BIGINT)"
    )


def _cents_frame(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """(group, _qc): integer cents of non-NULL values (NULLs are
    excluded, not observations)."""
    return df.filter(F.col(value_col).isNotNull()).select(
        F.col(group_col).alias("group"),
        F.expr(CENTS_SQL.format(col=value_col)).alias("_qc"),
    )


def hdr_bucket_counts(
    df: DataFrame,
    *,
    group_col: str,
    value_col: str,
    sub_bits: int = 5,
) -> DataFrame:
    """(group, code, cnt): the sketch — one map-side-combined count
    aggregate over ≤ groups × ~(2^sub_bits·octaves) cells."""
    return (
        _cents_frame(df, group_col, value_col)
        .select("group", F.expr(code_sql("_qc", sub_bits, "spark")).alias("code"))
        .groupBy("group", "code")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def hdr_quantile_report(
    sketch: DataFrame,
    raw: DataFrame,
    *,
    group_col: str,
    value_col: str,
    sub_bits: int = 5,
    percents: tuple[tuple[str, int], ...] = DEFAULT_PERCENTS,
    with_union: bool = True,
) -> DataFrame:
    """(group, n_rows, n_buckets, est_<p>…, rank_<p>…) per group, plus
    an 'ALL' row whose sketch is the per-code SUM of the per-group
    sketches — the additive merge that makes the sketch a sketch.

    ONE assembly for however the sketch was maintained (batch plan or
    drained streaming state — the KMV/HLL report discipline), so the
    estimator cannot diverge between paths. ``est_<p>`` is the bucket
    lower bound in value units; ``rank_<p>`` is its TRUE rank fraction
    (share of rows ≤ it), recomputed from the raw table as the
    accuracy reference — like KMV's ``exact_distinct``, a diagnostic a
    production rollup would drop to skip the extra raw scan."""
    sketches = sketch
    if with_union:
        # sketch feeds two plan references (its own rows + the merged
        # ALL row) — one lazy checkpoint or the build aggregation (a
        # full raw scan in the batch path) runs twice
        sketch = sketch.localCheckpoint(eager=False)
        merged = (
            sketch.groupBy("code")
            .agg(F.sum("cnt").cast("long").alias("cnt"))
            .select(F.lit("ALL").alias("group"), "code", "cnt")
        )
        sketches = sketch.unionByName(merged)

    # cumulative ranks: windows partitioned by group over BUCKET-sized
    # frames (≤ ~1.9k rows per group at s=5) — never data-sized
    cum_w = W.partitionBy("group").orderBy("code").rowsBetween(
        W.unboundedPreceding, 0
    )
    cum = sketches.select(
        "group",
        "code",
        F.sum("cnt").over(cum_w).alias("cum"),
        F.sum("cnt").over(W.partitionBy("group")).alias("n"),
    )
    est = cum.groupBy("group").agg(
        F.max("n").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        *[
            F.min(
                F.when(
                    F.col("cum") >= F.expr(f"({p} * n + 99) div 100"),
                    F.col("code"),
                )
            ).alias(f"_qcode_{lab}")
            for lab, p in percents
        ],
    )
    reps = est.select(
        "group",
        "n_rows",
        "n_buckets",
        *[
            F.expr(rep_sql(f"_qcode_{lab}", sub_bits, "spark")).alias(
                f"_qrep_{lab}"
            )
            for lab, _ in percents
        ],
    )

    # accuracy reference: ONE conditional-count pass over raw cents
    # against the ≤ groups+1 broadcast estimate rows; the ALL row is
    # fed by a map-side explode fan-out (each row counts once for its
    # group and once for 'ALL'), never a second raw scan
    pre = _cents_frame(raw, group_col, value_col)
    if with_union:
        pre = pre.select(
            F.explode(F.array(F.col("group"), F.lit("ALL"))).alias("group"),
            "_qc",
        )
    joined = pre.join(F.broadcast(reps), "group")
    return joined.groupBy("group").agg(
        F.max("n_rows").cast("long").alias("n_rows"),
        F.max("n_buckets").cast("long").alias("n_buckets"),
        *[
            F.round(
                F.max(f"_qrep_{lab}").cast("double") / F.lit(100.0), 6
            ).alias(f"est_{lab}")
            for lab, _ in percents
        ],
        *[
            # denominator = a RECOUNT of the raw rows in this pass, not
            # the sketch's n_rows: if sketch and raw inputs ever diverge
            # (e.g. a partial stream drain), the rank columns then
            # disagree with the sketch-implied percentile and the
            # mismatch SURFACES in the report instead of silently
            # normalizing to the sketch's own count. At rest the two
            # counts are equal, so the emitted values are unchanged.
            F.round(
                F.sum(
                    F.when(F.col("_qc") <= F.col(f"_qrep_{lab}"), 1).otherwise(0)
                ).cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias(f"rank_{lab}")
            for lab, _ in percents
        ],
    )


def hdr_quantiles_by_group(
    df: DataFrame,
    *,
    group_col: str,
    value_col: str,
    sub_bits: int = 5,
    percents: tuple[tuple[str, int], ...] = DEFAULT_PERCENTS,
    with_union: bool = True,
) -> DataFrame:
    """Batch convenience: build the sketch and assemble the report in
    one plan."""
    sk = hdr_bucket_counts(
        df, group_col=group_col, value_col=value_col, sub_bits=sub_bits
    )
    return hdr_quantile_report(
        sk,
        df,
        group_col=group_col,
        value_col=value_col,
        sub_bits=sub_bits,
        percents=percents,
        with_union=with_union,
    )
