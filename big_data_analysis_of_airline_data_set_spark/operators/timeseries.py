"""Batch time-series operators over an event stream: gap-based
sessionization with session ordinals, and bounded-frame EWMA features.

Complements ``streaming/windows.py`` (tumbling/sliding/session windows
in streaming runtime): these are the batch/backfill formulations a
feature pipeline runs over historical data.

Scale posture: both operators are a single shuffle on the entity key
followed by window functions — no self-joins, no unbounded state. The
EWMA frame is bounded (trailing K rows), so per-row work is O(K) and
numerically stable regardless of history length (no ``decay**-n``
blow-up that the closed-form running formulation would hit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    *,
    key_col: str,
    ts_col: str,
    order_tiebreak_col: str,
    gap_seconds: int,
) -> DataFrame:
    """Assign gap-based session ordinals per key.

    An event starts a new session when it is the key's first event or
    arrives more than ``gap_seconds`` after the previous event. Returns
    the input plus ``session_ordinal`` (1-based per key, in time order).

    Same session semantics as ``F.session_window`` (streaming path);
    this formulation additionally yields the per-key ordinal, which
    session_window does not expose.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, order_tiebreak_col)
    us = F.unix_micros(F.col(ts_col))
    prev_us = F.lag(us).over(w)
    new_session = (
        prev_us.isNull() | (us - prev_us > gap_seconds * 1_000_000)
    ).cast("long")
    return df.withColumn(
        "session_ordinal", F.sum(new_session).over(w).cast("long")
    )


def session_stats(
    df: DataFrame,
    *,
    key_col: str,
    ts_col: str,
    order_tiebreak_col: str,
    gap_seconds: int,
    value_col: str,
) -> DataFrame:
    """Per-session aggregates: bounds, event count, exact value sum."""
    s = sessionize(
        df,
        key_col=key_col,
        ts_col=ts_col,
        order_tiebreak_col=order_tiebreak_col,
        gap_seconds=gap_seconds,
    )
    return s.groupBy(key_col, "session_ordinal").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (F.unix_micros(F.max(ts_col)) - F.unix_micros(F.min(ts_col)))
        .cast("long")
        .alias("duration_us"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col(value_col).cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_value"),
    )


def resample_ffill(
    df: DataFrame,
    *,
    key_col,
    ts_col: str,
    value_col: str,
    unit: str = "hour",
) -> DataFrame:
    """Dense time-grid resampling with forward fill — the telemetry
    regularization op: per series, truncate events to ``unit`` buckets
    (bucket reduction = MAX, a deterministic engine-neutral pick),
    generate the FULL bucket grid from the series' first to last
    observed bucket, and carry the last observation forward across
    gaps. Output: (series, bucket, value_ffill, is_gap).

    Scale shape: one groupBy to buckets (shuffle carries ≤ one row per
    (series, bucket), not raw events), a per-series bounds agg feeding
    a sequence() explode (grid rows are generated distributed, never
    collected), a left join grid⋈buckets co-partitioned on the same
    keys, and one window for the fill. Grid density is bounded by
    (span/unit) per series — choose ``unit`` so that stays sane, the
    same judgment call any resampler demands.

    ``key_col`` may be a Column expression (e.g. a banding of a
    high-cardinality id) or a column name.

    ``unit`` is validated against the intersection of what date_trunc
    and the INTERVAL literal grammar both accept: the string is
    interpolated into BOTH (truncation and grid step), date_trunc
    accepts units the INTERVAL grammar does not (quarter, millennium),
    and an invalid unit would otherwise surface as an obscure SQL
    parse error from deep inside the plan — or worse, the two could
    silently disagree."""
    from pyspark.sql.window import Window as W

    allowed = {"second", "minute", "hour", "day", "week", "month", "year"}
    if not isinstance(unit, str) or unit.lower() not in allowed:
        raise ValueError(
            f"resample_ffill: unit {unit!r} not supported; use one of "
            f"{sorted(allowed)} (must be valid for both date_trunc and "
            "an INTERVAL literal)"
        )
    unit = unit.lower()
    key = key_col if not isinstance(key_col, str) else F.col(key_col)
    obs = (
        df.select(
            key.alias("series"),
            F.date_trunc(unit, F.col(ts_col)).alias("bucket"),
            F.col(value_col).alias("_v"),
        )
        .groupBy("series", "bucket")
        .agg(F.max("_v").alias("v"))
        # obs feeds BOTH the bounds agg and the grid join; a lazy
        # localCheckpoint computes the events scan + bucket agg ONCE at
        # first materialization and lets the ContextCleaner free the
        # cached blocks when the frame is dropped — no caller-release
        # contract needed (review finding: un-cached, the raw scan ran
        # twice per action)
        .localCheckpoint(eager=False)
    )
    bounds = obs.groupBy("series").agg(
        F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
    )
    grid = bounds.select(
        "series",
        F.explode(
            F.sequence("lo", "hi", F.expr(f"INTERVAL 1 {unit}"))
        ).alias("bucket"),
    )
    w = W.partitionBy("series").orderBy("bucket").rowsBetween(
        W.unboundedPreceding, 0
    )
    return grid.join(obs, ["series", "bucket"], "left").select(
        "series",
        "bucket",
        F.last("v", ignorenulls=True).over(w).alias("value_ffill"),
        F.col("v").isNull().alias("is_gap"),
    )


def trailing_ewma(
    df: DataFrame,
    *,
    key_col: str,
    ts_col: str,
    order_tiebreak_col: str,
    value_col: str,
    decay: float,
    k: int,
    out_col: str = "ewma",
) -> DataFrame:
    """EWMA of ``value_col`` over the trailing ``k`` events per key.

    ewma_t = sum_{i=0..m-1} decay^i * x_{t-i} / sum_{i=0..m-1} decay^i
    where m = min(k, rows so far). The bounded frame keeps the exponent
    range [0, k), so the computation is deterministic and portable: the
    frame's values are collected in window order and reduced
    sequentially (same fold order in any engine).
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, order_tiebreak_col)
        .rowsBetween(-(k - 1), 0)
    )
    # One window pass: materialize the frame's values once, then derive
    # size/numerator/denominator from the materialized array column (a
    # second withColumn referencing .over(w) would plan a second Window
    # node and collect the frame twice).
    framed = df.withColumn(
        "_vals", F.collect_list(F.col(value_col).cast("double")).over(w)
    )
    vals = F.col("_vals")
    n = F.size(vals)
    # weight for position i (1-based, oldest first) is decay^(n-i)
    num = F.aggregate(
        F.zip_with(
            vals,
            F.sequence(F.lit(1), n),
            lambda x, i: x * F.pow(F.lit(decay), (n - i).cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    den = F.aggregate(
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.pow(F.lit(decay), (n - i).cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        framed.withColumn("_n_in_frame", n.cast("long"))
        .withColumn(out_col, F.round(num / den, 6))
        .drop("_vals")
    )


def peak_concurrency_by_bucket(
    intervals: DataFrame,
    *,
    start_col: str,
    end_col: str,
    tiebreak_cols: list[str],
    bucket_micros: int = 3_600_000_000,
) -> DataFrame:
    """(bucket, carry_in, net_change, n_starts, peak_concurrent): the
    sweep-line concurrency curve over INCLUSIVE intervals — "how many
    sessions were open at once, at peak, each hour" — the capacity /
    load question raw event counts cannot answer (one 3-hour session
    and 1000 one-second sessions look alike to a count).

    Sweep line, bucketed so it scales: every interval emits +1 at its
    start and -1 at its end; concurrency at any instant is the running
    sum of deltas in (ts, delta DESC, tiebreak...) order (DESC puts
    the +1 first at equal timestamps — inclusive ends: a session
    ending at t and one starting at t DO overlap, and a single-event
    session [t, t] counts at t). Rather than one global ordered sweep
    (a single-partition sort over all deltas — the non-scalable
    formulation), deltas sweep WITHIN their integer time bucket (a
    partitioned window, parallel across buckets) and buckets chain
    through their net sums: carry_in(b) = Σ net over prior buckets, a
    window over ONE ROW PER OBSERVED BUCKET — bounded by the time
    domain (hours in the retention window), never by event volume.
    Peak within a bucket = carry_in + max(0, max prefix sum) — the
    max(0, ·) covers the entry concurrency when the bucket's first
    delta is a departure. Buckets with no deltas are not emitted
    (concurrency there is flat at the previous carry; resample_ffill
    densifies if a gapless curve is needed).

    Buckets are integer FLOOR division of unix_micros by
    bucket_micros — written as ``(ts - pmod(ts, b)) div b`` because
    Spark's ``div`` truncates toward zero while floor-division
    replays (DuckDB ``//``) round toward −∞; the two disagree on
    negative (pre-1970) timestamps. All arithmetic is integer, so
    the curve value-hashes.
    """
    s = intervals.select(
        F.unix_micros(F.col(start_col)).alias("_ts"),
        F.lit(1).alias("_delta"),
        *[F.col(c) for c in tiebreak_cols],
    )
    e = intervals.select(
        F.unix_micros(F.col(end_col)).alias("_ts"),
        F.lit(-1).alias("_delta"),
        *[F.col(c) for c in tiebreak_cols],
    )
    d = s.unionByName(e).withColumn(
        "bucket",
        F.expr(
            f"(_ts - pmod(_ts, {bucket_micros})) div {bucket_micros}"
        ),
    )
    w_intra = (
        Window.partitionBy("bucket")
        .orderBy(F.asc("_ts"), F.desc("_delta"), *[F.asc(c) for c in tiebreak_cols])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    per_bucket = (
        d.withColumn("_prefix", F.sum("_delta").over(w_intra))
        .groupBy("bucket")
        .agg(
            F.sum("_delta").cast("long").alias("net_change"),
            F.max("_prefix").cast("long").alias("_max_prefix"),
            F.sum(F.when(F.col("_delta") > 0, 1).otherwise(0))
            .cast("long")
            .alias("n_starts"),
        )
    )
    # bucket-level chain: ONE row per observed bucket (time-domain
    # sized), so the unpartitioned window is bounded by design
    w_chain = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    return per_bucket.select(
        "bucket",
        F.coalesce(F.sum("net_change").over(w_chain), F.lit(0))
        .cast("long")
        .alias("carry_in"),
        "net_change",
        "n_starts",
        "_max_prefix",
    ).select(
        "bucket",
        "carry_in",
        "net_change",
        "n_starts",
        (F.col("carry_in") + F.greatest(F.col("_max_prefix"), F.lit(0)))
        .cast("long")
        .alias("peak_concurrent"),
    )
