"""Domain-aware sampling: per-domain quotas and mixture rebalancing.

Both are deterministic (hash-ordered, not RNG-ordered) so an external
SQL engine replays them exactly — same md5-replayable discipline as
dedup.minhash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def quota_sample(
    df: DataFrame,
    *,
    group_col: str,
    id_col: str,
    k: int,
) -> DataFrame:
    """Keep at most ``k`` rows per ``group_col`` value, chosen by md5
    hash order of the id — a deterministic stand-in for uniform random
    choice (md5 order is uncorrelated with insertion or id order).

    Scale shape: one shuffle on ``group_col``; within each domain the
    window sort is O(domain·log). A heavy-hitter domain concentrates on
    one task — at 100 TB pre-prune such domains with an approximate
    count + per-partition top-k before the exact window (the rank only
    needs to be exact near the quota boundary). AQE's skew handling
    cannot split a window partition, so the pre-prune is the real
    mitigation; this operator is the exact final pass.
    """
    h = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("sample_rank") <= k)
    )


_HASH_BITS = 56  # md5 hex prefix → integer; 2^56 fits comfortably in a long
_HASH_SPACE = 1 << _HASH_BITS


def weighted_sample(
    df: DataFrame,
    weights: DataFrame,
    *,
    group_col: str,
    id_col: str,
    weight_col: str,
) -> DataFrame:
    """Deterministic Bernoulli thinning at per-domain rates: keep a row
    iff its 56-bit md5 hash integer falls below ``floor(weight · 2⁵⁶)``.
    The hash plays the uniform draw — E[kept] = weight per domain, the
    decision is a pure function of the id (stable under retries,
    re-partitioning, and incremental reruns — the property that matters
    in a resumable 100 TB pipeline), and any SQL engine replays it.

    ``weights`` is domain-level (e.g. ``domain_mixture`` output) —
    vocabulary-sized, so the join broadcasts; the corpus side stays a
    single scan with a map-side filter.
    """
    u = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 14), 16, 10).cast(
        "long"
    )
    thr = F.floor(F.col(weight_col) * F.lit(_HASH_SPACE)).cast("long")
    w = weights.select(group_col, F.col(weight_col))
    return (
        df.join(F.broadcast(w), group_col)
        .filter(u < thr)
        .drop(weight_col)
    )


def domain_mixture(
    df: DataFrame,
    *,
    group_col: str,
    weight_col: str,
) -> DataFrame:
    """Per-domain token shares and the down-sampling weight that moves
    the corpus toward a uniform target mixture:

        weight(d) = min(1, target_share / actual_share)

    i.e. over-represented domains are down-sampled, under-represented
    ones are kept whole (no up-sampling — duplication is a training-
    data smell). One tiny aggregate + a broadcast scalar; nothing here
    grows with corpus size except the first groupBy.
    """
    per = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col(weight_col).cast("long")).alias("n_tokens"),
    )
    totals = per.agg(
        F.sum("n_tokens").alias("_total_tokens"),
        F.count(F.lit(1)).alias("_n_domains"),
    )
    share = F.col("n_tokens").cast("double") / F.col("_total_tokens")
    target = F.lit(1.0) / F.col("_n_domains")
    return (
        per.crossJoin(F.broadcast(totals))
        .select(
            group_col,
            "n_docs",
            "n_tokens",
            F.round(share, 6).alias("token_share"),
            F.round(F.least(F.lit(1.0), target / share), 6).alias("sample_weight"),
        )
    )


def weighted_reservoir(
    df: DataFrame,
    *,
    id_col: str,
    weight_col: str,
    k: int,
    salt: str = "wrs",
    max_weight: int = 10_000,
) -> DataFrame:
    """Fixed-size weighted random sample WITHOUT replacement per
    Efraimidis–Spirakis A-ES (Inf. Process. Lett. 97(5), 2006): the k
    rows with the largest priority keys — sequential probability-
    proportional-to-size draws, i.e. at each draw the selection
    probability is proportional to the remaining items' weights (NOT
    exactly weight-proportional per-item inclusion in the final
    size-k sample; no without-replacement scheme gives both).

    A-ES assigns key_i = u_i^(1/w_i) with u_i ~ U(0,1) and keeps the
    top k. For INTEGER weights the max of w_i independent uniforms has
    the SAME law (CDF x^w on (0,1)), so each row instead takes the max
    of w_i salted 56-bit md5-hash integers. That substitution is what
    makes the sample replayable bit-for-bit by any SQL engine: the
    textbook exponential-keys form needs ln/pow, and JVM Math.log vs C
    libm disagree in the last ulp — enough to flip near-tied keys at
    the reservoir boundary — while integer hashes compare exactly
    everywhere.

    Scale shape: the key is one projection per row (an array fold over
    a sequence of bounded length w; no explode, no join, no shuffle),
    and the reservoir itself is ``orderBy().limit(k)`` —
    TakeOrderedAndProject, a per-partition top-k merged on the driver
    at k rows. Both max and top-k are associative, so the whole
    operator is a single mergeable pass no matter how many partitions
    feed it. ``weight_col`` must be an integral column in
    [1, max_weight]: the key costs O(w) time AND memory per row (w
    hash draws), so raw token counts (10⁵–10⁶) as weights would build
    million-element arrays per row — quantize such weights into a
    bounded replica count before calling (e.g. ``ceil(tokens/1000)``).
    Both bounds fail LOUDLY at row level: a zero weight would hit
    Spark's DESCENDING sequence(1, 0) while DuckDB's
    generate_series(1, 0) is empty (the cross-engine trap this
    operator must never reach), and an over-cap weight means the
    caller skipped quantization. Ties break by id.
    """
    if max_weight < 1:
        raise ValueError("max_weight must be >= 1")
    w_long = F.col(weight_col).cast("long")
    w_ok = (w_long >= 1) & (w_long <= int(max_weight))
    rep_hash = lambda r: F.conv(  # noqa: E731 — per-replica 56-bit draw
        F.substring(
            F.md5(
                F.concat(
                    F.col(id_col).cast("string"),
                    F.lit(":"),
                    r.cast("string"),
                    F.lit(":" + salt),
                )
            ),
            1,
            14,
        ),
        16,
        10,
    ).cast("long")
    key = F.array_max(
        F.transform(
            F.sequence(F.lit(1).cast("long"), F.col(weight_col).cast("long")),
            rep_hash,
        )
    )
    # both bounds must FAIL, not silently misbehave: Spark's
    # sequence(1, 0) DESCENDS, so an unclamped weight <= 0 would get
    # EXTRA draws (a stochastically larger key) while the oracle's
    # generate_series(1, 0) is empty; an over-cap weight would build
    # an O(w) array per row — guard loudly at row level
    key = F.when(w_ok, key).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    f"weighted_reservoir: weight outside [1, {int(max_weight)}]"
                    " for id "
                ),
                F.col(id_col).cast("string"),
            )
        )
    )
    return (
        df.withColumn("res_key", key)
        .orderBy(F.desc("res_key"), F.asc(id_col))
        .limit(k)
    )
