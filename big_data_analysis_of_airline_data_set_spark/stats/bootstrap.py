"""Deterministic Poisson bootstrap — resampling uncertainty without RNG.

The scalable bootstrap: instead of drawing n rows with replacement per
replica (a shuffle per replica), give every row an independent
Poisson(1) weight per replica — the standard streaming/distributed
approximation (per-replica totals then need only ONE aggregate over
the weighted rows; all B replicas fold into a single groupBy).

Determinism: the weight is a pure function of (replica, row id) — the
56-bit md5-prefix integer compared against fixed Poisson(1) CDF
cutpoints (integer literals, precomputed: floor(CDF(k)·2⁵⁶)). Weights
≥ 4 are capped at 4 (P ≈ 0.4 %, documented); every engine replays the
identical weight table, so replica means are exactly reproducible —
retries, reruns, and the SQL oracle all see the same resamples.

Scale shape: explode rows ×B BEFORE the aggregate? No — the replica
index is generated per row (sequence+explode inside the projection) and
immediately partially aggregated per (replica), so the shuffle carries
B rows per partition, not B× the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HASH_SPACE = 1 << 56
# floor(CDF_Poisson(1)(k) · 2^56) for k = 0..3, computed at 80-digit
# decimal precision (CDF(k) = e⁻¹·Σ_{i≤k} 1/i!); weights above cap at
# 4. Verify: decimal.getcontext().prec = 80;
# int(Decimal(-1).exp() * sum(1/factorial(i)) * Decimal(2**56)).
# The oracle SQL interpolates these same literals
# (plans/statistics.py:548), so both engines share them by
# construction.
POISSON1_CUTPOINTS = (
    26508507426831583,
    53017014853663166,
    66271268567078957,
    70689353138217554,
)


def poisson_weight_expr(replica: F.Column, row_key: F.Column) -> F.Column:
    """Deterministic Poisson(1) draw for (replica, row): md5-uniform
    against the fixed integer cutpoints. The uniform draw is bound
    ONCE (``bind_once``) before the cutpoint CASE chain references it
    four times — Catalyst re-evaluates textual occurrences, so the
    unbound form paid four md5+conv per draw (part of the measured
    13-16 s → ~2 s rework of stats_bootstrap_means; BASELINE.md
    round-10)."""
    from ..text.analysis import bind_once

    u_expr = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("bs_"), replica.cast("string"),
                           F.lit("_"), row_key.cast("string"))),
            1, 14,
        ),
        16, 10,
    ).cast("long")

    def chain(u):
        w = F.lit(4)
        for k in range(len(POISSON1_CUTPOINTS) - 1, -1, -1):
            w = F.when(u < POISSON1_CUTPOINTS[k], F.lit(k)).otherwise(w)
        return w

    return bind_once(u_expr, chain)


def bootstrap_replica_means(
    df: DataFrame,
    *,
    id_col: str,
    value_col: str,
    n_replicas: int = 32,
) -> DataFrame:
    """(replica, n_eff, mean_value): Poisson-bootstrap replica means of
    ``value_col`` — the spread across replicas IS the sampling
    uncertainty of the mean. Emitted as the replica table (not a
    collapsed stddev) so every number is exactly engine-replayable;
    deriving the SE is one trivial aggregation away for the consumer."""
    # This operator does B md5 draws per row — rebalance a small input
    # before the fan-out (no-op on large inputs; measured 15 s
    # single-task → 1.6 s at sf0.1/local[32]).
    from ..operators.transforms import rebalance_for_fanout

    src = rebalance_for_fanout(
        df.select(F.col(id_col).alias("_id"), F.col(value_col).alias("_v"))
    )
    # The (replica, weight) pairs come out of ONE explode(transform())
    # generator: the weight is computed inside the transform lambda
    # (once per replica element) and reaches the aggregate as a REAL
    # attribute. The previous shape projected the weight expression
    # under the aggregate, which CollapseProject merged into the agg's
    # two _w references — with the unbound uniform draw that meant ~8
    # md5 evaluations per (row, replica).
    kv = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_replicas - 1)),
            lambda b: F.struct(
                b.cast("long").alias("replica"),
                poisson_weight_expr(b, F.col("_id")).alias("w"),
            ),
        )
    ).alias("_kv")
    rows = src.select("_v", kv)
    return (
        rows.select(
            F.col("_kv.replica").alias("replica"),
            F.col("_kv.w").alias("_w"),
            "_v",
        )
        .groupBy("replica")
        .agg(
            F.sum("_w").cast("long").alias("n_eff"),
            F.round(
                F.sum(F.col("_w") * F.col("_v").cast("decimal(18,2)"))
                .cast("double")
                / F.sum("_w"),
                6,
            ).alias("mean_value"),
        )
    )
