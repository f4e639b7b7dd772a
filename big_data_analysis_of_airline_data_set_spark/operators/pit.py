"""Point-in-time (PIT) join — the feature-store lookup.

Joins each fact row to the dimension VERSION that was valid at the
fact's event time (``valid_from <= t < valid_to``) — the correctness
backbone of offline feature generation: training rows must see the
feature value as of the label's timestamp, never a later one (that's
label leakage, the exact bug PIT joins exist to prevent).

Contract: per key the version ranges are DISJOINT and cover each fact
timestamp at most once, so the equi-join on key + range filter yields
at most one match per fact row and needs no dedup. SCD2 tables built
by close-old/open-new maintenance (plans/patterns.py q_scd2_upsert
shape) satisfy this by construction.

Scale shape: an equi-join on the entity key (hash join; the dimension
side is versions-per-key small, typically broadcastable) followed by a
range FILTER — never a range JOIN: the non-equi predicate stays out of
the join condition so Catalyst plans a hash join, not a broadcast
nested loop. For dimensions too big to broadcast the same plan
shuffles on the key; per-key fan-out stays bounded by the version
count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def point_in_time_join(
    fact: DataFrame,
    dim: DataFrame,
    *,
    key: str,
    time_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    how: str = "inner",
) -> DataFrame:
    """Fact rows joined to the dimension version valid at their event
    time. ``how='left'`` keeps facts with no covering version (null
    dimension columns) — the audit mode."""
    cond = (
        (fact[key] == dim[key])
        & (fact[time_col] >= dim[valid_from])
        & (fact[time_col] < dim[valid_to])
    )
    # equality present in the condition → Catalyst plans a HASH join on
    # the key and applies the range predicate as a join filter
    return fact.join(dim, cond, how).drop(dim[key])
