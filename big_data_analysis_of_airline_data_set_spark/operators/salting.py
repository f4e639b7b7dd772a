"""Skew-handling salted join.

When one join key carries a disproportionate share of rows, a plain
shuffle join sends that key's whole partition to one task. Salting
splits the hot key's rows across ``salt`` sub-keys: the big side gets a
deterministic per-row salt, the small side is replicated once per salt
value, and the join runs on (key, salt) — same result, bounded task
size. AQE's skew-join handles sort-merge cases adaptively; explicit
salting is for deliberate, plan-stable mitigation (e.g. a known
hot-carrier key at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    *,
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Join ``big ⋈ small`` on column ``on`` with ``salt``-way key
    splitting. ``small`` is replicated ``salt`` times (keep it the
    dimension side). Result columns = big's + small's (minus the
    duplicate key), like a plain ``join(..., on)``."""
    big_salted = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt))
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt - 1))).alias("_salt")
    small_replicated = small.select("*", salts)
    joined = big_salted.join(small_replicated, [on, "_salt"], how)
    return joined.drop("_salt")
