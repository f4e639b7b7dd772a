"""Deterministic A/B arm assignment shared by the experimentation
entries (SRM check, per-segment uplift).

md5 is the ONE hash Spark and DuckDB produce bit-for-bit (xxhash64
is Spark-only), so the arm is the parity of the digest's last hex
digit. Both the Spark Column and the DuckDB SQL fragment live HERE —
the two catalog entries cross-validate only while their assignments
stay bit-identical, so there must be exactly one definition of each.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_parity_arm(user_col: Column) -> Column:
    """0/1 arm from the last hex digit of md5(user_col as string)."""
    return (
        F.conv(F.substring(F.md5(user_col.cast("string")), 32, 1), 16, 10)
        .cast("long")
        % 2
    )


def md5_parity_arm_sql(user_expr: str) -> str:
    """The DuckDB replay of :func:`md5_parity_arm` (strpos digit
    decode — DuckDB has no hex conv)."""
    return (
        "CAST((strpos('0123456789abcdef', "
        f"substr(md5(CAST({user_expr} AS VARCHAR)), 32, 1)) - 1) "
        "% 2 AS BIGINT)"
    )
