"""QuerySpec: a named Spark query paired with its DuckDB oracle SQL.

Contract (driver t2): the Spark callable and the oracle SQL must produce
the same row count, the same column names/types, and the same values
(order-insensitive, columns sorted by name). Hence the conventions:

- alias every computed column identically on both sides;
- computed integers → BIGINT/long on both sides (pandas int64 parity);
- exact money sums via DECIMAL(18,2) accumulate, then cast to DOUBLE —
  byte-identical across engines regardless of addition order;
- statistical floats (corr, var) rounded to 6 decimals on both sides.

``oracle`` is None for non-SQL-expressible ops (MLlib fits, LSH, custom
stateful streaming) — driver then records a weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""
