"""Z-order (Morton) multi-column layout — 2-D data-skipping at scale.

``write_sorted_layout`` (sources/writers.py) gives tight row-group
min/max stats on ONE key; queries filtering on a second column still
scan everything. Z-ordering interleaves the bits of two range-bucketed
columns into one sort key, so files cluster in 2-D cells and a filtered
read on EITHER column (or both) skips most row groups — the Delta/
Iceberg OPTIMIZE ZORDER technique, built here from plain Column
arithmetic.

Everything is integer math (bucketize → bit-interleave), so the key
computation is exactly replayable in SQL — the catalog query's DuckDB
oracle recomputes cells and per-cell aggregates from the same min/max
bounds (plans/patterns.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_bucket(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Linear bucket of ``col`` into [0, 2^bits) given closed bounds.
    ``floor((x − lo) / (hi − lo) · 2^bits)`` clamped — the same
    correctly-rounded double arithmetic on any engine."""
    n = 1 << bits
    raw = F.floor((col - F.lit(lo)) / (F.lit(hi) - F.lit(lo)) * n)
    return F.least(F.greatest(raw, F.lit(0)), F.lit(n - 1)).cast("long")


def interleave_bits(x: Column, y: Column, bits: int) -> Column:
    """Morton key: bit i of x → bit 2i, bit i of y → bit 2i+1."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def zorder_key(
    col_x: Column, col_y: Column,
    *,
    x_bounds: tuple[float, float],
    y_bounds: tuple[float, float],
    bits: int = 8,
) -> Column:
    """Z-order sort key for two numeric columns with known bounds.
    Bounds come from table stats (one cheap agg, or catalog metadata at
    scale) — passing them in keeps the key a pure deterministic
    expression."""
    bx = range_bucket(col_x, *x_bounds, bits)
    by = range_bucket(col_y, *y_bounds, bits)
    return interleave_bits(bx, by, bits)


def write_zorder_layout(
    df: DataFrame,
    path: str,
    *,
    col_x: str,
    col_y: str,
    bits: int = 8,
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` clustered by the Z-order of (col_x, col_y):
    repartitionByRange on the Morton key + sortWithinPartitions, so
    every output file covers a compact 2-D cell and carries tight
    min/max stats on BOTH columns."""
    bounds = df.agg(
        F.min(col_x), F.max(col_x), F.min(col_y), F.max(col_y)
    ).first()
    key = zorder_key(
        F.col(col_x), F.col(col_y),
        x_bounds=(float(bounds[0]), float(bounds[1])),
        y_bounds=(float(bounds[2]), float(bounds[3])),
        bits=bits,
    ).alias("_zkey")
    with_key = df.select("*", key)
    parted = (
        with_key.repartitionByRange(num_files, "_zkey")
        if num_files
        else with_key.repartitionByRange("_zkey")
    )
    parted.sortWithinPartitions("_zkey").drop("_zkey").write.mode(mode).parquet(path)
