"""Z-order layout (operators/zorder.py): key arithmetic pins and the
actual 2-D data-skipping payoff — files written by write_zorder_layout
must carry substantially tighter min/max footer stats on BOTH columns
than a hash-shuffled control layout."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from big_data_analysis_of_airline_data_set_spark.operators.zorder import (
    interleave_bits,
    range_bucket,
    write_zorder_layout,
    zorder_key,
)
from big_data_analysis_of_airline_data_set_spark.sources.readers import read_testdata_table

SF = "/root/testdata/sf0.001"


def test_interleave_matches_reference_morton(spark):
    cases = [(0, 0, 0), (1, 0, 1), (0, 1, 2), (1, 1, 3), (3, 5, 0b100111),
             (15, 15, 255)]
    df = spark.createDataFrame([(x, y) for x, y, _ in cases], "x long, y long")
    got = [
        r.z
        for r in df.select(
            interleave_bits(F.col("x"), F.col("y"), 4).alias("z")
        ).collect()
    ]
    assert got == [z for _, _, z in cases]


def test_range_bucket_clamps_and_spreads(spark):
    df = spark.range(1).select(
        *[
            range_bucket(F.lit(v).cast("double"), 0.0, 100.0, 4).alias(f"b{i}")
            for i, v in enumerate([-5.0, 0.0, 50.0, 99.9, 100.0, 200.0])
        ]
    )
    r = df.first()
    assert [r[i] for i in range(6)] == [0, 0, 8, 15, 15, 15]


def _file_ranges(path: str, column: str) -> list[tuple]:
    out = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        if md.num_rows == 0:
            continue
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            group = md.row_group(rg)
            col = next(
                group.column(i)
                for i in range(group.num_columns)
                if group.column(i).path_in_schema == column
            )
            assert col.statistics is not None
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        out.append((min(mins), max(maxs)))
    return out


def _mean_span(ranges: list[tuple]) -> float:
    return sum(hi - lo for lo, hi in ranges) / len(ranges)


def test_zorder_layout_tightens_both_columns(spark, tmp_path):
    li = read_testdata_table(spark, SF, "lineitem").select(
        "l_quantity", "l_extendedprice"
    )
    zdir = str(tmp_path / "z")
    write_zorder_layout(
        li, zdir, col_x="l_quantity", col_y="l_extendedprice", num_files=16
    )
    control = str(tmp_path / "hash")
    li.repartition(16).write.parquet(control)

    for column in ("l_quantity", "l_extendedprice"):
        z_span = _mean_span(_file_ranges(zdir, column))
        c_span = _mean_span(_file_ranges(control, column))
        # hash files span ~the full range; z-ordered files cover compact
        # 2-D cells → mean per-file span must shrink on BOTH columns
        assert z_span < 0.8 * c_span, (column, z_span, c_span)

    # round-trip: clustering must not lose rows
    assert spark.read.parquet(zdir).count() == li.count()
