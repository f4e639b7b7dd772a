"""Job 1 — cleaning + feature engineering CLI
(reference: Scripts/1_cs_777_cleaning_data.py, argv in/out at :21-22).

Reads a raw flights table (parquet, or CSV with the canonical schema),
writes BOTH reference outputs:
- <output>/visualization : cancelled ∪ cleaned rows (nulls intact)
- <output>/ml_table      : cleaned + engineered, partitioned by Year
  (the temporal train/test filter then prunes partitions statically)
"""

from __future__ import annotations

import argparse

from ..operators.cleaning import clean_and_engineer, visualization_dataset
from ..session import get_session
from ..sources.readers import read_csv, read_parquet_table
from ..sources.schemas import FLIGHTS_RAW_SCHEMA
from ..sources.writers import write_parquet


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="raw flights parquet/CSV path")
    p.add_argument("--output", required=True, help="output directory")
    p.add_argument("--format", choices=["parquet", "csv"], default="parquet")
    args = p.parse_args(argv)

    spark = get_session("job-clean")
    if args.format == "csv":
        flights = read_csv(spark, args.input, FLIGHTS_RAW_SCHEMA)
    else:
        flights = read_parquet_table(spark, args.input, FLIGHTS_RAW_SCHEMA)

    write_parquet(visualization_dataset(flights), f"{args.output}/visualization")
    write_parquet(
        clean_and_engineer(flights), f"{args.output}/ml_table", partition_by=["Year"]
    )


if __name__ == "__main__":
    main()
