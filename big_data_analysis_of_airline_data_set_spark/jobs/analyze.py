"""Job 2 — statistical analysis + feature selection CLI
(reference: Scripts/2_cs_777_statistical_analysis_feature_selection.py).

Reads the ML table written by job 1, runs correlation + chi-square +
univariate/variance selection, writes the small report artifacts as
single-file CSVs (the reference's S5 sinks) under <output>/.
"""

from __future__ import annotations

import argparse

from ..ml.pipeline import infer_feature_columns
from ..session import get_session
from ..sources.writers import write_report_csv
from ..stats.feature_selection_job import feature_selection_job

from pyspark.sql import functions as F


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="ml_table parquet path (job 1 output)")
    p.add_argument("--output", required=True, help="report output directory")
    p.add_argument("--label", default="Delay_Status")
    p.add_argument("--top-categorical", type=int, default=3)
    p.add_argument("--top-continuous", type=int, default=7)
    p.add_argument("--variance-k", type=int, default=6)
    args = p.parse_args(argv)

    spark = get_session("job-analyze")
    df = spark.read.parquet(args.input).withColumn(
        "label", F.col(args.label).cast("double")
    )
    cats, nums = infer_feature_columns(df, exclude=("Year", args.label, "label"))
    artifacts = feature_selection_job(
        spark,
        df,
        categorical_cols=cats,
        numeric_cols=nums,
        label_col="label",
        num_top_categorical=args.top_categorical,
        num_top_continuous=args.top_continuous,
        variance_k=args.variance_k,
    )
    for name, table in artifacts.items():
        write_report_csv(table, f"{args.output}/{name}")


if __name__ == "__main__":
    main()
