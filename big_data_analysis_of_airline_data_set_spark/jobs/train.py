"""Job 3 — model training CLI (reference: Scripts/3-10, one per
estimator family; here one job with ``--family``).

Reads the ML table + (optionally) a selected-features CSV from job 2,
does the temporal year split, tunes over the reference grid (or the
quick grid) with TVS or CV, and writes the metrics table.
"""

from __future__ import annotations

import argparse
import glob

from ..ml.estimators import ESTIMATOR_FAMILIES
from ..ml.train_job import run_training_job
from ..session import get_session
from ..sources.writers import write_report_csv

from pyspark.sql import functions as F


def _load_selected(features_dir: str, method: str) -> list[str]:
    import pandas as pd

    csv = next(iter(glob.glob(f"{features_dir}/*.csv")))
    sel = pd.read_csv(csv)
    return sorted(sel[sel.method == method].feature)


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="ml_table parquet path")
    p.add_argument("--output", required=True, help="metrics output directory")
    p.add_argument("--family", choices=ESTIMATOR_FAMILIES, required=True)
    p.add_argument("--features", help="job-2 'selected' CSV dir (default: all columns)")
    p.add_argument("--label", default="Delay_Status")
    p.add_argument("--test-year", type=int, required=True)
    p.add_argument("--tuner", choices=["tvs", "cv"], default="tvs")
    p.add_argument("--grid", choices=["quick", "reference"], default="reference")
    p.add_argument("--mlp-layers", type=int, nargs="+")
    args = p.parse_args(argv)

    spark = get_session(f"job-train-{args.family}")
    df = spark.read.parquet(args.input)
    df = df.withColumnRenamed(args.label, "label").withColumn(
        "label", F.col("label").cast("double")
    )

    from ..ml.pipeline import infer_feature_columns

    cats, nums = infer_feature_columns(df)
    if args.features:
        cats = [c for c in _load_selected(args.features, "univariate_categorical") if c in cats]
        nums = [c for c in _load_selected(args.features, "univariate_continuous") if c in nums]

    metrics = run_training_job(
        spark,
        df,
        categorical_cols=cats,
        numeric_cols=nums,
        family=args.family,
        year_col="Year",
        test_year=args.test_year,
        tuner=args.tuner,
        grid=args.grid,
        mlp_layers=args.mlp_layers,
    )
    write_report_csv(metrics, f"{args.output}/{args.family}_metrics")


if __name__ == "__main__":
    main()
