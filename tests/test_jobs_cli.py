"""CLI job parity: the three reference spark-submit shapes run end to
end through their argparse mains on a real flights-shaped parquet."""

from __future__ import annotations

import os
import shutil
import tempfile

import pandas as pd
import pytest

from big_data_analysis_of_airline_data_set_spark.jobs import analyze, clean, train
from big_data_analysis_of_airline_data_set_spark.plans.flights_job import synthetic_flights


@pytest.fixture(scope="module")
def work(spark, sf_dir):
    d = tempfile.mkdtemp(prefix="jobs-")
    raw = os.path.join(d, "raw_flights")
    synthetic_flights(spark, sf_dir).drop("_rowkey_hi", "_rowkey_lo").write.mode(
        "overwrite"
    ).parquet(raw)
    yield d, raw
    shutil.rmtree(d, ignore_errors=True)


def test_clean_analyze_train_cli_chain(spark, work):
    d, raw = work

    clean.main(["--input", raw, "--output", f"{d}/cleaned"])
    assert os.path.isdir(f"{d}/cleaned/visualization")
    years = [p for p in os.listdir(f"{d}/cleaned/ml_table") if p.startswith("Year=")]
    assert len(years) >= 2  # partitioned by Year

    analyze.main(["--input", f"{d}/cleaned/ml_table", "--output", f"{d}/stats",
                  "--top-categorical", "2", "--top-continuous", "3",
                  "--variance-k", "3"])
    sel_dir = f"{d}/stats/selected"
    sel_csv = next(f for f in os.listdir(sel_dir) if f.endswith(".csv"))
    sel = pd.read_csv(os.path.join(sel_dir, sel_csv))
    assert {"method", "feature"} <= set(sel.columns)
    assert len(sel) > 0

    train.main([
        "--input", f"{d}/cleaned/ml_table", "--output", f"{d}/metrics",
        "--family", "logistic_regression", "--features", sel_dir,
        "--test-year", "2001", "--grid", "quick",
    ])
    mdir = f"{d}/metrics/logistic_regression_metrics"
    mcsv = next(f for f in os.listdir(mdir) if f.endswith(".csv"))
    metrics = pd.read_csv(os.path.join(mdir, mcsv))
    assert "area_ROC" in set(metrics.parameter)
