"""The reference's full three-job DAG, end to end (SURVEY.md §3):

job 1 (clean+engineer) → job 2 (feature selection, handed off through
the CSV report sink exactly like the reference's file-based DAG,
S4/S5→S3) → job 3 (train LR on the selected features, temporal split,
6 metrics).
"""

from __future__ import annotations

import os
import tempfile
import shutil

import pandas as pd
from pyspark.sql import functions as F

from big_data_analysis_of_airline_data_set_spark.ml import (
    build_pipeline,
    evaluate_predictions,
    infer_feature_columns,
    make_estimator,
    temporal_split,
)
from big_data_analysis_of_airline_data_set_spark.operators.cleaning import clean_and_engineer
from big_data_analysis_of_airline_data_set_spark.plans.flights_job import synthetic_flights
from big_data_analysis_of_airline_data_set_spark.sources.writers import write_report_csv
from big_data_analysis_of_airline_data_set_spark.stats.feature_selection_job import (
    feature_selection_job,
)


def test_clean_select_train_dag(spark, sf_dir):
    out = tempfile.mkdtemp(prefix="dag-")
    try:
        # --- job 1: clean + engineer ---------------------------------
        flights = synthetic_flights(spark, sf_dir).drop("_rowkey_hi", "_rowkey_lo")
        ml_table = clean_and_engineer(flights).withColumnRenamed("Delay_Status", "label")
        ml_table = ml_table.withColumn("label", F.col("label").cast("double"))
        assert ml_table.filter(F.col("label").isNull()).count() == 0

        # --- job 2: stats + selection, CSV handoff -------------------
        cats, nums = infer_feature_columns(ml_table)
        assert "Airline" in cats and "Distance" in nums
        artifacts = feature_selection_job(
            spark,
            ml_table,
            categorical_cols=cats,
            numeric_cols=nums,
            label_col="label",
            num_top_categorical=2,
            num_top_continuous=3,
            variance_k=3,
        )
        sel_dir = os.path.join(out, "selected")
        write_report_csv(artifacts["selected"], sel_dir)

        # --- job 3: read lists back (reference S3), train ------------
        csv_file = next(
            os.path.join(sel_dir, f) for f in os.listdir(sel_dir) if f.endswith(".csv")
        )
        sel = pd.read_csv(csv_file)
        sel_cats = sorted(
            set(sel[sel.method == "univariate_categorical"].feature) & set(cats)
        )
        sel_nums = sorted(
            set(sel[sel.method == "univariate_continuous"].feature) & set(nums)
        )
        assert sel_cats and sel_nums

        train, test = temporal_split(ml_table, "Year", 2001)
        est = make_estimator("logistic_regression")
        est.setMaxIter(15)
        model = build_pipeline(sel_cats, sel_nums, est).fit(train)
        metrics = evaluate_predictions(model.transform(test))
        assert set(metrics) == {"area_ROC", "accuracy", "tpr", "fpr", "precision", "f1_score"}
        assert 0.0 <= metrics["area_ROC"] <= 1.0
        assert 0.0 < metrics["accuracy"] <= 1.0
    finally:
        shutil.rmtree(out, ignore_errors=True)
