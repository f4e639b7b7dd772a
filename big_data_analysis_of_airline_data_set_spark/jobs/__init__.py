"""spark-submit-able job entry points mirroring the reference's three
CLI shapes (SURVEY.md §3): cleaning (job 1), statistical analysis /
feature selection (job 2), model training (jobs 3-10).

Run as modules:

    python -m big_data_analysis_of_airline_data_set_spark.jobs.clean \
        --input flights.parquet --output out/
    python -m big_data_analysis_of_airline_data_set_spark.jobs.analyze \
        --input out/ml_table --output out/stats
    python -m big_data_analysis_of_airline_data_set_spark.jobs.train \
        --input out/ml_table --features out/stats/selected \
        --family logistic_regression --test-year 2022 --output out/metrics

Differences from the reference CLIs, by design: named args instead of
positional argv, parquet instead of single-file CSV for data outputs,
and the in-session DataFrame handoff is available as a library path
(plans.flights_job / stats.feature_selection_job / ml.train_job).
"""
