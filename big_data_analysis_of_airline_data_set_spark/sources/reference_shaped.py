"""Reference-shaped flights sample — the nb:8 scale regression fixture.

The reference's sample notebook works on a seed-777, 0.1% Kaggle sample
(29,179 rows; `CS 777 Semester Project (Small Dataset).ipynb` cells
8-10) whose categorical design has the vocabulary sizes that produce
the chi-square dof vector [27, 357, 51, 342, 51] (nb:67 output) for
[Airline, Origin, OriginState, Dest, DestState] vs Delay_Status.

The Kaggle CSV itself isn't available here, so this module builds a
deterministic frame with the same shape: identical row count, the same
five categorical vocabular sizes, the post-cleaning numeric columns of
`Scripts/1_cs_777_cleaning_data.py:41-102`, a temporal Year split with
a ≈13.9% 2022 test slice (nb:10: 4,065/29,179), and a label whose
signal structure reproduces the notebook's metric PATTERN: a
deterministic nonlinear rule on DepTimeHour that a depth-bounded
decision tree carves exactly (the nb:121 AUC=1.0 small-sample
artifact, SURVEY.md §2.12.9) while a linear model recovers only the
monotone fraction (nb:113's mid-0.6 AUC).

Everything is hash-derived from the row id — no RNG, stable across
sessions and engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_ROWS = 29_179

AIRLINE_CARD = 28
ORIGIN_CARD = 358
ORIGIN_STATE_CARD = 52
DEST_CARD = 343
DEST_STATE_CARD = 52

CHI_SQUARE_DESIGN = ["Airline", "Origin", "OriginState", "Dest", "DestState"]

# Delay iff DepTimeHour lands in this scattered set: the {13..23}-odd
# block gives a linear model a monotone hour signal (pairwise-AUC of the
# hour ranking alone ≈ 0.63), while the even low-hour exceptions keep it
# linearly inseparable; a tree resolves every interval exactly.
DELAY_HOURS = (2, 4, 6, 13, 15, 17, 19, 21, 23)


def _h(col_tag: str, modulus: int):
    return F.pmod(F.xxhash64(F.concat(F.lit(col_tag + "_"), F.col("id"))), F.lit(modulus))


def reference_shaped_flights(spark: SparkSession, *, n_rows: int = N_ROWS) -> DataFrame:
    """Cleaned-shape frame (post Scripts/1 semantics: no Cancelled rows,
    no DepDelay/ArrDelay — they are dropped at Scripts/1_...py:70-72
    after deriving Delay_Status)."""
    base = spark.range(n_rows)
    month = (_h("month", 12) + 1).cast("int")
    dep_hour = _h("dep_hour", 24).cast("int")
    year_bucket = _h("year", 36)
    df = base.select(
        F.format_string("AL%02d", _h("airline", AIRLINE_CARD)).alias("Airline"),
        F.format_string("O%03d", _h("origin", ORIGIN_CARD)).alias("Origin"),
        F.format_string("OS%02d", _h("ostate", ORIGIN_STATE_CARD)).alias("OriginState"),
        F.format_string("D%03d", _h("dest", DEST_CARD)).alias("Dest"),
        F.format_string("DS%02d", _h("dstate", DEST_STATE_CARD)).alias("DestState"),
        _h("diverted", 50).isin(0).cast("int").alias("Diverted"),
        (F.pmod(F.xxhash64(F.concat(F.lit("airtime_"), F.col("id"))), F.lit(300)) + 20)
        .cast("double")
        .alias("AirTime"),
        (F.pmod(F.xxhash64(F.concat(F.lit("dist_"), F.col("id"))), F.lit(2500)) + 100)
        .cast("double")
        .alias("Distance"),
        # nb:10: Year=2022 is the test slice, ≈13.9% of rows (5/36)
        F.when(year_bucket < 8, 2018)
        .when(year_bucket < 16, 2019)
        .when(year_bucket < 24, 2020)
        .when(year_bucket < 31, 2021)
        .otherwise(2022)
        .cast("int")
        .alias("Year"),
        ((month + 2) / 3).cast("int").alias("Quarter"),
        month.alias("Month"),
        (_h("dom", 28) + 1).cast("int").alias("DayofMonth"),
        (_h("dow", 7) + 1).cast("int").alias("DayOfWeek"),
        dep_hour.alias("DepTimeHour"),
        _h("dep_min", 60).cast("int").alias("DepTimeMinute"),
        _h("arr_hour", 24).cast("int").alias("ArrTimeHour"),
        _h("arr_min", 60).cast("int").alias("ArrTimeMinute"),
        F.lit(0.0).alias("DivAirportLandings"),
        dep_hour.isin(*DELAY_HOURS).cast("int").alias("Delay_Status"),
    )
    return df
