"""Golden quirk tests (SURVEY.md §2.12) on a constructed flights fixture
(FIXTURES.md §A edge values): hhmm extraction string semantics, label
boundary, cancelled∪cleaned union, plus a property test pinning the
string-substr hour/minute rules against integer math on the 3-4 digit
domain."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from big_data_analysis_of_airline_data_set_spark.functions.flight_exprs import (
    delay_group,
    delay_status,
    hhmm_hour_int,
    hhmm_minute_int,
)
from big_data_analysis_of_airline_data_set_spark.operators.cleaning import (
    clean_flights,
    engineer_features,
    visualization_dataset,
)
from big_data_analysis_of_airline_data_set_spark.sources.schemas import FLIGHTS_RAW_SCHEMA


def _flight(**over):
    base = dict(
        Airline="AA", Origin="BOS", Dest="JFK", Cancelled=False, Diverted=False,
        DepTime=1433.0, DepDelay=5.0, ArrTime=1610.0, ArrDelay=-3.0,
        AirTime=90.0, Distance=187.0, Year=2021, Quarter=2, Month=6,
        DayofMonth=15, DayOfWeek=2, OriginCityName="Boston, MA",
        OriginState="MA", DestCityName="New York, NY", DestState="NY",
        DivAirportLandings=0.0,
    )
    base.update(over)
    return Row(**base)


# (DepTime, expected hour, expected minute) — reference string semantics:
# Scripts/1_cs_777_cleaning_data.py:79-92. NULL minute stays NULL.
HHMM_CASES = [
    (None, 0, None),
    (0.0, 0, 0),
    (5.0, 0, 5),
    (59.0, 0, 59),
    (100.0, 1, 0),   # '100' → substr(0,1)='1', right2='00'
    (959.0, 9, 59),
    (1000.0, 10, 0),
    (2359.0, 23, 59),
    (2400.0, 24, 0),  # '2400' → '24', '00'
]


def test_hhmm_extraction_edge_values(spark):
    rows = [
        _flight(DepTime=t, ArrTime=1200.0, Cancelled=False, DepDelay=1.0, ArrDelay=1.0)
        for t, _, _ in HHMM_CASES
    ]
    df = spark.createDataFrame(rows, FLIGHTS_RAW_SCHEMA)
    out = df.select(
        "DepTime",
        hhmm_hour_int(F.col("DepTime")).alias("h"),
        hhmm_minute_int(F.col("DepTime")).alias("m"),
    ).collect()
    got = {r.DepTime: (r.h, r.m) for r in out}
    for t, eh, em in HHMM_CASES:
        assert got[t] == (eh, em), f"DepTime={t}: got {got[t]}, want {(eh, em)}"


def test_delay_status_boundary(spark):
    # == 0 on both legs is ON TIME (<=); any leg positive → 1; NULL → 1.
    cases = [
        (0.0, 0.0, 0), (-1.0, 0.0, 0), (0.0, -1.0, 0), (-5.0, -5.0, 0),
        (0.1, 0.0, 1), (0.0, 0.1, 1), (10.0, -10.0, 1), (None, 0.0, 1),
        (0.0, None, 1),
    ]
    rows = [_flight(DepDelay=d, ArrDelay=a) for d, a, _ in cases]
    df = spark.createDataFrame(rows, FLIGHTS_RAW_SCHEMA)
    out = df.select(
        "DepDelay", "ArrDelay",
        delay_status(F.col("DepDelay"), F.col("ArrDelay")).alias("s"),
    ).collect()
    for r, (d, a, want) in zip(out, cases):
        assert r.s == want, f"({d},{a}): got {r.s}, want {want}"


def test_cleaning_preserves_cancelled_in_viz_and_drops_in_ml(spark):
    rows = [
        _flight(),  # clean row
        _flight(Cancelled=True, DepTime=None, ArrTime=None, DepDelay=None,
                ArrDelay=None, AirTime=None),  # cancelled, nulls intact
        _flight(Cancelled=False, AirTime=None),  # non-cancelled w/ null → dropped
    ]
    df = spark.createDataFrame(rows, FLIGHTS_RAW_SCHEMA)

    viz = visualization_dataset(df)
    # cancelled row kept UN-dropped (nulls intact), null non-cancelled dropped
    assert viz.count() == 2
    assert viz.filter(F.col("Cancelled") == True).count() == 1  # noqa: E712

    ml = clean_flights(df)
    assert ml.count() == 1
    assert "Cancelled" not in ml.columns


def test_engineer_features_schema_and_values(spark):
    df = spark.createDataFrame([_flight()], FLIGHTS_RAW_SCHEMA)
    out = engineer_features(clean_flights(df)).collect()[0]
    assert out.Delay_Status == 1          # DepDelay 5 > 0
    assert out.OriginCityName == "Boston"  # ", MA" stripped
    assert out.DestCityName == "New York"
    assert (out.DepTimeHour, out.DepTimeMinute) == (14, 33)
    assert (out.ArrTimeHour, out.ArrTimeMinute) == (16, 10)
    assert out.Diverted == 0              # bool → int


def test_delay_group_buckets(spark):
    cases = [
        (-10.0, False, "Before_Time"), (0.0, False, "On_Time"),
        (10.0, False, "Small_delay"), (15.0, False, "Small_delay"),
        (16.0, False, "Medium_Delay"), (60.0, False, "Medium_Delay"),
        (61.0, False, "Large_Delay"), (None, True, "Cancelled"),
        (100.0, True, "Cancelled"),  # cancelled wins over delay
    ]
    rows = [_flight(ArrDelay=d, Cancelled=c) for d, c, _ in cases]
    df = spark.createDataFrame(rows, FLIGHTS_RAW_SCHEMA)
    out = df.select(delay_group(F.col("ArrDelay"), F.col("Cancelled")).alias("g")).collect()
    for r, (d, c, want) in zip(out, cases):
        assert r.g == want, f"({d},{c}): got {r.g}, want {want}"


@pytest.fixture(scope="module")
def hhmm_probe(spark):
    """One DataFrame per module; property test re-filters it driver-side."""
    vals = list(range(0, 2500))
    df = spark.createDataFrame([(float(v),) for v in vals], "t double")
    rows = df.select(
        "t",
        hhmm_hour_int(F.col("t")).alias("h"),
        hhmm_minute_int(F.col("t")).alias("m"),
    ).collect()
    return {int(r.t): (r.h, r.m) for r in rows}


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=0, max_value=2499))
def test_hhmm_property_vs_integer_math(hhmm_probe, t):
    h, m = hhmm_probe[t]
    # String semantics coincide with integer math everywhere EXCEPT:
    # minutes of t<100 are the whole number (right-2 of short strings).
    if t >= 100:
        assert h == t // 100
        assert m == t % 100
    else:
        assert h == 0
        assert m == t if t < 100 else t % 100
