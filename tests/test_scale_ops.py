"""Semantics tests for the scale-ops operators (PII redaction,
sessionization, trailing EWMA) on crafted rows — the oracle harness
covers the catalog queries end-to-end; these pin the operator-level
edge cases."""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import functions as F

from big_data_analysis_of_airline_data_set_spark.operators.timeseries import (
    sessionize,
    trailing_ewma,
)
from big_data_analysis_of_airline_data_set_spark.text.redaction import (
    redaction_report,
)


def test_redaction_counts_and_tags(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a.b-c@x.co and 10.0.0.1 then 555-1234 ok"),
            (2, "no pii here, just words and 1234 and a-b"),
            (3, "two mails p@q.io r@s.org one ip 1.2.3.4"),
        ],
        ["doc_id", "text"],
    )
    rows = {
        r["doc_id"]: r
        for r in redaction_report(df, id_col="doc_id", text_col="text").collect()
    }
    assert (rows[1]["n_email"], rows[1]["n_ipv4"], rows[1]["n_phone"]) == (1, 1, 1)
    assert rows[1]["n_pii_total"] == 3
    assert (rows[2]["n_email"], rows[2]["n_ipv4"], rows[2]["n_phone"]) == (0, 0, 0)
    assert (rows[3]["n_email"], rows[3]["n_ipv4"]) == (2, 1)
    # redacted text carries the tags, not the originals
    redacted1 = spark.createDataFrame(
        [("mail a.b-c@x.co and 10.0.0.1 then 555-1234 ok",)], ["text"]
    ).select(
        F.md5(
            F.lit("mail [EMAIL] and [IP] then [PHONE] ok")
        ).alias("want")
    ).collect()[0]["want"]
    assert rows[1]["redacted_md5"] == redacted1


def test_redaction_email_not_double_counted_as_ip(spark):
    # digits-and-dots inside an email local part must not produce an
    # IPv4 count (email replaced first; counts on original text use \b
    # anchored quads only)
    df = spark.createDataFrame([(1, "x 1.2.3.4a and u1.2@a.io y")], ["doc_id", "text"])
    r = redaction_report(df, id_col="doc_id", text_col="text").collect()[0]
    # "1.2.3.4a" has a word char after the last octet -> \b fails at the
    # boundary only between '4' and 'a'... it's still a match ending at 4?
    # No: \d{1,3}\b requires a non-word char after '4'; 'a' is a word
    # char, so backtracking can't help (the quad must end at a boundary).
    assert r["n_ipv4"] == 0
    assert r["n_email"] == 1


def _ts(m: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, 0, 0) + dt.timedelta(minutes=m)


def test_sessionize_gap_splits(spark):
    df = spark.createDataFrame(
        [
            ("u1", 1, _ts(0)),
            ("u1", 2, _ts(10)),
            ("u1", 3, _ts(50)),  # 40 min gap > 30 -> new session
            ("u1", 4, _ts(55)),
            ("u2", 5, _ts(0)),
        ],
        ["user_id", "event_id", "ts"],
    )
    out = sessionize(
        df, key_col="user_id", ts_col="ts",
        order_tiebreak_col="event_id", gap_seconds=1800,
    )
    got = {r["event_id"]: r["session_ordinal"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 2, 5: 1}


def test_sessionize_boundary_is_exclusive(spark):
    # gap exactly == gap_seconds stays in the same session (strict >)
    df = spark.createDataFrame(
        [("u1", 1, _ts(0)), ("u1", 2, _ts(30))], ["user_id", "event_id", "ts"]
    )
    out = sessionize(
        df, key_col="user_id", ts_col="ts",
        order_tiebreak_col="event_id", gap_seconds=1800,
    )
    assert {r["session_ordinal"] for r in out.collect()} == {1}


def test_trailing_ewma_hand_computed(spark):
    df = spark.createDataFrame(
        [("u", 1, _ts(0), 1.0), ("u", 2, _ts(1), 2.0), ("u", 3, _ts(2), 3.0)],
        ["user_id", "event_id", "ts", "value"],
    )
    out = trailing_ewma(
        df, key_col="user_id", ts_col="ts", order_tiebreak_col="event_id",
        value_col="value", decay=0.5, k=2,
    )
    got = {r["event_id"]: r["ewma"] for r in out.collect()}
    assert got[1] == 1.0
    # frame [1,2]: (1*0.5 + 2) / (0.5 + 1)
    assert math.isclose(got[2], 2.5 / 1.5, abs_tol=1e-6)
    # frame [2,3] (k=2 bound drops the first event)
    assert math.isclose(got[3], (2 * 0.5 + 3) / 1.5, abs_tol=1e-6)
    assert {r["event_id"]: r["_n_in_frame"] for r in out.collect()} == {
        1: 1, 2: 2, 3: 2,
    }
