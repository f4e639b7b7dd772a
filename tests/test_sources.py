"""Source compatibility: CSV with explicit schema (the reference's
format, minus inferSchema), parquet schema pinning."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from big_data_analysis_of_airline_data_set_spark.sources.readers import (
    read_csv,
    read_testdata_table,
)
from big_data_analysis_of_airline_data_set_spark.sources.schemas import TESTDATA_SCHEMAS


def test_csv_roundtrip_with_explicit_schema(spark, sf_dir):
    """Write lineitem-shaped CSV, read it back with the pinned schema —
    no inference pass, identical values."""
    d = tempfile.mkdtemp(prefix="csv-")
    try:
        li = read_testdata_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"
        )
        li.write.mode("overwrite").options(header=True).csv(d)
        from pyspark.sql.types import (
            StructType, StructField, LongType, IntegerType, DoubleType, StringType,
        )

        schema = StructType(
            [
                StructField("l_orderkey", LongType()),
                StructField("l_linenumber", IntegerType()),
                StructField("l_quantity", DoubleType()),
                StructField("l_returnflag", StringType()),
            ]
        )
        back = read_csv(spark, d, schema)
        assert back.schema == schema
        assert back.count() == li.count()
        a = li.agg(F.sum("l_quantity")).collect()[0][0]
        b = back.agg(F.sum("l_quantity")).collect()[0][0]
        assert abs(a - b) < 1e-6
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_pinned_parquet_schema_applied(spark, sf_dir):
    for name in ("orders", "lineitem", "documents"):
        df = read_testdata_table(spark, sf_dir, name)
        if name == "orders":
            assert dict(df.dtypes)["o_orderkey"] == "bigint"
        got = {f.name for f in df.schema.fields}
        want = {f.name for f in TESTDATA_SCHEMAS[name].fields}
        assert got == want


def test_events_normalized_to_timestamp(spark, sf_dir):
    ev = read_testdata_table(spark, sf_dir, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"
    assert ev.filter(F.col("ts").isNull()).count() == 0
