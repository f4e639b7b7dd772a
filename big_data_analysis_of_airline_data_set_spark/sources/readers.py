"""Readers: Parquet primary, CSV compatibility path.

Replaces reference S1-S3 (SURVEY.md §2.1): the reference reads headered
CSV with ``inferSchema=True`` (two passes) and unions five yearly files
positionally (``nb:4-5``). Here:

- Parquet with explicit schema — single pass, columnar, predicate/column
  pushdown into row-group stats, splittable at 100 TB.
- Multi-file ingest is one glob scan, not N reads + N-1 unions.
- CSV stays available (explicit schema, no inference) for compatibility
  with the reference's file format.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from .schemas import TESTDATA_SCHEMAS, TESTDATA_TABLES


def read_parquet_table(
    spark: SparkSession, path: str, schema: StructType | None = None
) -> DataFrame:
    """Parquet scan. ``schema`` (when given) pins the read schema so a
    drifted file fails fast instead of silently widening types."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    *,
    header: bool = True,
) -> DataFrame:
    """CSV scan with a REQUIRED explicit schema — kills the reference's
    ``inferSchema=True`` extra pass (Scripts/1_cs_777_cleaning_data.py:30)."""
    return spark.read.csv(path, header=header, schema=schema)


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def _normalize_events(spark: SparkSession, df: DataFrame) -> DataFrame:
    """events.ts arrives as epoch-nanos long (parquet TIMESTAMP(NANOS) is
    unreadable by Spark otherwise); convert to TimestampType. Integer
    ``div`` keeps full precision — a double division would lose bits at
    1.7e18 nanos."""
    return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def read_testdata_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver-testdata table with its pinned schema, applying
    table-specific normalization (events.ts nanos→timestamp)."""
    if name == "events":
        # The driver may hand us a session built without the legacy flag;
        # it is session-settable, so pin it here before the scan.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = read_parquet_table(spark, table_path(sf_dir, name), TESTDATA_SCHEMAS.get(name))
    if name == "events":
        df = _normalize_events(spark, df)
    return df


def load_star_schema(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TESTDATA_TABLES
) -> dict[str, DataFrame]:
    """Load the driver testdata star schema as DataFrames keyed by name."""
    return {name: read_testdata_table(spark, sf_dir, name) for name in tables}


def register_star_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load + register each testdata table as a temp view so queries can be
    written in ``spark.sql`` as well as the DataFrame API."""
    dfs = load_star_schema(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
