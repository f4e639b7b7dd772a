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
from pyspark.sql.types import (
    LongType,
    StructType,
    TimestampNTZType,
    TimestampType,
)

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


def _normalize_events(df: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` to session-TZ ``TimestampType`` regardless of
    how the file on disk encodes it.  The driver's testdata has shipped
    BOTH encodings across rounds — parquet TIMESTAMP(NANOS) (readable only
    as epoch-nanos long via ``nanosAsLong``) and TIMESTAMP(MICROS) — so the
    encoding is DETECTED from the scanned dtype, never assumed:

    - ``LongType``      → epoch-nanos under the legacy flag; integer ``div
      1000`` to micros (a double division would lose bits at 1.7e18).
    - ``TimestampNTZType`` → micros/millis read as wall-clock; reinterpret
      in the session TZ (UTC — ``session.py``), matching how DuckDB and the
      driver's oracle read the same file.
    - ``TimestampType`` → already right; pass through.
    """
    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(ts_type, TimestampNTZType):
        df = df.withColumn("ts", F.col("ts").cast(TimestampType()))
    elif not isinstance(ts_type, TimestampType):
        raise TypeError(f"events.ts: unexpected parquet type {ts_type}")
    return df


def read_testdata_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver-testdata table with its pinned schema, applying
    table-specific normalization (events.ts encoding detection)."""
    if name == "events":
        # events is read WITHOUT a pinned schema: the on-disk ts encoding
        # varies by testdata generation, and pinning (say) LongType against
        # a TIMESTAMP_MICROS file silently reads raw micros as nanos. The
        # legacy flag is session-settable and only affects NANOS files, so
        # it is safe to pin unconditionally before the scan.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return _normalize_events(read_parquet_table(spark, table_path(sf_dir, name)))
    return read_parquet_table(spark, table_path(sf_dir, name), TESTDATA_SCHEMAS.get(name))


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
