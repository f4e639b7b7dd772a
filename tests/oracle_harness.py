"""Local stand-in for the driver's t2 compare: run a QuerySpec's Spark
query and its DuckDB oracle on the same parquet dir, then compare
row count, column names, and values (order-insensitive).

Floats are compared to 1e-9 relative tolerance locally; queries are
designed so values are byte-identical anyway (decimal-exact sums,
round(6) statistics) since the real driver hashes values.
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

TESTDATA_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TESTDATA_TABLES:
            path = os.path.join(sf_dir, f"{t}.parquet")
            if os.path.exists(path):
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
                )
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort", ignore_index=True)
    return df


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str) -> None:
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count {len(spark_pdf)} != oracle {len(oracle_pdf)}"
    )
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: columns {sorted(spark_pdf.columns)} != oracle {sorted(oracle_pdf.columns)}"
    )
    a, b = _canon(spark_pdf), _canon(oracle_pdf)
    a_types = [str(t) for t in a.dtypes]
    b_types = [str(t) for t in b.dtypes]
    assert a_types == b_types, (
        f"{name}: dtypes {list(zip(a.columns, a_types))} != oracle "
        f"{list(zip(b.columns, b_types))}"
    )
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if x is None or (isinstance(x, float) and math.isnan(x)):
                ok = y is None or (isinstance(y, float) and math.isnan(y))
            elif isinstance(x, float) or isinstance(y, float):
                ok = math.isclose(float(x), float(y), rel_tol=1e-9, abs_tol=1e-12)
            else:
                ok = x == y
            assert ok, f"{name}: col {col} row {i}: spark={x!r} oracle={y!r}"


def check_query(spark, spec, sf_dir: str) -> None:
    spark_pdf = spec.fn(spark, sf_dir).toPandas()
    oracle_pdf = run_oracle(spec.oracle, sf_dir)
    assert_frames_match(spark_pdf, oracle_pdf, spec.name)
