"""Vectorized Pandas-UDF cosine — the Arrow-batched alternative to the
JVM ``zip_with``/``aggregate`` expression in dedup.embedding.

Exists because the north star names both paths: built-ins win when the
expression fits whole-stage codegen (our default); a vectorized pandas
UDF wins when the math outgrows SQL expressions (real encoders, matrix
ops) — then NumPy over Arrow batches beats per-row Python by orders of
magnitude. Equality with the built-in path is asserted in tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def cosine_to_query_udf(query_vec: list[float]):
    """Returns a pandas UDF computing cosine(row_vec, query_vec) in a
    single NumPy matmul per Arrow batch."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = np.linalg.norm(q) or 1.0

    @pandas_udf("double")
    def _cos(col: pd.Series) -> pd.Series:
        m = np.stack(col.map(lambda v: np.asarray(v, dtype=np.float64)))
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        return pd.Series((m @ q) / (norms * qn))

    return _cos


def brute_force_topk_pandas(
    df: DataFrame,
    query_vec: list[float],
    *,
    id_col: str,
    vec_col: str,
    k: int = 10,
) -> DataFrame:
    """(id, cosine) top-k via the vectorized pandas path."""
    cos = cosine_to_query_udf(query_vec)
    return (
        df.select(
            F.col(id_col).alias("id"), F.round(cos(F.col(vec_col)), 6).alias("cosine")
        )
        .orderBy(F.desc("cosine"), F.asc("id"))
        .limit(k)
    )
