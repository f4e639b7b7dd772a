"""Exact deduplication — hash-groupBy on a content fingerprint.

Scale shape: ONE shuffle on a 32-hex-char key (never on the raw text —
at 100 TB the shuffle would move document bodies otherwise). Keeper
choice is deterministic (min id).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..text.analysis import content_fingerprint


def exact_dedup_groups(df: DataFrame, text: Column, id_col: Column) -> DataFrame:
    """(fingerprint, n_copies, keep_id): one row per distinct content,
    keep_id = smallest id among copies."""
    return (
        df.select(content_fingerprint(text).alias("fingerprint"), id_col.alias("_id"))
        .groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("_id").alias("keep_id"),
        )
    )


def drop_exact_duplicates(df: DataFrame, text_col: str) -> DataFrame:
    """Keep one row per distinct normalized content. Equivalent to
    ``dropDuplicates`` on the fingerprint but with a deterministic
    keeper (dropDuplicates keeps an arbitrary row)."""
    fp = "_fp"
    with_fp = df.withColumn(fp, content_fingerprint(F.col(text_col)))
    w_min = with_fp.groupBy(fp).agg(F.min(F.col(df.columns[0])).alias("_keep"))
    return (
        with_fp.join(w_min, fp)
        .filter(F.col(df.columns[0]) == F.col("_keep"))
        .drop(fp, "_keep")
    )
