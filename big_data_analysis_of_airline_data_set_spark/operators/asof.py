"""As-of join — an operator Spark lacks natively.

Two implementations with identical semantics (each left row matches
the single right row with the largest right_ts <= left_ts per key;
inner behavior — left rows with no prior right row drop):

- ``as_of_join``: union + window (scale path). Tag both sides, union,
  one window pass per key ordered by (ts, side) carrying the last seen
  right payload forward. ONE shuffle on the key, no range explosion,
  state bounded by the window frame — this survives 100 TB.
- ``as_of_join_pandas``: ``applyInPandas`` + ``pd.merge_asof`` per key
  group (the guide's grouped-map recipe) — simpler, Arrow-batched, but
  shuffles whole groups into pandas; used to cross-check the window
  implementation.

Right side should be pre-deduplicated to one row per (key, ts) for
deterministic ties.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    left_cols: list[str],
    right_cols: list[str],
) -> DataFrame:
    """Columns out: on, left_ts, left_cols..., right_cols... (right_cols
    renamed with ``r_`` prefix; right_ts included as ``r_ts``)."""
    l_tag = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),  # left AFTER right on ties → sees equal-ts right rows
        *[F.col(c) for c in left_cols],
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"r_{c}") for c in right_cols],
    )
    r_tag = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left_cols],
        *[F.col(c).alias(f"r_{c}") for c in right_cols],
    )
    unioned = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "_k",
        "_ts",
        "_side",
        *left_cols,
        F.last(F.when(F.col("_side") == 0, F.col("_ts")), ignorenulls=True)
        .over(w)
        .alias("r_ts"),
        *[
            F.last(F.when(F.col("_side") == 0, F.col(f"r_{c}")), ignorenulls=True)
            .over(w)
            .alias(f"r_{c}")
            for c in right_cols
        ],
    )
    return (
        carried.filter((F.col("_side") == 1) & F.col("r_ts").isNotNull())
        .select(
            F.col("_k").alias(on), F.col("_ts").alias(left_ts), *left_cols,
            "r_ts", *[f"r_{c}" for c in right_cols],
        )
    )


def as_of_join_pandas(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    left_cols: list[str],
    right_cols: list[str],
) -> DataFrame:
    """Same contract via applyInPandas + pd.merge_asof per key group."""
    import pandas as pd

    l = left.select(
        F.col(on).alias("_k"), F.col(left_ts).alias("_ts"), *left_cols
    ).withColumn("_side", F.lit(1))
    r = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        *[F.col(c).alias(f"r_{c}") for c in right_cols],
    ).withColumn("_side", F.lit(0))
    both = l.unionByName(r, allowMissingColumns=True)

    out_fields = (
        [f"_k {dict(l.dtypes)['_k']}", "_ts timestamp"]
        + [f"{c} {dict(left.dtypes)[c]}" for c in left_cols]
        + ["r_ts timestamp"]
        + [f"r_{c} {dict(right.dtypes)[c]}" for c in right_cols]
    )
    schema = ", ".join(out_fields)

    def merge(key, pdf: pd.DataFrame) -> pd.DataFrame:
        lg = pdf[pdf["_side"] == 1].sort_values("_ts")
        rg = pdf[pdf["_side"] == 0].sort_values("_ts")
        if lg.empty or rg.empty:
            return pd.DataFrame(columns=[f.split()[0] for f in out_fields])
        rg = rg.rename(columns={"_ts": "r_ts"})
        merged = pd.merge_asof(
            lg[["_k", "_ts", *left_cols]],
            rg[["r_ts", *[f"r_{c}" for c in right_cols]]],
            left_on="_ts",
            right_on="r_ts",
            direction="backward",
        )
        return merged.dropna(subset=["r_ts"])

    result = both.groupBy("_k").applyInPandas(merge, schema=schema)
    return result.select(
        F.col("_k").alias(on), F.col("_ts").alias(left_ts), *left_cols,
        "r_ts", *[f"r_{c}" for c in right_cols],
    )
