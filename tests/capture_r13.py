"""Dev tool: write the round-13 before/after plan artifacts
(plans/r13/*.txt).

"after" plans come from the live catalog entries; "before" plans are
reconstructed by disabling the round-13 knobs (pre_distinct forced
False, the exact-percentile spread patched to identity) or, for the
loop-family edge build, by building both shapes inline over the
pagerank catalog input — the loop operators materialize internally, so
the representative build-chain plan is the honest artifact (the
round-12 capture_loop_plans.py convention).

Usage:
    python tests/capture_r13.py [--sf-dir /root/testdata/sf0.1] \
        [--out-dir plans/r13]
"""

from __future__ import annotations

import argparse
import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def _explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out-dir", default="plans/r13")
    args = ap.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)

    from pyspark.sql import functions as F

    from big_data_analysis_of_airline_data_set_spark.plans import all_queries
    from big_data_analysis_of_airline_data_set_spark.session import get_session
    from big_data_analysis_of_airline_data_set_spark.sketches import kmv as kmv_mod
    from big_data_analysis_of_airline_data_set_spark.sources.readers import (
        read_testdata_table,
    )
    from big_data_analysis_of_airline_data_set_spark.stats import (
        winsorize as win_mod,
    )

    spark = get_session("capture-r13")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()

    def write(name: str, df) -> None:
        path = os.path.join(args.out_dir, f"{name}.txt")
        text = _explain(df)
        with open(path, "w") as f:
            f.write(text)
        print(f"wrote {path} ({len(text)} bytes)", file=sys.stderr)

    # --- KMV pre_distinct: after = live; before = pre_distinct forced off
    for q in ["sketch_kmv_distinct", "sketch_kmv_join_cardinality"]:
        write(f"{q}_after", specs[q].fn(spark, args.sf_dir))
    orig_sketch = kmv_mod.kmv_sketch

    def _sketch_off(df, **kw):
        kw["pre_distinct"] = False
        return orig_sketch(df, **kw)

    kmv_mod.kmv_sketch = _sketch_off
    try:
        for q in ["sketch_kmv_distinct", "sketch_kmv_join_cardinality"]:
            write(f"{q}_before", specs[q].fn(spark, args.sf_dir))
    finally:
        kmv_mod.kmv_sketch = orig_sketch

    # --- exact-percentile spread: after = live; before = spread -> identity
    for q in ["feature_winsorize_exact", "stats_mad_by_group"]:
        write(f"{q}_after", specs[q].fn(spark, args.sf_dir))
    orig_spread = win_mod.spread_rows_for_heavy_agg
    win_mod.spread_rows_for_heavy_agg = lambda df, col: df
    try:
        for q in ["feature_winsorize_exact", "stats_mad_by_group"]:
            write(f"{q}_before", specs[q].fn(spark, args.sf_dir))
    finally:
        win_mod.spread_rows_for_heavy_agg = orig_spread

    # --- loop-family edge build (pagerank catalog input): the loops
    # materialize internally, so capture the build chain both ways
    li = read_testdata_table(spark, args.sf_dir, "lineitem")
    fwd = li.select(
        F.concat(F.lit("p"), F.col("l_partkey")).alias("src"),
        F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
    )
    edges = fwd.union(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    write(
        "graph_edge_build_before",
        edges.distinct().repartition(F.col("src")),
    )
    write(
        "graph_edge_build_after",
        edges.repartition(F.col("src")).distinct(),
    )
    spark.stop()


if __name__ == "__main__":
    main()
