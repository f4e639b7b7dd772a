"""Dev tool: same-session A/B of the round-12 iterative-loop
optimizations. Each operator is timed with the optimization ON
(catalog default) and OFF (`broadcast_nodes_max=0`), interleaved reps, medians — so host steal hits
both arms equally. Inputs are the catalog queries' own builders, at
the bench scale factor.

Usage:
    python tests/ab_loops.py [--sf-dir /root/testdata/sf0.1] [--repeats 3]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from pyspark.sql import functions as F  # noqa: E402

import bench  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument(
        "--only", default=None, help="comma-separated case names to run"
    )
    args = ap.parse_args()

    from big_data_analysis_of_airline_data_set_spark.operators.graph import (
        bfs_distances,
        flatten_hierarchy,
        label_propagation,
    )
    from big_data_analysis_of_airline_data_set_spark.plans import (
        analytics_ops,
        patterns,
    )
    from big_data_analysis_of_airline_data_set_spark.session import get_session
    from big_data_analysis_of_airline_data_set_spark.sources.readers import (
        read_testdata_table,
    )

    spark = get_session("ab-loops")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    sf = args.sf_dir

    def _noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    def run_lpa(on: bool) -> None:
        e = patterns._co_supplier_edges(spark, sf, analytics_ops._LPA_PCT)
        labels = label_propagation(
            e, rounds=analytics_ops._LPA_ROUNDS,
            broadcast_nodes_max=200_000 if on else 0,
        )
        _noop(
            labels.groupBy(F.col("label").alias("community")).agg(
                F.count(F.lit(1)).cast("long").alias("n_members")
            )
        )

    def run_bfs(on: bool) -> None:
        s = read_testdata_table(spark, sf, "supplier")
        edges = analytics_ops._trading_edges(spark, sf)
        seeds = s.filter(F.col("s_nationkey") == 0).select(
            F.concat(F.lit("s:"), F.col("s_suppkey").cast("string")).alias(
                "vertex"
            )
        )
        dist = bfs_distances(
            edges, seeds, max_hops=analytics_ops._BFS_HOPS,
            broadcast_nodes_max=200_000 if on else 0,
        )
        _noop(
            dist.groupBy("dist").agg(
                F.sum(
                    F.when(F.col("vertex").startswith("c:"), 1).otherwise(0)
                ).cast("long").alias("n_customers"),
                F.sum(
                    F.when(F.col("vertex").startswith("s:"), 1).otherwise(0)
                ).cast("long").alias("n_suppliers"),
            )
        )

    def run_flatten(on: bool) -> None:
        s = read_testdata_table(spark, sf, "supplier").select(
            F.col("s_suppkey").alias("node"),
            F.when(
                F.col("s_suppkey") > 0, F.expr("(s_suppkey - 1) div 2")
            ).alias("parent"),
        )
        _noop(
            flatten_hierarchy(
                s, max_depth=64, broadcast_nodes_max=200_000 if on else 0
            )
        )

    cases = {
        "label_propagation": run_lpa,
        "bfs_distances": run_bfs,
        "flatten_hierarchy": run_flatten,
    }
    if args.only:
        keep = set(args.only.split(","))
        cases = {k: v for k, v in cases.items() if k in keep}

    t_all0, t_st0 = bench._cpu_times()
    out: dict[str, dict] = {}
    for name, fn in cases.items():
        fn(True)  # one unmeasured warm rep per arm
        fn(False)
        on_s: list[float] = []
        off_s: list[float] = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            fn(True)
            on_s.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            fn(False)
            off_s.append(time.perf_counter() - t0)
        out[name] = {
            "on_median": round(statistics.median(on_s), 3),
            "off_median": round(statistics.median(off_s), 3),
            "on_all": [round(x, 3) for x in on_s],
            "off_all": [round(x, 3) for x in off_s],
        }
        print(f"# {name}: {out[name]}", file=sys.stderr, flush=True)
    t_all1, t_st1 = bench._cpu_times()
    print(
        json.dumps(
            {
                "ab": out,
                "steal_pct": round(
                    100.0 * (t_st1 - t_st0) / max(1, t_all1 - t_all0), 2
                ),
                "sf_dir": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
