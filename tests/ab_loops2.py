"""Dev tool: 3-arm refinement of tests/ab_loops.py — isolates the
round-12 WIDTH scope from the (pre-existing, r8) broadcast gate by
monkeypatching `_iteration_shuffle_width` to a no-op in the middle arm.

Arms per operator:
  full  — broadcast gate + width scope (round-12 default)
  bc    — broadcast gate only (width patched out; LPA/BFS pre-r12 plan)
  none  — neither (broadcast_nodes_max=0)

Usage:
    python tests/ab_loops2.py [--sf-dir /root/testdata/sf0.1] [--repeats 3]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time
from contextlib import contextmanager

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from pyspark.sql import functions as F  # noqa: E402

import bench  # noqa: E402


@contextmanager
def _width_patched_out():
    import big_data_analysis_of_airline_data_set_spark.operators.graph as g

    saved = g._iteration_shuffle_width

    @contextmanager
    def _noop_scope(spark, n):
        yield

    g._iteration_shuffle_width = _noop_scope
    try:
        yield
    finally:
        g._iteration_shuffle_width = saved


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    from big_data_analysis_of_airline_data_set_spark.operators.graph import (
        bfs_distances,
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

    spark = get_session("ab-loops2")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    sf = args.sf_dir

    def _noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    def run_lpa(gate: int) -> None:
        e = patterns._co_supplier_edges(spark, sf, analytics_ops._LPA_PCT)
        labels = label_propagation(
            e, rounds=analytics_ops._LPA_ROUNDS, broadcast_nodes_max=gate
        )
        _noop(
            labels.groupBy(F.col("label").alias("community")).agg(
                F.count(F.lit(1)).cast("long").alias("n_members")
            )
        )

    def run_bfs(gate: int) -> None:
        s = read_testdata_table(spark, sf, "supplier")
        edges = analytics_ops._trading_edges(spark, sf)
        seeds = s.filter(F.col("s_nationkey") == 0).select(
            F.concat(F.lit("s:"), F.col("s_suppkey").cast("string")).alias(
                "vertex"
            )
        )
        dist = bfs_distances(
            edges, seeds, max_hops=analytics_ops._BFS_HOPS,
            broadcast_nodes_max=gate,
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

    def arms(fn, gate_on):
        def full():
            fn(gate_on)

        def bc_only():
            with _width_patched_out():
                fn(gate_on)

        def none():
            fn(0)

        return {"full": full, "bc": bc_only, "none": none}

    cases = {
        "label_propagation": arms(run_lpa, 200_000),
        "bfs_distances": arms(run_bfs, 200_000),
    }
    if args.only:
        keep = set(args.only.split(","))
        cases = {k: v for k, v in cases.items() if k in keep}

    t_all0, t_st0 = bench._cpu_times()
    out: dict[str, dict] = {}
    for name, arm_fns in cases.items():
        for f in arm_fns.values():  # one unmeasured warm rep per arm
            f()
        samples: dict[str, list[float]] = {a: [] for a in arm_fns}
        for _ in range(args.repeats):
            for arm, f in arm_fns.items():
                t0 = time.perf_counter()
                f()
                samples[arm].append(time.perf_counter() - t0)
        out[name] = {
            arm: {
                "median": round(statistics.median(ts), 3),
                "all": [round(x, 3) for x in ts],
            }
            for arm, ts in samples.items()
        }
        print(f"# {name}: {out[name]}", file=sys.stderr, flush=True)
    t_all1, t_st1 = bench._cpu_times()
    print(
        json.dumps(
            {
                "ab3": out,
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
