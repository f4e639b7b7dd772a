"""Dev tool: same-session A/B of the round-13 operator candidates.

Each case is a closure fn(on) over the catalog query's own inputs at
the bench scale factor; arms run interleaved per repeat (steal hits
both equally), medians decide. Where the arms must be value-identical
(sketch pre_distinct), the first pair of calls collects and compares
results BEFORE any timing — a fast wrong arm must fail loudly.

Cases:
  kmv          — sketches.kmv pre_distinct off/on (sketch_kmv_distinct)
  hll          — sketches.hll pre_distinct off/on (sketch_hll_distinct)
  hll_setops   — hll_set_ops pre_distinct off/on (sketch_hll_set_ops)
  kmv_join     — kmv_sketch pre_distinct off/on over the union input
                 (sketch_kmv_join_cardinality's sketch leg)
  pr_barrier   — plain pagerank barrier_every 4 (off) vs 8 (on): 8 never
                 fires in the 5-iteration catalog query, removing the
                 mid-loop count barrier (values unaffected by cadence)
  build_order  — the edge-build shapes: distinct→repartition (off, two
                 exchanges) vs repartition→distinct (on, one exchange),
                 inline on the pagerank catalog input

Usage:
    python tests/ab_r13.py [--sf-dir /root/testdata/sf0.1] [--repeats 3]
        [--only kmv,hll]
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
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    from big_data_analysis_of_airline_data_set_spark.operators.graph import (
        pagerank_scope,
    )
    from big_data_analysis_of_airline_data_set_spark.plans import patterns
    from big_data_analysis_of_airline_data_set_spark.session import get_session
    from big_data_analysis_of_airline_data_set_spark.sketches.hll import (
        hll_distinct_by_group,
        hll_set_ops,
    )
    from big_data_analysis_of_airline_data_set_spark.sketches.kmv import (
        kmv_distinct_by_group,
        kmv_sketch,
    )
    from big_data_analysis_of_airline_data_set_spark.sources.readers import (
        read_testdata_table,
    )

    spark = get_session("ab-r13")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    sf = args.sf_dir

    def _noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    def _li():
        return read_testdata_table(spark, sf, "lineitem")

    def run_kmv(on: bool):
        return kmv_distinct_by_group(
            _li(), group_col="l_returnflag", value_col="l_orderkey",
            k=96, pre_distinct=on,
        )

    def run_hll(on: bool):
        return hll_distinct_by_group(
            _li(), group_col="l_returnflag", value_col="l_orderkey",
            p=8, pre_distinct=on,
        )

    def run_hll_setops(on: bool):
        return hll_set_ops(
            _li(), group_col="l_returnflag", value_col="l_orderkey",
            p=8, pre_distinct=on,
        )

    def run_kmv_join(on: bool):
        o = read_testdata_table(spark, sf, "orders").select(
            F.lit("a").alias("g"), F.col("o_custkey").cast("string").alias("v")
        )
        c = read_testdata_table(spark, sf, "customer").select(
            F.lit("b").alias("g"), F.col("c_custkey").cast("string").alias("v")
        )
        return kmv_sketch(
            o.union(c), group_col="g", value_col="v", k=96, pre_distinct=on
        )

    def _pr_edges():
        li = _li()
        fwd = li.select(
            F.concat(F.lit("p"), F.col("l_partkey")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
        )
        return fwd.union(
            fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )

    def run_pr_barrier(on: bool):
        with pagerank_scope(
            _pr_edges(),
            iterations=patterns._PR_ITERS,
            round_dp=patterns._PR_DP,
            barrier_every=8 if on else 4,
        ) as ranks:
            rows = (
                ranks.select("node", F.round("rank", 9).alias("rank"))
                .orderBy(F.desc("rank"), F.asc("node"))
                .limit(20)
                .collect()
            )
        return spark.createDataFrame(rows, "node string, rank double")

    def run_build_order(on: bool):
        edges = _pr_edges()
        if on:
            e = edges.repartition(F.col("src")).distinct().persist()
        else:
            e = edges.distinct().repartition(F.col("src")).persist()
        _noop(e)
        e.unpersist()
        return None

    # value-comparable cases return a DataFrame; action cases handle
    # their own materialization and return None
    cases = {
        "kmv": run_kmv,
        "hll": run_hll,
        "hll_setops": run_hll_setops,
        "kmv_join": run_kmv_join,
        "pr_barrier": run_pr_barrier,
        "build_order": run_build_order,
    }
    if args.only:
        keep = set(args.only.split(","))
        cases = {k: v for k, v in cases.items() if k in keep}

    t_all0, t_st0 = bench._cpu_times()
    out: dict[str, dict] = {}
    for name, fn in cases.items():
        # identity check + warm-up, one unmeasured rep per arm
        a = fn(True)
        b = fn(False)
        if a is not None:
            ra = sorted(map(tuple, a.collect()))
            rb = sorted(map(tuple, b.collect()))
            assert ra == rb, f"{name}: arms diverged ({len(ra)} vs {len(rb)} rows)"
        on_s: list[float] = []
        off_s: list[float] = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            r = fn(True)
            if r is not None:
                _noop(r)
            on_s.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            r = fn(False)
            if r is not None:
                _noop(r)
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
