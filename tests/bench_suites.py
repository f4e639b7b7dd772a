"""Dev tool: run a SUBSET of bench.py's suites with per-query dumps.

Round-12 verdict task 1 needs same-generation A/B runs of individual
suites (r6_ops / r6b_ops) to attribute the r10->r11 suite drift
without paying the full ~10-minute bench. This reuses bench.py's own
suite lists, warm-up, and median-of-N machinery so numbers are
directly comparable to BENCH_LOCAL_r*.json records carrying the same
``testdata_generation`` stamp.

Usage:
    python tests/bench_suites.py r6_ops r6b_ops [--repeats 3] \
        [--out /tmp/ab.json]

Output: one JSON line per suite with per-query medians + the suite
total + the generation stamp.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

import bench  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("suites", nargs="+", help="suite names, e.g. r6_ops r6b_ops")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--out", default=None)
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    suite_map = {
        "headline": bench.HEADLINE,
        "curation": bench.CURATION,
        "r3_ops": bench.R3_OPS,
        "r4_ops": bench.R4_OPS,
        "r4b_ops": bench.R4B_OPS,
        "r5_ops": bench.R5_OPS,
        "r6_ops": bench.R6_OPS,
        "r6b_ops": bench.R6B_OPS,
        "r6c_ops": bench.R6C_OPS,
        "r6d_ops": bench.R6D_OPS,
        "r7_ops": bench.R7_OPS,
        "r8_ops": bench.R8_OPS,
        "r9_ops": bench.R9_OPS,
    }
    unknown = [s for s in args.suites if s not in suite_map]
    if unknown:
        raise SystemExit(f"unknown suites: {unknown}; pick from {sorted(suite_map)}")

    from big_data_analysis_of_airline_data_set_spark.plans import all_queries
    from big_data_analysis_of_airline_data_set_spark.plans.events_queries import (
        ensure_events_landed,
    )
    from big_data_analysis_of_airline_data_set_spark.session import get_session

    # Same streaming-drain sink policy as bench.py main (default noop
    # from r12; SPARK_GRAFT_STREAM_SINK=memory for continuity runs).
    from big_data_analysis_of_airline_data_set_spark.streaming import jobs as _sjobs

    stream_sink = os.environ.get("SPARK_GRAFT_STREAM_SINK", "noop")
    _sjobs.DRAIN_SINK = stream_sink

    generation = bench._testdata_generation(args.sf_dir)
    spark = get_session("bench-suites")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    ensure_events_landed(spark, args.sf_dir)

    records = []
    for suite in args.suites:
        names = suite_map[suite]
        bench._warm(specs, spark, names, args.sf_dir)
        t_all0, t_st0 = bench._cpu_times()
        timings, total = bench._run_suite(
            specs, spark, names, args.sf_dir, args.repeats, suite
        )
        t_all1, t_st1 = bench._cpu_times()
        rec = {
            "suite": suite,
            "total": total,
            "queries": timings,
            "repeats": args.repeats,
            "sf_dir": args.sf_dir,
            "testdata_generation": generation,
            "steal_pct": round(
                100.0 * (t_st1 - t_st0) / max(1, t_all1 - t_all0), 2
            ),
        }
        records.append(rec)
        print(json.dumps(rec))

    if args.out:
        with open(args.out, "a") as f:
            for rec in records:
                f.write(json.dumps(rec) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
