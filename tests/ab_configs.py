"""Dev tool: same-session A/B of runtime-settable session configs over
a representative query mix (guide §2.2 / §3.1 / §9 candidates):

  base — the shipped session defaults
  aqe  — spark.sql.adaptive.coalescePartitions.parallelismFirst=false
         (partitions sized by advisoryPartitionSizeInBytes, not core
         count — the guide's scale posture; locally it may cut task
         overhead on small shuffles or serialize mid-size CPU work)
  shj  — spark.sql.join.preferSortMergeJoin=false (planner may pick
         shuffled-hash joins when its size conditions fit)

Arms run interleaved per repeat so steal hits all equally; conf is
restored between arms. Results decide whether either conf ships in
session.py (parameterised, with the production justification) or is
rejected with numbers.

Usage:
    python tests/ab_configs.py [--sf-dir ...] [--repeats 2] [--mix heavy|headline]
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

import bench  # noqa: E402

HEAVY = [
    "dedup_minhash_lsh",
    "sketch_kmv_distinct",
    "feature_winsorize_exact",
    "stats_mad_by_group",
    "join_bucketed_colocated",
    "tpch_q21_style",
    "basket_frequent_pairs",
    "join_heavy_hitters_cm",
    "dedup_span_scrub",
    "curation_dsir_resample",
    "tpch_q9_style",
    "join_bloom_prefiltered",
]

ARMS: dict[str, dict[str, str]] = {
    "base": {},
    "aqe": {"spark.sql.adaptive.coalescePartitions.parallelismFirst": "false"},
    # "shj" (preferSortMergeJoin=false) measured and REJECTED: first
    # run showed shuffled-hash picks blowing up join_heavy_hitters_cm
    # 4.8->16.0 s and dedup_span_scrub 3.6->17.8 s — the SMJ default
    # was right for this workload. Kept here as a comment, not an arm.
    # Round-13: spark.sql.files.openCostInBytes floors the scan split
    # size at max(openCost, bytesPerCore) whenever input bytes <
    # cores × maxPartitionBytes — at bench scale the 4 MB default turns
    # a 10 MB lineitem scan into ~3 tasks, so every pre-shuffle stage
    # (md5+explode sketch builds, exact-percentile partials) runs
    # ~3-wide on a 32-core box. Irrelevant at 100 TB (bytesPerCore ≫
    # openCost); candidate values model fast page-cached storage.
    "opencost1m": {"spark.sql.files.openCostInBytes": "1048576"},
    "opencost256k": {"spark.sql.files.openCostInBytes": "262144"},
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--mix", default="heavy", choices=["heavy", "headline"])
    ap.add_argument(
        "--arms",
        default=None,
        help="comma-separated arm names to run (default: all)",
    )
    args = ap.parse_args()
    if args.arms:
        keep = set(args.arms.split(","))
        unknown = keep - set(ARMS)
        if unknown:
            raise SystemExit(f"unknown arms: {sorted(unknown)}")
        for k in list(ARMS):
            if k not in keep:
                del ARMS[k]

    from big_data_analysis_of_airline_data_set_spark.plans import all_queries
    from big_data_analysis_of_airline_data_set_spark.plans.events_queries import (
        ensure_events_landed,
    )
    from big_data_analysis_of_airline_data_set_spark.session import get_session
    from big_data_analysis_of_airline_data_set_spark.streaming import jobs as _sjobs

    _sjobs.DRAIN_SINK = "noop"
    names = HEAVY if args.mix == "heavy" else bench.HEADLINE
    spark = get_session("ab-configs")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    ensure_events_landed(spark, args.sf_dir)
    specs = all_queries()
    bench._warm(specs, spark, names, args.sf_dir)
    # one UNMEASURED pass at the timed sf so one-time session caches
    # (landed events, co-occurrence tables, bucketed tables, ANN
    # indexes) are built before any arm is sampled — without this the
    # first arm absorbs them and the comparison is ordering-biased
    for name in names:
        bench._materialize(specs[name].fn(spark, args.sf_dir))

    defaults = {
        k: spark.conf.get(k) for arm in ARMS.values() for k in arm
    }

    def set_arm(arm: str) -> None:
        for k, v in defaults.items():
            spark.conf.set(k, v)
        for k, v in ARMS[arm].items():
            spark.conf.set(k, v)

    t_all0, t_st0 = bench._cpu_times()
    samples: dict[str, dict[str, list[float]]] = {
        a: {n: [] for n in names} for a in ARMS
    }
    for _ in range(args.repeats):
        for arm in ARMS:
            set_arm(arm)
            for name in names:
                t0 = time.perf_counter()
                bench._materialize(specs[name].fn(spark, args.sf_dir))
                samples[arm][name].append(time.perf_counter() - t0)
    set_arm("base")
    t_all1, t_st1 = bench._cpu_times()
    out = {
        arm: {
            "total": round(
                sum(statistics.median(ts) for ts in per.values()), 3
            ),
            "queries": {
                n: round(statistics.median(ts), 3) for n, ts in per.items()
            },
        }
        for arm, per in samples.items()
    }
    print(
        json.dumps(
            {
                "arms": out,
                "repeats": args.repeats,
                "steal_pct": round(
                    100.0 * (t_st1 - t_st0) / max(1, t_all1 - t_all0), 2
                ),
                "sf_dir": args.sf_dir,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
