"""Dev tool: same-session A/B of streaming-drain fixed-cost knobs
(round-12 verdict item 4): state-store provider (RocksDB vs the default
HDFS-backed store), and checkpoint-dir placement (system temp on ext4
vs /dev/shm — the per-batch offset/commit WAL fsyncs and the HDFS-
backed store writes per-partition delta files per batch, so short
drains time the filesystem as much as the operator).

Drains run through the noop sink (bench methodology); arms interleave
per repeat so steal hits all equally. None of the knobs can change
values (state-store backend and checkpoint placement are
implementation, and the oracle/memory-sink path never sees them).

Usage:
    python tests/ab_stream.py [--sf-dir ...] [--repeats 3]
        [--queries events_tumbling_stream,...] [--arms base,shm,rocks]
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

_ROCKS = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)

QUERIES = [
    "events_tumbling_stream",
    "events_interval_join_stream",
    "events_upsert_sink_stream",
]

ARMS = ["base", "shm", "rocks", "rocks_shm"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--queries", default=",".join(QUERIES))
    ap.add_argument("--arms", default=",".join(ARMS))
    args = ap.parse_args()
    names = args.queries.split(",")
    arms = [a for a in ARMS if a in set(args.arms.split(","))]

    from big_data_analysis_of_airline_data_set_spark.plans import all_queries
    from big_data_analysis_of_airline_data_set_spark.plans.events_queries import (
        ensure_events_landed,
    )
    from big_data_analysis_of_airline_data_set_spark.session import get_session
    from big_data_analysis_of_airline_data_set_spark.streaming import jobs as _sjobs

    _sjobs.DRAIN_SINK = "noop"
    spark = get_session("ab-stream")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    ensure_events_landed(spark, args.sf_dir)
    specs = all_queries()

    prov_key = "spark.sql.streaming.stateStore.providerClass"
    default_prov = spark.conf.get(prov_key)

    def set_arm(arm: str) -> None:
        _sjobs.CKPT_BASE = "/dev/shm" if arm.endswith("shm") else None
        spark.conf.set(
            prov_key, _ROCKS if arm.startswith("rocks") else default_prov
        )

    # warm pass per arm (unmeasured): JIT, parquet reader classes,
    # RocksDB native lib load
    for arm in arms:
        set_arm(arm)
        for name in names:
            bench._materialize(specs[name].fn(spark, args.sf_dir))

    t_all0, t_st0 = bench._cpu_times()
    samples = {a: {n: [] for n in names} for a in arms}
    for _ in range(args.repeats):
        for arm in arms:
            set_arm(arm)
            for name in names:
                t0 = time.perf_counter()
                bench._materialize(specs[name].fn(spark, args.sf_dir))
                samples[arm][name].append(time.perf_counter() - t0)
    set_arm("base")
    t_all1, t_st1 = bench._cpu_times()
    out = {
        arm: {
            "total": round(sum(statistics.median(t) for t in per.values()), 3),
            "queries": {n: round(statistics.median(t), 3) for n, t in per.items()},
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
