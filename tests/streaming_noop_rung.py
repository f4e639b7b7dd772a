"""Streaming state-growth ladder through a NOOP sink (dev tool).

The catalog's streaming drains write to in-driver MEMORY tables so the
DuckDB oracle can read the results — correct for the correctness
harness, but at 100× event volume the driver-side collection is the
binding constraint long before the state store is
(BASELINE.md round-11 "x100 diagnosis CORRECTED"). This tool runs the
two state-heaviest shapes — the watermarked stream-stream interval
join and the session-window aggregation — through Spark's noop
streaming sink instead, so what's measured is scan + stateful operator
+ state-store commits only: the production posture, where sinks are
distributed writers.

Measured ladder (2026-08-16, local[32], 8 stateful shuffle
partitions, availableNow):

  rung   events      join state peak   session state peak   join/session wall
  x1        100k          39,947             99,233          (seconds)
  x10         1M         399,470            992,330          (seconds)
  x100       10M       3,994,700          9,923,300          18.7 s / 34.2 s

State grows EXACTLY ×10 per decade at both operators.

Usage:
    PYTHONPATH=/root/repo python3 tests/streaming_noop_rung.py [x1 x10 x100]

Rung corpora are built on demand by tests/scale_stress.py's
``_events_xn`` (key-shifted replication — see its docstring for why
unshifted replication would square the join matches).
"""

from __future__ import annotations

import os
import sys
import tempfile
import time


def _drain_noop(result, *, shuffle_partitions: int = 8):
    """availableNow drain to the noop sink; returns (wall_s,
    state_rows_peak, micro_batches)."""
    spark = result.sparkSession
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    # Keep every progress event so the state peak covers ALL
    # micro-batches, not just the last ~100 (round-12 advice).
    saved_prog = spark.conf.get(
        "spark.sql.streaming.numRecentProgressUpdates", "100"
    )
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "100000")
    try:
        t0 = time.time()
        q = (
            result.writeStream.format("noop")
            .outputMode("append")
            .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt-noop-"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        wall = round(time.time() - t0, 2)
        prog = list(q.recentProgress)
        peak = max(
            (
                op.get("numRowsTotal", 0)
                for p in prog
                for op in p.get("stateOperators", [])
            ),
            default=None,
        )
        return wall, peak, len(prog)
    finally:
        spark.conf.set(
            "spark.sql.streaming.numRecentProgressUpdates", saved_prog
        )
        spark.conf.set("spark.sql.shuffle.partitions", saved)


def run(spark, rungs: list[str]):
    from pyspark.sql import functions as F

    import scale_stress as ss
    from big_data_analysis_of_airline_data_set_spark.streaming.jobs import (
        events_stream_reader,
    )

    rows = []
    for rung in rungs:
        d = os.path.join(ss.STRESS_DIR, f"events_{rung}")
        ss._events_xn(spark, d, int(rung[1:]))
        events = os.path.join(d, "events.parquet")

        def side(event_type, id_alias, ts_alias, user_alias):
            return (
                events_stream_reader(spark, events, max_files_per_trigger=None)
                .filter(F.col("event_type") == event_type)
                .select(
                    F.col("user_id").alias(user_alias),
                    F.col("event_id").alias(id_alias),
                    F.col("ts").alias(ts_alias),
                )
                .withWatermark(ts_alias, "30 minutes")
            )

        p = side("purchase", "purchase_id", "p_ts", "user_id")
        c = side("click", "click_id", "c_ts", "c_user")
        joined = p.join(
            c,
            (F.col("user_id") == F.col("c_user"))
            & (F.col("c_ts") <= F.col("p_ts"))
            & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 10 MINUTES")),
        ).select("user_id", "purchase_id", "click_id")
        rows.append((rung, "interval_join", *_drain_noop(joined)))
        print("noop_rung", rows[-1], flush=True)

        stream = events_stream_reader(spark, events, max_files_per_trigger=None)
        sess = (
            stream.withWatermark("ts", "30 minutes")
            .groupBy("user_id", F.session_window("ts", "5 minutes"))
            .agg(F.count(F.lit(1)).alias("n_events"))
        )
        rows.append((rung, "session_window", *_drain_noop(sess)))
        print("noop_rung", rows[-1], flush=True)
    return rows


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from big_data_analysis_of_airline_data_set_spark.session import get_session

    spark = get_session()
    spark.sparkContext.setLogLevel("ERROR")
    run(spark, sys.argv[1:] or ["x1", "x10"])
    spark.stop()


if __name__ == "__main__":
    main()
