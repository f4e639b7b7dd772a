"""Dev tool: time an arbitrary LIST of catalog queries with bench.py's
own warm-up + median-of-N machinery — the single-query-granular
companion to tests/bench_suites.py (which times whole suites).

Round-12 optimization work needs tight A/B loops on individual hot
queries (graph loops, entity resolution) without paying a whole-suite
run; numbers produced here use the same methodology as BENCH_LOCAL
records (noop materialization, interleaved repeats, median), so they
are comparable to per-query entries in records carrying the same
``testdata_generation`` stamp.

Usage:
    python tests/ab_queries.py graph_pagerank dedup_entity_resolution \
        [--repeats 3] [--sf-dir /root/testdata/sf0.1] [--out /tmp/ab.json]
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
    ap.add_argument("queries", nargs="+", help="catalog query names")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--out", default=None)
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    from big_data_analysis_of_airline_data_set_spark.plans import all_queries
    from big_data_analysis_of_airline_data_set_spark.plans.events_queries import (
        ensure_events_landed,
    )
    from big_data_analysis_of_airline_data_set_spark.session import get_session

    specs = all_queries()
    unknown = [q for q in args.queries if q not in specs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    t_all0, t_st0 = bench._cpu_times()
    spark = get_session("ab-queries")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    ensure_events_landed(spark, args.sf_dir)
    bench._warm(specs, spark, args.queries, args.sf_dir)

    timings, total = bench._run_suite(
        specs, spark, args.queries, args.sf_dir, args.repeats, "ab"
    )
    t_all1, t_st1 = bench._cpu_times()
    rec = {
        "queries": timings,
        "total": total,
        "repeats": args.repeats,
        "testdata_generation": bench._testdata_generation(args.sf_dir),
        "steal_pct": round(
            100.0 * (t_st1 - t_st0) / max(1, (t_all1 - t_all0)), 2
        ),
    }
    line = json.dumps(rec)
    print(line)
    if args.out:
        with open(args.out, "a") as f:
            f.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
