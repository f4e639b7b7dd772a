"""Dev tool: write ``df.explain('formatted')`` for catalog queries to
files — the round-12 optimization deliverable (plans/r12/<q>_{before,
after}.txt). Driver-side only: plans are analyzed, never executed,
except for queries that materialize internally (iterative loops),
whose returned frame is a local/cached result — those are captured
anyway (the per-iteration shapes live in the operator modules and are
documented in OPTIMIZATION_r12.md).

Usage:
    python tests/capture_plans.py --out-dir plans/r12 --suffix _after \
        [--sf-dir /root/testdata/sf0.01] name1 name2 ...
"""

from __future__ import annotations

import argparse
import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--suffix", default="")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    from big_data_analysis_of_airline_data_set_spark.plans import all_queries
    from big_data_analysis_of_airline_data_set_spark.plans.events_queries import (
        ensure_events_landed,
    )
    from big_data_analysis_of_airline_data_set_spark.session import get_session

    os.makedirs(args.out_dir, exist_ok=True)
    spark = get_session("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    ensure_events_landed(spark, args.sf_dir)
    specs = all_queries()
    for name in args.queries:
        df = specs[name].fn(spark, args.sf_dir)
        text = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(args.out_dir, f"{name}{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"wrote {path} ({len(text)} bytes)", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
