"""Expression-shape audit (dev tool, not a test) — r10 verdict item 2.

Catalyst substitutes aliases back into consumers (CollapseProject /
PushDownPredicates) and neither FilterExec nor HOF lambdas do
common-subexpression elimination, so every TEXTUAL occurrence of an
expression in the optimized plan executes per row — per ELEMENT inside
a lambda. Four r10 operators paid real multipliers for this (bloom
probe, contamination, quality scorer, bootstrap); three more were
fixed in r11 (heavy-hitter probe, stopword wordset, KMV explode).

This tool makes the hunt systematic instead of reactive: it builds
every catalog plan at sf0.001 and counts the per-row-expensive
function markers in the OPTIMIZED plan string. A high count is not
automatically a bug — k repeated cheap slices of one hash can be the
right trade (bloom's blocked layout) and counts inside a per-GROUP
projection are group-sized, not data-sized — but every count above
the report threshold should have a named justification in BASELINE.md
("Expression-shape audit" table, round 11).

Usage:  PYTHONPATH=/root/repo python3 tests/expression_audit.py [name ...]
        (no args = all lazily-built catalog entries)
"""

from __future__ import annotations

import json
import sys
import time

# Per-row-expensive functions as they print in optimizedPlan(). The
# cheap-leaf counters (array(/named_struct() are reported too: a
# CreateArray re-built per row/element was the stopword_count defect.
MARKERS = (
    "md5(",
    "xxhash64(",
    "hash(",
    "conv(",
    "sha2(",
    "regexp_replace(",
    "regexp_extract",
    "rlike",
    "split(",
    "from_json(",
    "array(",
    "lambdafunction(",
)

# Build-side prefixes/names that EXECUTE on plan build (streaming
# drains, iterative graph loops, MLlib fits, roundtrip sinks) — their
# hot paths are audited structurally at module level instead.
_EXECUTES_ON_BUILD = ("ml_", "graph_", "gold_")
_EXECUTES_SUFFIX = ("_stream",)
_SKIP_NAMES = {
    "sink_partitioned_roundtrip",
    "sink_report_csv_roundtrip",
    "sink_orc_roundtrip",
    "sink_jsonl_roundtrip",
    "flights_cleaning_job",
    "feature_selection_job",
}


def audit(names: list[str] | None = None, sf_dir: str = "/root/testdata/sf0.001"):
    from pyspark.sql import SparkSession

    from big_data_analysis_of_airline_data_set_spark.plans import all_queries

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()
    if not names:
        names = [
            n
            for n in specs
            if not n.startswith(_EXECUTES_ON_BUILD)
            and not n.endswith(_EXECUTES_SUFFIX)
            and n not in _SKIP_NAMES
        ]
    rows = []
    for n in names:
        t0 = time.time()
        try:
            plan = (
                specs[n]
                .fn(spark, sf_dir)
                ._jdf.queryExecution()
                .optimizedPlan()
                .toString()
            )
        except Exception as ex:  # noqa: BLE001 — report, keep sweeping
            rows.append({"query": n, "error": f"{type(ex).__name__}: {ex}"[:120]})
            continue
        counts = {m: plan.count(m) for m in MARKERS if plan.count(m)}
        rows.append(
            {
                "query": n,
                "build_s": round(time.time() - t0, 2),
                "expensive": sum(
                    v for m, v in counts.items() if m not in ("array(", "lambdafunction(")
                ),
                **counts,
            }
        )
    spark.stop()
    return rows


def main() -> None:
    # --out <path>: also write the rows as a jsonl artifact so the
    # per-round audit record (docs/audit_r<N>.jsonl) is produced
    # mechanically by the tool instead of hand-assembled (round-11
    # verdict hygiene item: r11's artifact was committed empty).
    args = sys.argv[1:]
    out_path = None
    if "--out" in args:
        i = args.index("--out")
        out_path = args[i + 1]
        args = args[:i] + args[i + 2 :]
    rows = audit(args or None)
    rows.sort(key=lambda r: -r.get("expensive", 0))
    lines = [json.dumps(r) for r in rows]
    for line in lines:
        print(line, flush=True)
    if out_path:
        with open(out_path, "w") as f:
            f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
