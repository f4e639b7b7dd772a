"""Dev tool: explain('formatted') evidence for the ROUND-12 iterative-
loop optimizations, where the catalog query's returned frame hides the
per-iteration plan (the loops materialize internally through eager
checkpoints).

One before/after pair per operator, honest to what executes:

- label_propagation / bfs_distances / flatten_hierarchy: ONE
  representative round reconstructed from the same building blocks the
  operator uses (same joins, same gate), captured in the shipped
  regime and the pre-round-12 one. The reconstruction is line-for-line
  the loop body (see the operator source; tests pin that both regimes
  produce identical results).

Usage:
    python tests/capture_loop_plans.py --out-dir plans/r12 \
        [--sf-dir /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from pyspark.sql import functions as F  # noqa: E402


def _explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def _write(out_dir: str, name: str, text: str) -> None:
    path = os.path.join(out_dir, f"{name}.txt")
    with open(path, "w") as f:
        f.write(text)
    print(f"wrote {path} ({len(text)} bytes)", file=sys.stderr)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)

    from big_data_analysis_of_airline_data_set_spark.operators.graph import (
        _iteration_shuffle_width,
        _node_frame_bc,
    )
    from big_data_analysis_of_airline_data_set_spark.session import get_session
    from big_data_analysis_of_airline_data_set_spark.sources.readers import (
        read_testdata_table,
    )

    spark = get_session("capture-loop-plans")
    spark.sparkContext.setLogLevel("ERROR")

    # --- label_propagation: one representative round over the CATALOG
    # co-supplier graph (plans/patterns session-cached builder) --------
    from big_data_analysis_of_airline_data_set_spark.plans import (
        analytics_ops,
        patterns,
    )

    co = patterns._co_supplier_edges(spark, args.sf_dir, analytics_ops._LPA_PCT)
    symlp = (
        co.select(F.col("u").alias("_s"), F.col("v").alias("_d"))
        .union(co.select(F.col("v").alias("_s"), F.col("u").alias("_d")))
        .distinct()
        .repartition(F.col("_d"))
    )
    # materialize the edge cache BEFORE any narrowed scope, exactly as
    # the operator does (its labels checkpoint computes sym first)
    symlp = symlp.persist()
    symlp.count()
    lab = (
        symlp.select(F.col("_s").alias("vertex"))
        .distinct()
        .select("vertex", F.col("vertex").alias("label"))
        .localCheckpoint(eager=True)
    )
    nl = lab.count()

    def lpa_round(bc):
        cnt = (
            symlp.join(bc(lab), symlp["_d"] == lab["vertex"])
            .groupBy(F.col("_s").alias("vertex_"), "label")
            .agg(F.count(F.lit(1)).alias("n"))
            .withColumnRenamed("vertex_", "vertex")
        )
        return (
            cnt.groupBy("vertex")
            .agg(
                F.min(
                    F.struct((-F.col("n")).alias("_negn"), F.col("label"))
                ).alias("_top")
            )
            .select("vertex", F.col("_top.label").alias("label"))
        )

    # BEFORE = the pre-round-12 plan: broadcast gate (r8) WITHOUT the
    # width scope; AFTER adds only the narrowed iteration width.
    _write(
        args.out_dir,
        "graph_label_propagation_round_before",
        _explain(lpa_round(_node_frame_bc(nl, 200_000))),
    )
    with _iteration_shuffle_width(spark, nl):
        _write(
            args.out_dir,
            "graph_label_propagation_round_after",
            _explain(lpa_round(_node_frame_bc(nl, 200_000))),
        )

    # --- bfs_distances: one representative level over the CATALOG
    # trading graph with the catalog's nation-0 supplier seeds ----------
    sup = read_testdata_table(spark, args.sf_dir, "supplier")
    tre = analytics_ops._trading_edges(spark, args.sf_dir)
    symb = (
        tre.select(F.col("u").alias("_s"), F.col("v").alias("_d"))
        .union(tre.select(F.col("v").alias("_s"), F.col("u").alias("_d")))
        .distinct()
        .repartition(F.col("_s"))
    )
    symb = symb.persist()
    symb.count()  # operator twin: n_nodes distinct count materializes sym
    frontier = (
        sup.filter(F.col("s_nationkey") == 0)
        .select(
            F.concat(F.lit("s:"), F.col("s_suppkey").cast("string")).alias(
                "vertex"
            )
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    nf = frontier.count()

    def bfs_level(bc):
        return (
            symb.join(
                bc(frontier.withColumnRenamed("vertex", "_s")), "_s", "left_semi"
            )
            .select(F.col("_d").alias("vertex"))
            .distinct()
            .join(bc(frontier), "vertex", "left_anti")
        )

    _write(
        args.out_dir,
        "graph_bfs_distances_level_before",
        _explain(bfs_level(_node_frame_bc(nf, 200_000))),
    )
    with _iteration_shuffle_width(spark, nl):
        _write(
            args.out_dir,
            "graph_bfs_distances_level_after",
            _explain(bfs_level(_node_frame_bc(nf, 200_000))),
        )

    # --- flatten_hierarchy: one pointer-doubling round over the CATALOG
    # supplier heap forest ----------------------------------------------
    state = (
        read_testdata_table(spark, args.sf_dir, "supplier")
        .select(
            F.col("s_suppkey").alias("node"),
            F.coalesce(
                F.when(
                    F.col("s_suppkey") > 0, F.expr("(s_suppkey - 1) div 2")
                ),
                F.col("s_suppkey"),
            ).alias("anc"),
            F.when(F.col("s_suppkey") > 0, F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("depth"),
        )
        .localCheckpoint(eager=True)
    )
    s2 = state.select(
        F.col("node").alias("_n2"),
        F.col("anc").alias("_a2"),
        F.col("depth").alias("_d2"),
    )

    def doubling_round(bc):
        return state.join(bc(s2), state["anc"] == s2["_n2"], "left").select(
            "node",
            F.coalesce(F.col("_a2"), F.col("anc")).alias("anc"),
            (F.col("depth") + F.coalesce(F.col("_d2"), F.lit(0))).alias("depth"),
        )

    ns = state.count()
    _write(
        args.out_dir,
        "graph_hierarchy_flatten_round_before",
        _explain(doubling_round(lambda df: df)),
    )
    _write(
        args.out_dir,
        "graph_hierarchy_flatten_round_after",
        _explain(doubling_round(_node_frame_bc(ns, 200_000))),
    )

    spark.stop()


if __name__ == "__main__":
    main()
