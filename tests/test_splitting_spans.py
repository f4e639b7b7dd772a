"""Round-3 operators: stratified split invariants, cross-doc span dedup."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_analysis_of_airline_data_set_spark.curation.splitting import (
    split_summary,
    stratified_split,
)
from big_data_analysis_of_airline_data_set_spark.dedup.spans import (
    cross_doc_span_stats,
)
from big_data_analysis_of_airline_data_set_spark.sources.readers import (
    read_testdata_table,
)


def test_stratified_split_proportions_and_determinism(spark, sf_dir):
    d = read_testdata_table(spark, sf_dir, "documents")
    s1 = stratified_split(d, group_col="source", id_col="doc_id")
    # deterministic: second run assigns identically
    s2 = stratified_split(d, group_col="source", id_col="doc_id")
    diff = (
        s1.select("doc_id", "split")
        .join(s2.select("doc_id", F.col("split").alias("s2")), "doc_id")
        .filter(F.col("split") != F.col("s2"))
        .count()
    )
    assert diff == 0
    # per-group sizes follow floor(0.8n)/floor(0.9n)-floor(0.8n)/rest
    per = {
        (r["source"], r["split"]): r["n_rows"]
        for r in split_summary(d, group_col="source", id_col="doc_id").collect()
    }
    totals = {r["source"]: r["n"] for r in d.groupBy("source").agg(F.count("*").alias("n")).collect()}
    for src, n in totals.items():
        t_train, t_val = int(n * 8 // 10), int(n * 9 // 10)
        assert per.get((src, "train"), 0) == t_train
        assert per.get((src, "val"), 0) == t_val - t_train
        assert per.get((src, "test"), 0) == n - t_val


def test_stratified_split_partitions_are_disjoint_and_exhaustive(spark, sf_dir):
    d = read_testdata_table(spark, sf_dir, "documents")
    s = stratified_split(d, group_col="source", id_col="doc_id")
    assert s.count() == d.count()
    assert s.filter(~F.col("split").isin("train", "val", "test")).count() == 0


def test_cross_doc_span_stats_detects_planted_boilerplate(spark):
    boiler = " ".join(f"b{i}" for i in range(8))  # one exact 8-token span
    rows = [
        (1, boiler + " unique one text " + " ".join(f"x{i}" for i in range(8))),
        (2, boiler + " other words here " + " ".join(f"y{i}" for i in range(8))),
        (3, " ".join(f"z{i}" for i in range(16))),  # no shared spans
        (4, "too short"),  # < 8 tokens -> zero spans
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_spans"], r["n_dup_spans"], r["dup_span_ratio"])
        for r in cross_doc_span_stats(
            df, id_col="doc_id", text_col="text", span_words=8
        ).collect()
    }
    # docs 1/2 share exactly their first span (the boilerplate block is
    # span-aligned at offset 0); their remaining spans are unique
    assert got[1][0] >= 1 and got[1][1] == 1
    assert got[2][0] >= 1 and got[2][1] == 1
    assert got[3] == (2, 0, 0.0)
    assert got[4] == (0, 0, 0.0)


# ------------------------- group-aware split -------------------------


def test_group_split_no_leakage_and_stability(spark):
    from pyspark.sql import functions as F

    from big_data_analysis_of_airline_data_set_spark.curation.splitting import (
        group_split,
    )

    rows = [(u, i) for u in range(200) for i in range(3)]
    df = spark.createDataFrame(rows, "user_id long, seq long")
    out = group_split(df, group_col="user_id")
    # leakage-free: every group maps to exactly one split
    leaks = (
        out.groupBy("user_id")
        .agg(F.count_distinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    assert leaks == 0
    # proportions hold loosely over 200 groups (binomial, ±4σ-ish)
    frac = {
        r.split: r.n for r in
        out.select("user_id", "split").distinct()
        .groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert 0.65 * 200 <= frac["train"] <= 0.95 * 200
    assert frac.get("val", 0) + frac.get("test", 0) == 200 - frac["train"]
    # stability: adding rows to a group cannot move it between splits
    df2 = spark.createDataFrame(
        [(u, i) for u in range(200) for i in range(5)], "user_id long, seq long"
    )
    a = {r.user_id: r.split for r in
         group_split(df, group_col="user_id").select("user_id", "split").distinct().collect()}
    b = {r.user_id: r.split for r in
         group_split(df2, group_col="user_id").select("user_id", "split").distinct().collect()}
    assert a == b


def test_cross_doc_span_stats_persist_variant_identical(spark):
    """persist_spans trades the double tokenize+md5 for a lazy
    localCheckpoint of the span table (r11 A/B: 3x faster on long
    docs, slower on short — module docstring); output must be
    byte-identical either way."""
    from big_data_analysis_of_airline_data_set_spark.dedup.spans import (
        cross_doc_span_stats,
    )

    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta " * 3),
        (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (3, "totally different words here that no one else shares okay"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    base = sorted(
        map(tuple, cross_doc_span_stats(df, id_col="doc_id", text_col="text").collect())
    )
    ckpt = sorted(
        map(
            tuple,
            cross_doc_span_stats(
                df, id_col="doc_id", text_col="text", persist_spans=True
            ).collect(),
        )
    )
    assert base == ckpt
    assert base[0][1] > 0  # doc 1 has spans
