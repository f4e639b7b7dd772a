"""Custom Python DataSource (sources/synthetic_source.py): schema,
determinism, partition-parallel generation, and pipeline composability."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_analysis_of_airline_data_set_spark.sources.synthetic_source import (
    register_synthetic_docs,
)


def _read(spark, **opts):
    register_synthetic_docs(spark)
    r = spark.read.format("synthetic_docs")
    for k, v in opts.items():
        r = r.option(k, str(v))
    return r.load()


def test_count_schema_and_determinism(spark):
    df = _read(spark, n_docs=500, n_partitions=4, seed=42)
    assert df.columns == ["doc_id", "text", "lang", "source", "n_chars"]
    assert df.count() == 500
    a = sorted(df.collect())
    b = sorted(_read(spark, n_docs=500, n_partitions=4, seed=42).collect())
    assert a == b  # rerun-stable


def test_partition_count_does_not_change_content(spark):
    a = sorted(_read(spark, n_docs=300, n_partitions=2, seed=7).collect())
    b = sorted(_read(spark, n_docs=300, n_partitions=10, seed=7).collect())
    assert a == b  # values are a pure function of (seed, doc_id)
    assert _read(spark, n_docs=300, n_partitions=10, seed=7).rdd.getNumPartitions() == 10


def test_seed_changes_corpus_and_ids_are_complete(spark):
    df7 = _read(spark, n_docs=200, n_partitions=3, seed=7)
    df8 = _read(spark, n_docs=200, n_partitions=3, seed=8)
    assert df7.select("text").collect() != df8.select("text").collect()
    ids = [r["doc_id"] for r in df7.select("doc_id").orderBy("doc_id").collect()]
    assert ids == list(range(200))


def test_composes_with_curation_pipeline(spark):
    from big_data_analysis_of_airline_data_set_spark.curation import quota_sample

    df = _read(spark, n_docs=400, n_partitions=4, seed=1)
    out = quota_sample(df, group_col="source", id_col="doc_id", k=10)
    per = {r["source"]: r["n"] for r in
           out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert set(per) == {"src0", "src1", "src2", "src3"}
    assert all(n == 10 for n in per.values())
