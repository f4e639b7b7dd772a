"""Incremental-dedup document ingestion (streaming/ingest.py):
foreachBatch dedup-against-store semantics across batches AND jobs."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from big_data_analysis_of_airline_data_set_spark.sources.readers import (
    read_testdata_table,
)
from big_data_analysis_of_airline_data_set_spark.streaming import (
    run_dedup_ingest_available_now,
    seed_fingerprint_store,
)
from big_data_analysis_of_airline_data_set_spark.text.analysis import (
    content_fingerprint,
)


@pytest.fixture()
def dirs():
    made = [tempfile.mkdtemp(prefix=p) for p in ("docs-", "store-", "out-", "out2-")]
    yield made
    for d in made:
        shutil.rmtree(d, ignore_errors=True)


def test_ingest_dedups_within_and_across_jobs(spark, sf_dir, dirs):
    docs_dir, store_dir, out_dir, out2_dir = dirs
    d = read_testdata_table(spark, sf_dir, "documents")
    # multiple files -> multiple micro-batches (maxFilesPerTrigger=1),
    # so cross-BATCH dedup is genuinely exercised, not just in-batch
    d.repartition(3).write.mode("overwrite").parquet(docs_dir)

    seed_fingerprint_store(spark, store_dir)
    out = run_dedup_ingest_available_now(
        spark, docs_dir, store_dir=store_dir, out_dir=out_dir, query_name="ingest1"
    )

    expected = (
        d.select(content_fingerprint(F.col("text")).alias("fingerprint"))
        .distinct()
        .count()
    )
    assert out.count() == expected  # one survivor per distinct content
    assert out.select("fingerprint").distinct().count() == expected
    # every kept doc_id really carries the fingerprint it's stored under
    joined = out.alias("o").join(
        d.withColumn("fp", content_fingerprint(F.col("text"))).alias("d"),
        F.col("o.doc_id") == F.col("d.doc_id"),
    )
    assert joined.filter(F.col("o.fingerprint") != F.col("d.fp")).count() == 0

    # second JOB over the same input, fresh checkpoint + sink, same store:
    # everything is already in the store -> zero new documents
    out2 = run_dedup_ingest_available_now(
        spark, docs_dir, store_dir=store_dir, out_dir=out2_dir, query_name="ingest2"
    )
    assert out2.count() == 0
