"""End-to-end curation job (jobs/curate.py): funnel monotonicity,
stage semantics, and the CLI writing a partitioned corpus."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from big_data_analysis_of_airline_data_set_spark.jobs.curate import curate, main
from big_data_analysis_of_airline_data_set_spark.sources.readers import (
    read_testdata_table,
)


@pytest.fixture()
def work():
    d = tempfile.mkdtemp(prefix="curate-job-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_curate_funnel_semantics(spark, sf_dir):
    docs = read_testdata_table(spark, sf_dir, "documents")
    corpus, report = curate(docs)
    stages = {r["stage"]: r["n_rows"] for r in report.collect()}
    assert list(r["stage"] for r in report.orderBy("stage_idx").collect()) == [
        "input", "quality_gate", "exact_dedup", "decontaminated",
        "mixture_sampled", "packed",
    ]
    # each stage only removes rows; packing is 1:1
    assert (
        stages["input"] >= stages["quality_gate"] >= stages["exact_dedup"]
        >= stages["decontaminated"] >= stages["mixture_sampled"]
    )
    assert stages["packed"] == stages["mixture_sampled"]
    assert corpus.count() == stages["packed"]
    # corpus content is unique and benchmark docs never leak through
    assert corpus.select("fingerprint").distinct().count() == corpus.count()
    assert corpus.filter(F.col("doc_id") % 50 == 0).count() == 0
    # pack offsets respect the budget
    assert corpus.filter(F.col("pack_offset") >= 256).count() == 0


def test_curate_funnel_single_execution_per_stage(spark, sf_dir):
    """The funnel must not recompute the chain per stage count: every
    count() during curate() must run against a persisted DataFrame
    (downstream stages then read the cache, so each stage's
    transformation executes once). An Observation accumulator is
    deliberately NOT used for the input count — see the curate()
    docstring and test_no_observation_used_by_curate below."""
    from unittest import mock

    counted: list[bool] = []
    docs = read_testdata_table(spark, sf_dir, "documents")
    # patch the concrete class (pyspark.sql.classic.dataframe.DataFrame
    # in PySpark 4; the pyspark.sql.DataFrame base is abstract and not
    # on the dispatch path)
    cls = type(docs)
    real_count = cls.count

    def tracking_count(self):
        counted.append(self.storageLevel.useMemory or self.storageLevel.useDisk)
        return real_count(self)

    with mock.patch.object(cls, "count", tracking_count):
        corpus, report = curate(docs)
    # Exactly 6 counts (input, gate, dedup, decontaminated, sampled,
    # packed), every one on a persisted frame — the curation library
    # issues no internal counts.
    assert counted == [True] * 6, counted
    corpus.unpersist()
    stages = {r["stage"]: r["n_rows"] for r in report.collect()}
    assert stages["input"] > 0


def test_no_observation_used_by_curate():
    """Spark 4.1 regression guard: registering ANY pyspark Observation
    poisons the session for later MLlib fits — the LogisticRegression
    training summary drags SparkSession → ObservationManager
    (non-serializable) into task closures, and every subsequent
    evaluator.evaluate throws NotSerializableException (reproduced on
    4.1.2 with a 20-line script). curate() therefore persists+counts
    the input instead of observing it; this pin keeps Observation from
    creeping back into any library code path."""
    import pathlib
    import re

    import big_data_analysis_of_airline_data_set_spark as pkg

    # Match actual USAGE (import or constructor call), not the mere word
    # — docstrings may legitimately explain why Observation is avoided.
    usage = re.compile(
        r"from\s+pyspark(\.sql)?\s+import\s+[^\n]*\bObservation\b"
        r"|\bObservation\s*\("
    )
    root = pathlib.Path(pkg.__file__).parent
    offenders = [
        str(p) for p in root.rglob("*.py") if usage.search(p.read_text())
    ]
    assert offenders == [], offenders


def test_curate_cli_writes_partitioned_corpus(spark, sf_dir, work):
    main([
        "--input", f"{sf_dir}/documents.parquet",
        "--output", work,
        "--pack-budget", "128",
    ])
    corpus = spark.read.parquet(f"{work}/corpus")
    report = spark.read.parquet(f"{work}/report")
    assert corpus.count() == [
        r["n_rows"] for r in report.collect() if r["stage"] == "packed"
    ][0]
    # partitioned by source on disk
    import os

    assert any(p.startswith("source=") for p in os.listdir(f"{work}/corpus"))
    assert corpus.filter(F.col("pack_offset") >= 128).count() == 0
