"""Mathematical properties of the late round-4 operators, checked
exhaustively on constructed or testdata inputs (same style as
test_simhash_properties: deterministic property checks, not per-example
fuzzing — a Spark job per hypothesis example is the wrong cost model).
"""

from __future__ import annotations

import itertools
import random

from pyspark.sql import functions as F


def _lev(a: str, b: str) -> int:
    # reference Levenshtein (unit costs) for the brute-force oracle
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_fuzzy_pairs_recall_equals_bruteforce_in_guarantee_regime(spark):
    """q=2, d=2: every true pair of strings with length >= 6 shares a
    2-gram (count filter), so blocked+verified output must equal the
    full brute-force pair set — not just a subset."""
    rng = random.Random(7)
    alphabet = "abcdefg"
    base = ["".join(rng.choice(alphabet) for _ in range(8)) for _ in range(30)]
    mutated = []
    for name in base[:10]:  # planted near-duplicates (real mutations)
        chars = list(name)
        i = rng.randrange(len(chars))
        chars[i] = rng.choice([c for c in alphabet if c != chars[i]])
        mutated.append("".join(chars))
    names = sorted(set(base + mutated))
    assert all(len(n) >= 6 for n in names)

    from big_data_analysis_of_airline_data_set_spark.dedup.fuzzy import fuzzy_pairs

    df = spark.createDataFrame([(i, n) for i, n in enumerate(names)],
                               "id long, name string")
    got = sorted(
        (r.name_a, r.name_b, r.lev)
        for r in fuzzy_pairs(df, name_col="name", q=2, max_distance=2).collect()
    )
    want = sorted(
        (a, b, _lev(a, b))
        for a, b in itertools.combinations(names, 2)
        if _lev(a, b) <= 2
    )
    assert got == want and len(want) >= 10  # the planted pairs exist


def test_span_scrub_token_conservation(spark, sf_dir):
    """Every dropped span removes exactly span_words tokens and nothing
    else: Σ new_n_tokens == Σ original tokens − 8·Σ dropped."""
    from big_data_analysis_of_airline_data_set_spark.dedup.spans import (
        scrub_duplicate_spans,
    )
    from big_data_analysis_of_airline_data_set_spark.text.analysis import token_count

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    total = d.select(F.sum(token_count(F.col("text")))).first()[0]
    out = scrub_duplicate_spans(d, id_col="doc_id", text_col="text", span_words=8)
    agg = out.agg(
        F.sum("new_n_tokens").alias("kept"), F.sum("n_spans_dropped").alias("dropped")
    ).first()
    assert agg.kept == total - 8 * agg.dropped
    assert agg.dropped > 0  # the corpus genuinely contains cross-doc spans


def test_kmv_union_estimate_dominates_groups(spark, sf_dir):
    """Merged sketch minima are elementwise <= each group's minima, so
    the union estimate must be >= every per-group estimate — a hard
    algebraic property of the estimator, not a statistical one."""
    from big_data_analysis_of_airline_data_set_spark.sketches.kmv import (
        kmv_distinct_by_group,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    rows = {
        r.group: r.distinct_estimate
        for r in kmv_distinct_by_group(
            li, group_col="l_returnflag", value_col="l_orderkey", k=32
        ).collect()
    }
    union = rows.pop("ALL")
    assert rows and all(union >= v for v in rows.values())


def test_kcenter_selected_similarity_monotone(spark, sf_dir):
    """Greedy farthest-point: as centers accumulate, the best available
    (lowest max-similarity) candidate can only get worse, so the
    selected score is non-decreasing in rank."""
    from big_data_analysis_of_airline_data_set_spark.similarity.quantized_rerank import (
        kcenter_coreset_quantized,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = sorted(
        (r.center_rank, r.max_center_sim)
        for r in kcenter_coreset_quantized(
            e, id_col="vec_id", vec_col="embedding", k=6
        ).collect()
    )
    sims = [s for rank, s in rows if rank >= 1]
    assert sims == sorted(sims)
    assert len(rows) == 6
