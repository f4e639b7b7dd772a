"""Count-Min sketch properties (sketches/countmin.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_analysis_of_airline_data_set_spark.sketches import (
    count_min_sketch_table,
    heavy_hitters_with_estimates,
)


def _occurrences(spark, counts: dict[str, int]):
    rows = [(t,) for t, n in counts.items() for _ in range(n)]
    return spark.createDataFrame(rows, ["term"])


def test_cms_never_underestimates_even_under_heavy_collisions(spark):
    counts = {f"t{i}": i + 1 for i in range(40)}
    occ = _occurrences(spark, counts)
    # width 4 forces ~10 terms per bucket -> rampant collisions
    out = heavy_hitters_with_estimates(occ, term_col="term", k=40, depth=3, width=4)
    rows = out.collect()
    assert len(rows) == 40
    assert all(r["overestimates"] for r in rows)
    assert all(r["cms_estimate"] >= r["exact_count"] for r in rows)


def test_cms_exact_when_collision_free(spark):
    # 3 terms, width 1024: collision probability negligible per row;
    # estimates must equal exact counts
    counts = {"alpha": 7, "beta": 3, "gamma": 11}
    occ = _occurrences(spark, counts)
    out = {r["term"]: (r["exact_count"], r["cms_estimate"]) for r in
           heavy_hitters_with_estimates(occ, term_col="term", k=3).collect()}
    for t, n in counts.items():
        assert out[t] == (n, n)


def test_cms_table_mass_conservation(spark):
    # every depth level holds the total occurrence mass exactly once
    counts = {f"w{i}": 5 for i in range(20)}
    occ = _occurrences(spark, counts)
    tbl = count_min_sketch_table(occ, term_col="term", depth=4, width=16)
    per_level = {r["j"]: r["total"] for r in
                 tbl.groupBy("j").agg(F.sum("s").alias("total")).collect()}
    assert per_level == {0: 100, 1: 100, 2: 100, 3: 100}
