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


# ------------------------- KMV distinct sketch -------------------------


def test_kmv_estimate_within_band_and_merge(spark):
    from pyspark.sql import functions as F

    from big_data_analysis_of_airline_data_set_spark.sketches.kmv import (
        kmv_distinct_by_group,
        kmv_sketch,
    )

    rows = [(("g1" if i % 2 else "g2"), f"v{i % 400}") for i in range(2000)]
    df = spark.createDataFrame(rows, "grp string, val string")
    out = {
        r.group: r
        for r in kmv_distinct_by_group(
            df, group_col="grp", value_col="val", k=96
        ).collect()
    }
    # g1 sees odd residues (200 distinct), g2 even (200), union 400
    assert out["g1"].exact_distinct == 200
    assert out["ALL"].exact_distinct == 400
    for r in out.values():
        # 1/sqrt(96) ≈ 10% std error; Kirsch-Mitzenmacher correlation
        # inflates it — 35% is the loose determinism-safe band
        assert abs(r.distinct_estimate - r.exact_distinct) <= 0.35 * r.exact_distinct
    # merge property: the ALL sketch is the elementwise min of groups
    sk = kmv_sketch(df, group_col="grp", value_col="val", k=96)
    mins = {
        (r.group, r.j): r.min_h for r in sk.collect()
    }
    merged = sk.groupBy("j").agg(F.min("min_h").alias("m")).collect()
    for r in merged:
        assert r.m == min(mins[("g1", r.j)], mins[("g2", r.j)])


def test_kmv_small_group_estimate_sane(spark):
    from big_data_analysis_of_airline_data_set_spark.sketches.kmv import (
        kmv_distinct_by_group,
    )

    df = spark.createDataFrame(
        [("g", f"x{i}") for i in range(3)], "grp string, val string"
    )
    row = kmv_distinct_by_group(
        df, group_col="grp", value_col="val", k=8, with_union=False
    ).first()
    assert row.exact_distinct == 3
    # tiny-D estimates are noisy but must stay positive and bounded
    assert 1 <= row.distinct_estimate <= 30


def test_hll_estimate_within_band_and_union_merge(spark):
    """p=8 → standard error ~1.04/sqrt(256) ≈ 6.5%; assert both group
    estimates and the max-merged 'ALL' union row land within 4σ, and
    that the union row reflects the TRUE union (overlapping groups)."""
    from big_data_analysis_of_airline_data_set_spark.sketches.hll import (
        hll_distinct_by_group,
    )

    rows = [("g1", f"v{i}") for i in range(3000)]
    rows += [("g2", f"v{i}") for i in range(1500, 4500)]  # 1500 overlap
    df = spark.createDataFrame(rows, "grp string, val string")
    got = {
        r.group: r
        for r in hll_distinct_by_group(
            df, group_col="grp", value_col="val", p=8
        ).collect()
    }
    assert got["g1"].exact_distinct == 3000
    assert got["ALL"].exact_distinct == 4500  # union, not 6000
    for g, true in [("g1", 3000), ("g2", 3000), ("ALL", 4500)]:
        est = got[g].hll_estimate
        assert abs(est - true) / true < 0.26, (g, est, true)
        assert got[g].m_registers == 256


def test_hll_registers_merge_equals_rebuild(spark):
    """Mergeability: elementwise MAX of sketches built on two slices
    == the sketch built on the union — exactly, register by register."""
    from pyspark.sql import functions as F

    from big_data_analysis_of_airline_data_set_spark.sketches.hll import (
        hll_registers,
    )

    a = spark.createDataFrame([("g", f"x{i}") for i in range(400)], "grp string, val string")
    b = spark.createDataFrame([("g", f"x{i}") for i in range(200, 700)], "grp string, val string")
    ra = hll_registers(a, group_col="grp", value_col="val", p=6)
    rb = hll_registers(b, group_col="grp", value_col="val", p=6)
    merged = {
        (r.group, r.register): r.m
        for r in ra.unionByName(rb)
        .groupBy("group", "register")
        .agg(F.max("max_rho").alias("m"))
        .collect()
    }
    rebuilt = {
        (r.group, r.register): r.max_rho
        for r in hll_registers(
            a.unionByName(b), group_col="grp", value_col="val", p=6
        ).collect()
    }
    assert merged == rebuilt


def test_hll_linear_counting_branch_small_sets(spark):
    """A handful of distincts leaves nearly all 256 registers zero —
    the linear-counting branch must fire and be near-exact there
    (m*ln(m/V) with V ≈ m-D is within ~1 of D for tiny D)."""
    from big_data_analysis_of_airline_data_set_spark.sketches.hll import (
        hll_distinct_by_group,
    )

    df = spark.createDataFrame(
        [("g", f"only{i}") for i in range(5)], "grp string, val string"
    )
    row = hll_distinct_by_group(
        df, group_col="grp", value_col="val", p=8, with_union=False
    ).first()
    assert row.exact_distinct == 5
    assert row.zero_registers >= 251
    assert abs(row.hll_estimate - 5) < 1.5


def test_hll_p_validation(spark):
    import pytest as _pytest

    from big_data_analysis_of_airline_data_set_spark.sketches.hll import (
        hll_registers,
    )

    df = spark.createDataFrame([("g", "v")], "grp string, val string")
    with _pytest.raises(ValueError, match="p must be"):
        hll_registers(df, group_col="grp", value_col="val", p=3)


def test_hll_trailing_merge_hand_checked(spark):
    """W=2 over buckets {1,2,4}: anchor 1 sees bucket 1 only, anchor 2
    merges buckets 1+2, anchor 4 sees bucket 4 only (bucket 3 absent —
    and no phantom anchor 3 or 5 is minted). Register-level equality
    against sketches rebuilt on the expected bucket unions."""
    from pyspark.sql import functions as F

    from big_data_analysis_of_airline_data_set_spark.sketches.hll import (
        hll_registers,
        hll_trailing_merge,
    )

    rows = [("g", 1, f"a{i}") for i in range(50)]
    rows += [("g", 2, f"b{i}") for i in range(50)]
    rows += [("g", 4, f"c{i}") for i in range(50)]
    df = spark.createDataFrame(rows, "grp string, hb long, val string")
    regs = hll_registers(df, group_cols=["grp", "hb"], value_col="val", p=6)
    merged = hll_trailing_merge(
        regs, bucket_col="hb", group_cols=["grp"], window_buckets=2
    )
    got = {
        (r.grp, r.hb, r.register): r.max_rho for r in merged.collect()
    }
    assert sorted({hb for (_, hb, _) in got}) == [1, 2, 4]

    def rebuild(pred):
        sub = df.filter(pred)
        return {
            (r.grp, r.register): r.max_rho
            for r in hll_registers(
                sub.select("grp", "val"), group_cols=["grp"], value_col="val", p=6
            ).collect()
        }

    for anchor, pred in [
        (1, F.col("hb") == 1),
        (2, F.col("hb").isin(1, 2)),
        (4, F.col("hb") == 4),
    ]:
        want = rebuild(pred)
        have = {
            (g, reg): rho for (g, hb, reg), rho in got.items() if hb == anchor
        }
        assert have == want, anchor


def test_cms_join_size_hand_checked(spark):
    """A = {x,x,y}, B = {x,y,y,z}: |A⋈B| = 2·1 + 1·2 = 4 exactly; at
    w=4096 with 3 distinct terms the md5 buckets are collision-free
    (deterministic hashes — verified), so the inner product equals the
    exact size; the one-sided guarantee must hold regardless."""
    from big_data_analysis_of_airline_data_set_spark.sketches.countmin import (
        cms_join_size_estimate,
    )

    a = spark.createDataFrame([("x",), ("x",), ("y",)], "t string")
    b = spark.createDataFrame([("x",), ("y",), ("y",), ("z",)], "t string")
    r = cms_join_size_estimate(
        a, b, term_col_a="t", term_col_b="t", depth=4, width=4096
    ).first()
    assert r.exact_join_size == 4
    assert r.overestimates
    assert r.cms_join_size_estimate == 4


def test_cms_join_size_disjoint_keys(spark):
    """Disjoint key sets: exact join size 0 — and with 4 independent
    rows over w=4096 at 100 keys, at least one row is collision-free,
    so the spined min is exactly 0 (the pre-spine implementation
    dropped empty rows and could emit an inflated min or NULL)."""
    from big_data_analysis_of_airline_data_set_spark.sketches.countmin import (
        cms_join_size_estimate,
    )

    a = spark.createDataFrame([(f"a{i}",) for i in range(50)], "t string")
    b = spark.createDataFrame([(f"b{i}",) for i in range(50)], "t string")
    r = cms_join_size_estimate(
        a, b, term_col_a="t", term_col_b="t", depth=4, width=4096
    ).first()
    assert r.exact_join_size == 0
    assert r.cms_join_size_estimate == 0
    assert r.overestimates
