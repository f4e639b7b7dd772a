"""PageRank operator (operators/graph.py): hand-checkable structure on
a tiny graph, determinism, and mass behavior. Value parity with the
unrolled DuckDB replay is the catalog oracle's job."""

from __future__ import annotations

import pytest

from big_data_analysis_of_airline_data_set_spark.operators.graph import (
    pagerank,
    release_pagerank,
)


def _collect_and_release(df):
    rows = df.collect()
    release_pagerank(df)
    return rows


@pytest.fixture(scope="module")
def star_ranks(spark):
    # star: every leaf points at 'hub'; hub points at 'a'
    edges = spark.createDataFrame(
        [("a", "hub"), ("b", "hub"), ("c", "hub"), ("d", "hub"), ("hub", "a")],
        "src string, dst string",
    )
    return {r.node: r.rank for r in _collect_and_release(pagerank(edges, iterations=10))}


def test_hub_dominates(star_ranks):
    # hub and 'a' trade the recirculating mass (hub→a→hub), so both sit
    # far above the teleport-only leaves; synchronous iteration parity
    # decides which of the two is momentarily ahead — assert the stable
    # ordering, not the oscillating one
    assert star_ranks["hub"] > star_ranks["b"]
    assert star_ranks["a"] > star_ranks["b"]
    assert star_ranks["b"] == star_ranks["c"] == star_ranks["d"]


def test_ranks_positive_and_bounded(star_ranks):
    for v in star_ranks.values():
        assert 0.0 < v < 1.0


def test_deterministic_across_runs(spark):
    edges = spark.createDataFrame(
        [(f"n{i}", f"n{(i * 3) % 7}") for i in range(20)],
        "src string, dst string",
    )
    a = sorted((r.node, r.rank) for r in _collect_and_release(pagerank(edges, iterations=4)))
    b = sorted((r.node, r.rank) for r in _collect_and_release(pagerank(edges, iterations=4)))
    assert a == b


def test_uniform_cycle_stays_uniform(spark):
    # directed 4-cycle: perfectly symmetric → every node keeps rank 1/4
    edges = spark.createDataFrame(
        [("w", "x"), ("x", "y"), ("y", "z"), ("z", "w")],
        "src string, dst string",
    )
    ranks = {r.node: r.rank for r in _collect_and_release(pagerank(edges, iterations=6))}
    for v in ranks.values():
        assert abs(v - 0.25) < 1e-9


def test_converged_mass_conservation_with_dangling(spark):
    from big_data_analysis_of_airline_data_set_spark.operators.graph import (
        pagerank_converged,
    )

    # star with a dangling hub successor: 'sink' has no out-edges, so
    # every round redistributes its mass; with redistribution total
    # rank mass stays 1 (the simplified pagerank() leaks it)
    edges = spark.createDataFrame(
        [("a", "sink"), ("b", "sink"), ("c", "sink"), ("sink2", "a")],
        "src string, dst string",
    )
    ranks, stopped = pagerank_converged(edges, max_iterations=6, tol=0.0)
    rows = _collect_and_release(ranks)
    assert stopped == 6  # tol=0 never triggers the early exit
    assert abs(sum(r.rank for r in rows) - 1.0) < 1e-6


def test_converged_early_stop_on_fixed_point(spark):
    from big_data_analysis_of_airline_data_set_spark.operators.graph import (
        pagerank_converged,
    )

    # symmetric directed 4-cycle is a fixed point from the uniform
    # start: delta is ~0 at the first barrier → stops at iteration 2
    edges = spark.createDataFrame(
        [("w", "x"), ("x", "y"), ("y", "z"), ("z", "w")],
        "src string, dst string",
    )
    ranks, stopped = pagerank_converged(
        edges, max_iterations=10, tol=1e-9, check_every=2
    )
    rows = _collect_and_release(ranks)
    assert stopped == 2
    for r in rows:
        assert abs(r.rank - 0.25) < 1e-9


def test_converged_deterministic_across_runs(spark):
    from big_data_analysis_of_airline_data_set_spark.operators.graph import (
        pagerank_converged,
    )

    edges = spark.createDataFrame(
        [(f"n{i}", f"n{(i * 3) % 7}") for i in range(20)],
        "src string, dst string",
    )
    out = []
    for _ in range(2):
        ranks, stopped = pagerank_converged(edges, max_iterations=4, tol=0.0)
        out.append((stopped, sorted((r.node, r.rank) for r in _collect_and_release(ranks))))
    assert out[0] == out[1]


def test_triangle_counts_known_graph(spark):
    from big_data_analysis_of_airline_data_set_spark.operators.graph import (
        triangle_counts,
    )

    # K4 on {1,2,3,4} plus a pendant 5: C(4,3)=4 triangles; each K4
    # vertex sits in C(3,2)=3 of them; the pendant in none.
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)]
    df = spark.createDataFrame(edges, "u long, v long")
    got = {r.vertex: r.n_triangles for r in triangle_counts(df).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}
    assert sum(got.values()) // 3 == 4


def test_triangle_counts_triangle_free(spark):
    from big_data_analysis_of_airline_data_set_spark.operators.graph import (
        triangle_counts,
    )

    # even cycle: 1-2-3-4-1 has no triangles
    df = spark.createDataFrame([(1, 2), (2, 3), (3, 4), (1, 4)], "u long, v long")
    assert triangle_counts(df).count() == 0


def test_flatten_hierarchy_pointer_doubling(spark):
    from big_data_analysis_of_airline_data_set_spark.operators.graph import (
        flatten_hierarchy,
    )

    # two trees: 1←2←3←4 (chain, root 1) and 10 alone
    rows = [(1, None), (2, 1), (3, 2), (4, 3), (10, None)]
    df = spark.createDataFrame(rows, "node long, parent long")
    got = {r.node: (r.root, r.depth) for r in flatten_hierarchy(df).collect()}
    assert got == {
        1: (1, 0), 2: (1, 1), 3: (1, 2), 4: (1, 3), 10: (10, 0),
    }


def test_flatten_hierarchy_deep_chain_log_rounds(spark):
    from big_data_analysis_of_airline_data_set_spark.operators.graph import (
        flatten_hierarchy,
    )

    # 33-deep chain needs 6 doubling rounds (2^6 = 64 ≥ 33); the
    # default max_depth=64 must resolve it fully
    rows = [(0, None)] + [(i, i - 1) for i in range(1, 34)]
    df = spark.createDataFrame(rows, "node long, parent long")
    got = {r.node: (r.root, r.depth) for r in flatten_hierarchy(df).collect()}
    assert got[33] == (0, 33)
    assert all(got[i] == (0, i) for i in range(34))


def _wedge_count(oriented_df) -> int:
    """# of directed 2-paths a→b→c in an oriented edge set — the
    intermediate the wedge closure materializes before the closing
    join, i.e. the quantity degree ordering exists to bound."""
    from pyspark.sql import functions as F

    e1 = oriented_df.select(F.col("s").alias("a"), F.col("t").alias("b"))
    e2 = oriented_df.select(F.col("s").alias("b"), F.col("t").alias("c"))
    return e1.join(e2, "b").count()


def test_triangle_degree_ordering_bounds_hub_fanout(spark):
    """Round-5 verdict #2 pin: on a hub graph whose hub id sits in the
    middle of the id range, id ordering funnels indeg×outdeg = 10×10 =
    100 wedges through the hub, while (degree, id) ordering points
    every hub edge INTO the hub (outdeg 0) leaving exactly the 2
    wedges that close into real triangles. Counts are exact, not
    bounds — a regression in the orientation changes them."""
    from pyspark.sql import functions as F

    from big_data_analysis_of_airline_data_set_spark.operators.graph import (
        orient_by_degree,
        triangle_counts,
    )

    hub = 10
    edges = [(i, hub) for i in range(10)] + [(hub, j) for j in range(11, 21)]
    edges += [(0, 11), (1, 12)]  # close two triangles through the hub
    df = spark.createDataFrame(edges, "u long, v long")

    # id orientation = the pre-round-6 plan (input pairs are already
    # id-ordered here, so the identity projection replays it)
    id_oriented = df.select(F.col("u").alias("s"), F.col("v").alias("t"))
    deg_oriented = orient_by_degree(df)
    assert _wedge_count(id_oriented) == 100
    assert _wedge_count(deg_oriented) == 2

    got = {r.vertex: r.n_triangles for r in triangle_counts(df).collect()}
    assert got == {0: 1, 1: 1, hub: 2, 11: 1, 12: 1}


def test_triangle_counts_invariant_to_input_endpoint_order(spark):
    """orient_by_degree imposes its own total order, so the input may
    list each undirected edge with either endpoint first."""
    from big_data_analysis_of_airline_data_set_spark.operators.graph import (
        triangle_counts,
    )

    fwd = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)]
    rev = [(v, u) for u, v in fwd]
    a = {r.vertex: r.n_triangles
         for r in triangle_counts(spark.createDataFrame(fwd, "u long, v long")).collect()}
    b = {r.vertex: r.n_triangles
         for r in triangle_counts(spark.createDataFrame(rev, "u long, v long")).collect()}
    assert a == b == {1: 3, 2: 3, 3: 3, 4: 3}


def test_pagerank_scope_releases_even_on_error(spark):
    from big_data_analysis_of_airline_data_set_spark.operators.graph import (
        pagerank_scope,
    )

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a")], "src string, dst string"
    )
    held = {}
    with pytest.raises(RuntimeError, match="boom"):
        with pagerank_scope(edges, iterations=2) as ranks:
            assert ranks.count() == 2
            held["ranks"] = ranks
            raise RuntimeError("boom")
    # handles were released (and cleared) by the scope exit
    assert held["ranks"]._pagerank_handles == ()


def test_release_pagerank_raises_on_derived_frame(spark):
    from pyspark.sql import functions as F

    from big_data_analysis_of_airline_data_set_spark.operators.graph import (
        pagerank_scope,
        release_pagerank,
    )

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a")], "src string, dst string"
    )
    with pagerank_scope(edges, iterations=1) as ranks:
        derived = ranks.filter(F.col("rank") > 0)
        with pytest.raises(ValueError, match="derived"):
            release_pagerank(derived)


def test_pagerank_converged_scope_matches_plain_call(spark):
    from big_data_analysis_of_airline_data_set_spark.operators.graph import (
        pagerank_converged,
        pagerank_converged_scope,
        release_pagerank,
    )

    edges = spark.createDataFrame(
        [("a", "hub"), ("b", "hub"), ("hub", "a")], "src string, dst string"
    )
    kw = dict(max_iterations=6, tol=1e-9, check_every=2)
    with pagerank_converged_scope(edges, **kw) as (ranks, stopped):
        scoped = sorted((r.node, r.rank) for r in ranks.collect())
    plain_df, plain_stopped = pagerank_converged(edges, **kw)
    plain = sorted((r.node, r.rank) for r in plain_df.collect())
    release_pagerank(plain_df)
    assert scoped == plain and stopped == plain_stopped


def test_k_core_hand_checked(spark):
    from big_data_analysis_of_airline_data_set_spark.operators.graph import k_core

    # K4 on {1,2,3,4} + pendant 5 + a 2-path 6-7: the 2-core is exactly
    # the K4 (each vertex keeps degree 3); the pendant and the path
    # peel (the path cascades: 6 and 7 have degree 1 after each other)
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (6, 7)]
    df = spark.createDataFrame(edges, "u long, v long")
    got = {r.vertex: r.core_degree for r in k_core(df, k=2).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_k_core_cascade_to_empty(spark):
    from big_data_analysis_of_airline_data_set_spark.operators.graph import k_core

    # a path: every removal exposes a new degree-1 endpoint — the
    # cascade must run to the empty fixpoint, not stop early
    edges = [(i, i + 1) for i in range(6)]
    df = spark.createDataFrame(edges, "u long, v long")
    assert k_core(df, k=2).count() == 0


def test_k_core_raises_when_rounds_exhausted(spark):
    from big_data_analysis_of_airline_data_set_spark.operators.graph import k_core

    # the 6-path cascade needs 3 peel rounds at k=2; a 1-round budget
    # must raise, never return a half-peeled 'core'
    edges = [(i, i + 1) for i in range(6)]
    df = spark.createDataFrame(edges, "u long, v long")
    with pytest.raises(RuntimeError, match="fixpoint"):
        k_core(df, k=2, max_rounds=1)


def test_k_core_symmetric_input_matches_undirected(spark):
    """symmetric=True over a pre-symmetrized edge set must equal the
    plain undirected call (it only skips the internal union+distinct)."""
    from pyspark.sql import functions as F

    from big_data_analysis_of_airline_data_set_spark.operators.graph import k_core

    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)]
    df = spark.createDataFrame(edges, "u long, v long")
    sym = df.union(df.select(F.col("v").alias("u"), F.col("u").alias("v")))
    a = {r.vertex: r.core_degree for r in k_core(df, k=2).collect()}
    b = {r.vertex: r.core_degree
         for r in k_core(sym, k=2, symmetric=True).collect()}
    assert a == b == {1: 3, 2: 3, 3: 3, 4: 3}


def test_label_propagation_width_scope_restores_conf(spark):
    """Round-12: the LPA round loop narrows the shuffle width under the
    broadcast gate; the session conf must be restored and labels must
    equal the ungated (shuffle-path) run."""
    from big_data_analysis_of_airline_data_set_spark.operators.graph import (
        label_propagation,
    )

    edges = [(1, 2), (2, 3), (3, 1), (4, 5), (5, 6), (6, 4), (3, 4)]
    df = spark.createDataFrame(edges, "u long, v long")
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    a = {r.vertex: r.label for r in label_propagation(df, rounds=3).collect()}
    assert spark.conf.get("spark.sql.shuffle.partitions") == saved
    b = {
        r.vertex: r.label
        for r in label_propagation(df, rounds=3, broadcast_nodes_max=0).collect()
    }
    assert a == b


def test_bfs_width_scope_restores_conf_and_matches_shuffle_path(spark):
    from big_data_analysis_of_airline_data_set_spark.operators.graph import (
        bfs_distances,
    )

    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (2, 6)]
    df = spark.createDataFrame(edges, "u long, v long")
    seeds = spark.createDataFrame([(1,)], "vertex long")
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    a = {r.vertex: r.dist for r in bfs_distances(df, seeds).collect()}
    assert spark.conf.get("spark.sql.shuffle.partitions") == saved
    b = {
        r.vertex: r.dist
        for r in bfs_distances(df, seeds, broadcast_nodes_max=0).collect()
    }
    assert a == b == {1: 0, 2: 1, 3: 2, 6: 2, 4: 3, 5: 4}


def test_flatten_hierarchy_broadcast_gate_matches_shuffle_path(spark):
    from big_data_analysis_of_airline_data_set_spark.operators.graph import (
        flatten_hierarchy,
    )

    rows = [(1, None), (2, 1), (3, 2), (4, 3), (5, None), (6, 5)]
    df = spark.createDataFrame(rows, "node long, parent long")
    a = {r.node: (r.root, r.depth) for r in flatten_hierarchy(df).collect()}
    b = {
        r.node: (r.root, r.depth)
        for r in flatten_hierarchy(df, broadcast_nodes_max=0).collect()
    }
    assert a == b
    assert a[4] == (1, 3) and a[6] == (5, 1)
