"""Segment/network analytics catalog: HLL set algebra, multi-source
BFS, Welch's t, RFM quartile segmentation, two-feature OLS.

The continuation-of-round-6 wave (no reference analogue; engine
surface beyond the reference per the brief — the reference's own
statistics stop at correlation/chi-square, its graph surface at
nothing). Each entry follows the catalog contract: a Spark-first plan
plus a DuckDB oracle that replays the SAME arithmetic — the sketch
estimator fragments come from ``patterns.hll_sql_parts`` and the
closed-form statistics share literal expression text with the Spark
plan via ``stats.regression``'s WELCH_*/OLS2_* constants, so neither
side can drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..sources.readers import read_testdata_table
from ..stats.regression import (
    OLS2_B0,
    OLS2_B1,
    OLS2_B2,
    OLS2_R2,
    WELCH_DOF,
    WELCH_STAGE1,
    WELCH_T,
)
from .patterns import hll_sql_parts
from .spec import QuerySpec

_HLL_P = 8


# --------------------- HLL set algebra (pairs) ---------------------


def q_sketch_hll_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise union / intersection / Jaccard estimates between the
    order-key sets of lineitem's return classes from ONE pass of
    m-register sketches (sketches/hll.py:hll_set_ops) — the mergeable
    set algebra that makes register sketches the segment-overlap wire
    format at 100 TB (per-pair work is m small rows, data-independent).
    Exact counts ride along; every estimate is engine-replayed, so the
    oracle hash-checks the full inclusion-exclusion chain."""
    from ..sketches.hll import hll_set_ops

    li = read_testdata_table(spark, sf_dir, "lineitem")
    return hll_set_ops(
        li, group_col="l_returnflag", value_col="l_orderkey", p=_HLL_P
    )


def _hll_set_ops_oracle() -> str:
    q = hll_sql_parts(_HLL_P)
    est_case = f"""
         round(CASE WHEN e_raw <= {q["lc_bound"]!r} AND zero_registers > 0
                    THEN (SELECT lc_est FROM lc WHERE v = zero_registers)
                    ELSE e_raw END, 6)"""
    return f"""
WITH base AS (
  SELECT l_returnflag AS "group", CAST(l_orderkey AS VARCHAR) AS val
  FROM lineitem
), hashed AS (
  SELECT "group", {q["hash_expr"]} AS h FROM base
), regs AS (
  SELECT "group", h // {1 << q["sb"]} AS register,
         max({q["rank_case"]}) AS max_rho
  FROM hashed GROUP BY 1, 2
), pairs AS (
  SELECT a.g AS group_a, b.g AS group_b
  FROM (SELECT DISTINCT "group" AS g FROM regs) a
  JOIN (SELECT DISTINCT "group" AS g FROM regs) b ON a.g < b.g
), uregs AS (
  SELECT p.group_a, p.group_b, r.register, max(r.max_rho) AS max_rho
  FROM pairs p
  JOIN regs r ON r."group" = p.group_a OR r."group" = p.group_b
  GROUP BY 1, 2, 3
), lc(v, lc_est) AS (VALUES
    {q["lc_rows"]}
), gagg AS (
  SELECT "group", CAST({q["m"]} - count(*) AS BIGINT) AS zero_registers,
         {q["numerator"]!r} / CAST(sum({q["term_sql"]})
             + CAST({q["m"]} - count(*) AS DECIMAL(38,0))
               * {q["zero_term"]} AS DOUBLE) AS e_raw
  FROM regs GROUP BY "group"
), pagg AS (
  SELECT group_a, group_b,
         CAST({q["m"]} - count(*) AS BIGINT) AS zero_registers,
         {q["numerator"]!r} / CAST(sum({q["term_sql"]})
             + CAST({q["m"]} - count(*) AS DECIMAL(38,0))
               * {q["zero_term"]} AS DOUBLE) AS e_raw
  FROM uregs GROUP BY 1, 2
), gest AS (
  SELECT "group",{est_case} AS est
  FROM gagg
), pest AS (
  SELECT group_a, group_b,{est_case} AS est
  FROM pagg
), dv AS (
  SELECT DISTINCT "group" AS g, val FROM base
), ex AS (
  SELECT g, CAST(count(*) AS BIGINT) AS exact FROM dv GROUP BY g
), xin AS (
  SELECT x.g AS group_a, y.g AS group_b,
         CAST(count(*) AS BIGINT) AS exact_intersection
  FROM dv x JOIN dv y ON x.val = y.val AND x.g < y.g
  GROUP BY 1, 2
)
SELECT p.group_a, p.group_b,
       CAST({q["m"]} AS BIGINT) AS m_registers,
       ga.est AS est_a, gb.est AS est_b, pe.est AS est_union,
       round(ga.est + gb.est - pe.est, 6) AS est_intersection,
       round((ga.est + gb.est - pe.est) / pe.est, 6) AS est_jaccard,
       xa.exact AS exact_a, xb.exact AS exact_b,
       CAST(coalesce(xi.exact_intersection, 0) AS BIGINT)
         AS exact_intersection,
       CAST(xa.exact + xb.exact - coalesce(xi.exact_intersection, 0)
            AS BIGINT) AS exact_union
FROM pairs p
JOIN gest ga ON ga."group" = p.group_a
JOIN gest gb ON gb."group" = p.group_b
JOIN pest pe ON pe.group_a = p.group_a AND pe.group_b = p.group_b
JOIN ex xa ON xa.g = p.group_a
JOIN ex xb ON xb.g = p.group_b
LEFT JOIN xin xi
  ON xi.group_a = p.group_a AND xi.group_b = p.group_b
"""


# --------------------- multi-source BFS distances ---------------------

_BFS_HOPS = 6


def q_graph_bfs_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS (operators/graph.py:bfs_distances) over the
    customer-supplier bipartite graph (distinct trading pairs via
    orders ⋈ lineitem), seeded at every nation-0 supplier: the
    blast-radius question — how many customers/suppliers sit within h
    hops of a seed set. Level-synchronous frontier propagation, edges
    shuffled once; the oracle unrolls the same six rounds as
    MATERIALIZED CTEs (each round references the previous settled set
    three times — the 2^N inlining trap) so every per-hop count is
    value-checked, convergence included (the frontier empties before
    the budget at every sf, which is idempotent with the unroll)."""
    from ..operators.graph import bfs_distances

    o = read_testdata_table(spark, sf_dir, "orders")
    li = read_testdata_table(spark, sf_dir, "lineitem")
    s = read_testdata_table(spark, sf_dir, "supplier")
    edges = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            F.concat(F.lit("c:"), F.col("o_custkey").cast("string")).alias(
                "u"
            ),
            F.concat(F.lit("s:"), F.col("l_suppkey").cast("string")).alias(
                "v"
            ),
        )
        .distinct()
    )
    seeds = s.filter(F.col("s_nationkey") == 0).select(
        F.concat(F.lit("s:"), F.col("s_suppkey").cast("string")).alias(
            "vertex"
        )
    )
    dist = bfs_distances(edges, seeds, max_hops=_BFS_HOPS)
    return dist.groupBy("dist").agg(
        F.sum(
            F.when(F.col("vertex").startswith("c:"), 1).otherwise(0)
        ).cast("long").alias("n_customers"),
        F.sum(
            F.when(F.col("vertex").startswith("s:"), 1).otherwise(0)
        ).cast("long").alias("n_suppliers"),
    )


def _bfs_oracle() -> str:
    prev = "d0"
    rounds = []
    for i in range(1, _BFS_HOPS + 1):
        rounds.append(f"""
d{i} AS MATERIALIZED (
  SELECT vertex, dist FROM {prev}
  UNION ALL
  SELECT DISTINCT s.d, CAST({i} AS BIGINT)
  FROM sym s JOIN {prev} p ON s.s = p.vertex
  WHERE s.d NOT IN (SELECT vertex FROM {prev})
)""")
        prev = f"d{i}"
    return f"""
WITH e AS MATERIALIZED (
  SELECT DISTINCT 'c:' || CAST(o_custkey AS VARCHAR) AS cu,
                  's:' || CAST(l_suppkey AS VARCHAR) AS sv
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
), sym AS MATERIALIZED (
  SELECT cu AS s, sv AS d FROM e UNION ALL SELECT sv, cu FROM e
), d0 AS MATERIALIZED (
  SELECT DISTINCT 's:' || CAST(s_suppkey AS VARCHAR) AS vertex,
         CAST(0 AS BIGINT) AS dist
  FROM supplier WHERE s_nationkey = 0
),{",".join(rounds)}
SELECT dist,
       CAST(count(*) FILTER (WHERE vertex LIKE 'c:%') AS BIGINT)
         AS n_customers,
       CAST(count(*) FILTER (WHERE vertex LIKE 's:%') AS BIGINT)
         AS n_suppliers
FROM {prev} GROUP BY dist
"""


# --------------------- Welch's two-sample t ---------------------


def q_stats_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t per event type between the even/odd
    user-id populations (stats/regression.py:welch_t_test) — the
    continuous-metric A/B readout next to the proportion z-test.
    Exact decimal moments in one pass; t and the Welch-Satterthwaite
    dof evaluate the SAME expression text the oracle runs (the
    WELCH_* constants), so the statistics hash-match."""
    from ..stats.regression import welch_t_test

    e = read_testdata_table(spark, sf_dir, "events")
    return welch_t_test(
        e,
        group_cols=["event_type"],
        segment_col=F.col("user_id") % 2,
        value_col="value",
        seg_a=0,
        seg_b=1,
    )


def _welch_oracle() -> str:
    stage1 = ",\n         ".join(
        f"{text} AS {name}" for name, text in WELCH_STAGE1.items()
    )
    dec = "CAST(value AS DECIMAL(18,6))"
    return f"""
WITH m AS (
  SELECT event_type,
         CAST(count(*) FILTER (WHERE user_id % 2 = 0) AS BIGINT) AS na,
         CAST(count(*) FILTER (WHERE user_id % 2 = 1) AS BIGINT) AS nb,
         CAST(sum(CAST({dec} AS DECIMAL(38,6)))
              FILTER (WHERE user_id % 2 = 0) AS DOUBLE) AS sa,
         CAST(sum(CAST({dec} AS DECIMAL(38,6)))
              FILTER (WHERE user_id % 2 = 1) AS DOUBLE) AS sb,
         CAST(sum(CAST({dec} * {dec} AS DECIMAL(38,12)))
              FILTER (WHERE user_id % 2 = 0) AS DOUBLE) AS saa,
         CAST(sum(CAST({dec} * {dec} AS DECIMAL(38,12)))
              FILTER (WHERE user_id % 2 = 1) AS DOUBLE) AS sbb
  FROM events WHERE value IS NOT NULL
  GROUP BY event_type
), m2 AS (
  SELECT event_type, na, nb,
         CAST(na AS DOUBLE) AS nad, CAST(nb AS DOUBLE) AS nbd,
         sa, sb, saa, sbb
  FROM m
), s1 AS (
  SELECT event_type, na, nb, nad, nbd,
         {stage1}
  FROM m2
)
SELECT event_type, na AS n_a, nb AS n_b,
       round(mean_a, 6) AS mean_a, round(mean_b, 6) AS mean_b,
       round(var_a, 6) AS var_a, round(var_b, 6) AS var_b,
       round({WELCH_T}, 6) AS t_stat,
       round({WELCH_DOF}, 6) AS dof
FROM s1
"""


# --------------------- RFM quartile segmentation ---------------------

_US_PER_DAY = 86_400_000_000


def q_events_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per user, recency (whole days since the
    user's last event, anchored at the global latest event), frequency
    (event count), monetary (exact decimal value sum), each cut into
    quartiles by ntile(4) with a user_id tie-break so the quartile
    boundary is total-ordered and engine-identical; rfm_code packs the
    three digits. Recency arithmetic is integer microseconds
    (unix_micros // us_per_day — no timezone, no date truncation).

    Scale note: the three ntile windows are global single-partition
    sorts over the USER-level frame (already aggregated — users, not
    events). For planetary user counts, replace ntile with
    approx-quantile cut points (the quantiles_approx pattern) and a
    broadcast range join; exact ntile is kept here because the oracle
    value-checks the quartile boundary semantics themselves."""
    e = read_testdata_table(spark, sf_dir, "events")
    per = (
        e.groupBy("user_id")
        .agg(
            F.max(F.unix_micros(F.col("ts"))).alias("last_us"),
            F.count(F.lit(1)).cast("long").alias("frequency"),
            F.sum(
                F.col("value").cast("decimal(18,6)").cast("decimal(38,6)")
            ).cast("double").alias("monetary"),
        )
        # feeds the anchor aggregate AND the final projection — the
        # double-referenced-frame discipline
        .localCheckpoint(eager=False)
    )
    anchor = per.agg(F.max("last_us").alias("anchor_us"))
    base = per.crossJoin(F.broadcast(anchor)).select(
        "user_id",
        F.expr(f"(anchor_us - last_us) div {_US_PER_DAY}").alias(
            "recency_days"
        ),
        "frequency",
        "monetary",
    )
    r_q = F.ntile(4).over(
        W.orderBy(F.asc("recency_days"), F.asc("user_id"))
    ).cast("long")
    f_q = F.ntile(4).over(
        W.orderBy(F.desc("frequency"), F.asc("user_id"))
    ).cast("long")
    m_q = F.ntile(4).over(
        W.orderBy(F.desc("monetary"), F.asc("user_id"))
    ).cast("long")
    return base.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary",
        r_q.alias("r_q"),
        f_q.alias("f_q"),
        m_q.alias("m_q"),
    ).withColumn(
        "rfm_code",
        F.col("r_q") * 100 + F.col("f_q") * 10 + F.col("m_q"),
    )


_RFM_ORACLE = f"""
WITH per AS (
  SELECT user_id,
         max(epoch_us(CAST(ts AS TIMESTAMP))) AS last_us,
         CAST(count(*) AS BIGINT) AS frequency,
         CAST(sum(CAST(CAST(value AS DECIMAL(18,6)) AS DECIMAL(38,6)))
              AS DOUBLE) AS monetary
  FROM events GROUP BY user_id
), anc AS (SELECT max(last_us) AS anchor_us FROM per),
base AS (
  SELECT user_id,
         CAST((anchor_us - last_us) // {_US_PER_DAY} AS BIGINT)
           AS recency_days,
         frequency, monetary
  FROM per CROSS JOIN anc
), q AS (
  SELECT user_id, recency_days, frequency, monetary,
         CAST(ntile(4) OVER (ORDER BY recency_days, user_id) AS BIGINT)
           AS r_q,
         CAST(ntile(4) OVER (ORDER BY frequency DESC, user_id) AS BIGINT)
           AS f_q,
         CAST(ntile(4) OVER (ORDER BY monetary DESC, user_id) AS BIGINT)
           AS m_q
  FROM base
)
SELECT user_id, recency_days, frequency, monetary, r_q, f_q, m_q,
       r_q * 100 + f_q * 10 + m_q AS rfm_code
FROM q
"""


# --------------------- two-feature OLS ---------------------


def q_stats_multi_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-feature closed-form least squares per return flag
    (stats/regression.py:group_ols2): extendedprice ~ quantity +
    discount — multiple regression as ten exact decimal moments and a
    Cramer 3×3 solve, no iteration. The coefficient and R² expressions
    are the OLS2_* texts the oracle evaluates verbatim."""
    from ..stats.regression import group_ols2

    li = read_testdata_table(spark, sf_dir, "lineitem")
    return group_ols2(
        li,
        group_cols=["l_returnflag"],
        x1_col="l_quantity",
        x2_col="l_discount",
        y_col="l_extendedprice",
    )


def _multi_ols_oracle() -> str:
    d = "DECIMAL(19,2)"

    def dsum(expr: str, scale: int) -> str:
        return f"CAST(sum(CAST({expr} AS DECIMAL(38,{scale}))) AS DOUBLE)"

    x1 = f"CAST(l_quantity AS {d})"
    x2 = f"CAST(l_discount AS {d})"
    y = f"CAST(l_extendedprice AS {d})"
    return f"""
WITH m AS (
  SELECT l_returnflag,
         CAST(count(*) AS BIGINT) AS n,
         {dsum(x1, 2)} AS s1,
         {dsum(x2, 2)} AS s2,
         {dsum(y, 2)} AS sy,
         {dsum(f"{x1} * {x1}", 4)} AS s11,
         {dsum(f"{x2} * {x2}", 4)} AS s22,
         {dsum(f"{x1} * {x2}", 4)} AS s12,
         {dsum(f"{x1} * {y}", 4)} AS s1y,
         {dsum(f"{x2} * {y}", 4)} AS s2y,
         {dsum(f"{y} * {y}", 4)} AS syy
  FROM lineitem GROUP BY l_returnflag
), m2 AS (
  SELECT l_returnflag, n, CAST(n AS DOUBLE) AS nd,
         s1, s2, sy, s11, s22, s12, s1y, s2y, syy
  FROM m
), solved AS (
  SELECT l_returnflag, n, nd, sy, s1y, s2y, syy,
         {OLS2_B0} AS b0,
         {OLS2_B1} AS b1,
         {OLS2_B2} AS b2
  FROM m2
)
SELECT l_returnflag, n,
       round(b0, 6) AS b0, round(b1, 6) AS b1, round(b2, 6) AS b2,
       round({OLS2_R2}, 6) AS r2
FROM solved
"""


QUERIES: dict[str, QuerySpec] = {
    "sketch_hll_set_ops": QuerySpec(
        "sketch_hll_set_ops", q_sketch_hll_set_ops, _hll_set_ops_oracle(),
        "Pairwise HLL union/intersection/Jaccard set algebra",
    ),
    "graph_bfs_distances": QuerySpec(
        "graph_bfs_distances", q_graph_bfs_distances, _bfs_oracle(),
        "Multi-source BFS hop distances over the trading graph",
    ),
    "stats_welch_ttest": QuerySpec(
        "stats_welch_ttest", q_stats_welch_ttest, _welch_oracle(),
        "Welch's unequal-variance two-sample t per event type",
    ),
    "events_rfm_segments": QuerySpec(
        "events_rfm_segments", q_events_rfm_segments, _RFM_ORACLE,
        "RFM quartile segmentation with engine-identical ntile cuts",
    ),
    "stats_multi_ols": QuerySpec(
        "stats_multi_ols", q_stats_multi_ols, _multi_ols_oracle(),
        "Two-feature closed-form OLS via Cramer normal equations",
    ),
}
