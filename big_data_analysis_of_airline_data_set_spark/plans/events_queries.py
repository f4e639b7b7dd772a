"""Events/streaming query catalog — batch-mode runs of the
DataFrame-symmetric window transforms (streaming.windows), each with a
DuckDB oracle, plus ONE true Structured Streaming execution
(``events_tumbling_stream``): the same tumbling aggregation run as a
watermarked availableNow stream over landed parquet and drained to a
memory sink. Complete output mode emits every window, so the drained
result equals the batch plan — the batch oracle doubles as a hard
check on the streaming runtime (micro-batch scheduling, watermark
bookkeeping, state store). Further streaming behavior (update mode,
late-data drops, stateful dedup) stays in tests/test_streaming*.py —
those runtimes are inherently non-SQL-expressible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..caching import BoundedCache
from ..sources.readers import read_testdata_table
from ..streaming.windows import (
    json_extract_k,
    session_counts,
    sliding_counts,
    tumbling_counts,
)
from .spec import QuerySpec


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_testdata_table(spark, sf_dir, "events")


def q_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tumbling_counts(_events(spark, sf_dir), width="1 hour")


_TUMBLING_ORACLE = """
SELECT strftime(time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)),
                '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       count(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1, 2
"""


# landed-events dirs per (session, sf_dir, variant): the stream queries
# re-read them across driver calls without re-landing (same pattern as
# the IVF index cache in plans/content.py). ONE BoundedCache owns the
# eviction/cleanup for all three landing variants (normal, doubled,
# flat) — evicting removes the dir, and atexit clears everything
# (round-3 advice: bounded, no leaked copies; round-4 review: no
# copy-pasted eviction loops).
def _evict_landed(key: tuple, path: str) -> None:
    import shutil

    shutil.rmtree(path, ignore_errors=True)


_LANDED_CACHE: BoundedCache[tuple, str] = BoundedCache(4, on_evict=_evict_landed)
_CLEANUP_REGISTERED = False


def _landed_dir(spark: SparkSession, key: tuple, prefix: str, build) -> str:
    """Shared landing-cache access: ``build(out_dir)`` materializes the
    variant on a miss."""
    import atexit
    import tempfile

    global _CLEANUP_REGISTERED
    hit = _LANDED_CACHE.get(key)
    if hit is None:
        if not _CLEANUP_REGISTERED:
            atexit.register(_LANDED_CACHE.clear)
            _CLEANUP_REGISTERED = True
        hit = tempfile.mkdtemp(prefix=prefix)
        build(hit)
        _LANDED_CACHE.put(key, hit)
    return hit


def _landed_events_dir(spark: SparkSession, sf_dir: str) -> str:
    from ..streaming.landing import land_events_batch

    return _landed_dir(
        spark,
        (spark.sparkContext.applicationId, sf_dir),
        "landed_events_",
        lambda out: land_events_batch(spark, sf_dir, out),
    )


def ensure_events_landed(spark: SparkSession, sf_dir: str) -> str:
    """Public warm-up hook: land ``sf_dir``'s events table now so a
    later timed streaming query doesn't absorb the one-time landing
    copy (bench.py calls this before its timed passes)."""
    return _landed_events_dir(spark, sf_dir)


def _landed_events_doubled_dir(spark: SparkSession, sf_dir: str) -> str:
    """Every event landed TWICE (two appended writes → distinct files):
    the at-least-once delivery shape a streaming dedup exists to fix."""
    from ..sources.readers import read_testdata_table

    def build(out: str) -> None:
        ev = read_testdata_table(spark, sf_dir, "events")
        ev.repartition(2).write.mode("append").parquet(out)
        ev.repartition(3).write.mode("append").parquet(out)

    return _landed_dir(
        spark,
        (spark.sparkContext.applicationId, sf_dir, "doubled"),
        "landed_events_x2_",
        build,
    )


def _landed_events_flat_dir(spark: SparkSession, sf_dir: str, n_files: int = 4) -> str:
    """Events landed as a FLAT n-file directory (no date partitioning):
    with maxFilesPerTrigger=1 each file becomes one micro-batch, so a
    stateful query provably carries state ACROSS batches while the
    drain stays bounded at n micro-batches."""
    from ..sources.readers import read_testdata_table

    def build(out: str) -> None:
        read_testdata_table(spark, sf_dir, "events").repartition(
            n_files
        ).write.mode("overwrite").parquet(out)

    return _landed_dir(
        spark,
        (spark.sparkContext.applicationId, sf_dir, "flat", n_files),
        "landed_events_flat_",
        build,
    )


def q_user_totals_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState) driver-checked:
    per-user running totals carried across 4 file-granular micro-batches
    must equal the batch groupBy — the state store's load/update cycle
    is what the oracle certifies. State accumulates integer cents, so
    the result is batch-order-exact (streaming/stateful.py)."""
    from ..streaming.stateful import running_user_totals_stream

    return running_user_totals_stream(
        spark,
        _landed_events_flat_dir(spark, sf_dir),
        query_name="events_user_totals_stream",
        max_files_per_trigger=1,
        stream_shuffle_partitions=8,
    )


_USER_TOTALS_STREAM_ORACLE = """
SELECT user_id,
       count(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events GROUP BY user_id
"""


def q_dedup_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup under at-least-once delivery: every event
    is landed twice, the watermarked ``dropDuplicatesWithinWatermark``
    stream must emit each event_id exactly once — oracled against the
    plain batch projection of the (single-copy) events table. Exercises
    the streaming dedup state store with REAL duplicate traffic."""
    from ..streaming.jobs import run_dedup_stream_available_now

    return run_dedup_stream_available_now(
        spark,
        _landed_events_doubled_dir(spark, sf_dir),
        watermark="30 minutes",
        # the doubled landing's files each span the full time range —
        # single-batch drain, else later files are late-dropped
        max_files_per_trigger=None,
        # state-store commits scale with partition count; size to
        # harness-scale state volume, not the batch shuffle default
        stream_shuffle_partitions=8,
    )


def q_tumbling_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tumbling aggregation as a REAL streaming query: land the
    (encoding-normalized) events once, then readStream → watermark →
    window agg → memory sink with trigger(availableNow) — the idiomatic
    backfill execution. Complete mode ⇒ result equals the batch plan."""
    from ..streaming.jobs import run_tumbling_stream_available_now

    landed = _landed_events_dir(spark, sf_dir)
    result = run_tumbling_stream_available_now(
        spark,
        landed,
        watermark="30 minutes",
        width="1 hour",
        # backfill shape: drain in as few micro-batches as possible —
        # file-granular triggering is the tests' incremental-state knob
        max_files_per_trigger=None,
        # state-store commits scale with partition count; size to
        # harness-scale state volume, not the batch shuffle default
        stream_shuffle_partitions=8,
    )
    return result


_KMV_STREAM_K = 64


def q_kmv_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type via a KMV sketch maintained
    INCREMENTALLY by the streaming runtime (streaming.jobs
    run_kmv_sketch_stream_available_now): the streaming state IS the
    sketch — groups × k longs, constant for any stream volume, which is
    why no watermark is needed. Estimates, the merged union row, and
    the exact reference counts are computed over the drained sketch in
    batch (the production split: streams maintain sketches, queries
    read them). Oracle = full batch md5 replay, so the incremental
    min-maintenance must converge to exactly the batch sketch."""
    from ..sketches.kmv import kmv_report
    from ..streaming.jobs import run_kmv_sketch_stream_available_now

    sk = run_kmv_sketch_stream_available_now(
        spark,
        _landed_events_dir(spark, sf_dir),
        k=_KMV_STREAM_K,
        max_files_per_trigger=None,
        stream_shuffle_partitions=8,
    )
    # the merge/estimate/exact assembly is SHARED with the batch query
    # (sketches.kmv.kmv_report) — only the sketch's provenance differs
    return kmv_report(
        sk, _events(spark, sf_dir), group_col="event_type", value_col="user_id"
    )


# oracle shared with the batch KMV entry — one builder, different base
from .patterns import kmv_oracle_sql as _kmv_oracle_sql  # noqa: E402

_KMV_STREAM_ORACLE = _kmv_oracle_sql(
    'SELECT event_type AS "group", CAST(user_id AS VARCHAR) AS val FROM events',
    _KMV_STREAM_K,
)


_HLL_STREAM_P = 8


def q_hll_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type via an HLL register sketch
    maintained INCREMENTALLY by the streaming runtime (streaming.jobs
    run_hll_sketch_stream_available_now) — the max-merge twin of
    events_kmv_stream: state is groups × ≤2^p small ints, constant for
    any stream volume. Estimates, the merged 'ALL' row, and the exact
    reference counts are computed over the drained register table in
    batch; the assembly is SHARED with the batch query
    (sketches.hll.hll_report), so the estimator cannot diverge between
    paths. Oracle = full batch md5 replay: incremental max-maintenance
    must converge to exactly the batch sketch."""
    from ..sketches.hll import hll_report
    from ..streaming.jobs import run_hll_sketch_stream_available_now

    regs = run_hll_sketch_stream_available_now(
        spark,
        _landed_events_dir(spark, sf_dir),
        p=_HLL_STREAM_P,
        max_files_per_trigger=None,
        stream_shuffle_partitions=8,
    )
    return hll_report(
        regs,
        _events(spark, sf_dir),
        group_col="event_type",
        value_col="user_id",
        p=_HLL_STREAM_P,
    )


from .patterns import hll_oracle_sql as _hll_oracle_sql  # noqa: E402

_HLL_STREAM_ORACLE = _hll_oracle_sql(
    'SELECT event_type AS "group", CAST(user_id AS VARCHAR) AS val FROM events',
    _HLL_STREAM_P,
)


_HDR_STREAM_SUB_BITS = 5


def q_hdr_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value quantiles (p50/p90/p99) per event type via an HDR bucket
    sketch maintained INCREMENTALLY by the streaming runtime
    (streaming.jobs.run_hdr_sketch_stream_available_now) — the RANK
    member of the streamed sketch family: state is groups × ≤ ~1.9k
    bucket counts, constant for any stream volume (no watermark
    needed, complete-mode output cheap). Estimates, the additive-merge
    'ALL' row, and the true-rank reference are computed over the
    drained bucket table in batch; the assembly is SHARED with the
    batch query (sketches.quantile.hdr_quantile_report), so the
    estimator cannot diverge between paths. Oracle = full batch
    integer replay: incremental count-maintenance must converge to
    exactly the batch sketch."""
    from ..sketches.quantile import hdr_quantile_report
    from ..streaming.jobs import run_hdr_sketch_stream_available_now

    sk = run_hdr_sketch_stream_available_now(
        spark,
        _landed_events_dir(spark, sf_dir),
        group_col="event_type",
        value_col="value",
        sub_bits=_HDR_STREAM_SUB_BITS,
        max_files_per_trigger=None,
        stream_shuffle_partitions=8,
    )
    return hdr_quantile_report(
        sk,
        _events(spark, sf_dir),
        group_col="event_type",
        value_col="value",
        sub_bits=_HDR_STREAM_SUB_BITS,
    )


from .patterns import hdr_oracle_sql as _hdr_oracle_sql  # noqa: E402

_HDR_STREAM_ORACLE = _hdr_oracle_sql(
    'SELECT event_type AS "group", value AS val FROM events',
    _HDR_STREAM_SUB_BITS,
)


_HLL_SLIDE_P = 8
_HLL_SLIDE_W = 3  # trailing 3-hour window, anchored per observed hour


def q_hll_sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window distinct users per (event_type, hour) via
    sliding HLL register merge (sketches.hll.hll_trailing_merge) — the
    op register sketches exist for: per-bucket vectors are built ONCE
    from the raw events, then every trailing 3-hour window is a
    scatter + max-merge over register rows (shuffle = W × registers
    per bucket, CONSTANT in event volume), never a re-scan of W hours
    of raw data per anchor. The exact trailing distinct rides along as
    the accuracy reference, computed scalably the same way (per-bucket
    dedup → scatter → count_distinct; no range join). Hour buckets are
    integer unix_micros div 3.6e9 — exact in both engines. Estimates
    replay exactly (the shared hll_sql_parts discipline). The
    projected base feeds THREE consumers (register build, exact-side
    dedup, anchors) — a lazy localCheckpoint computes the events scan
    once (round-6 review catch; the same shared-frame pattern as
    resample_ffill)."""
    from pyspark.sql import functions as F

    from ..sketches.hll import hll_estimate, hll_registers, hll_trailing_merge

    base = _events(spark, sf_dir).select(
        "event_type",
        F.expr("unix_micros(ts) div 3600000000").alias("hour_bucket"),
        F.col("user_id").cast("string").alias("val"),
    ).localCheckpoint(eager=False)
    regs = hll_registers(
        base,
        group_cols=["event_type", "hour_bucket"],
        value_col="val",
        p=_HLL_SLIDE_P,
    )
    merged = hll_trailing_merge(
        regs,
        bucket_col="hour_bucket",
        group_cols=["event_type"],
        window_buckets=_HLL_SLIDE_W,
    )
    est = hll_estimate(
        merged, p=_HLL_SLIDE_P, group_cols=("event_type", "hour_bucket")
    )
    dedup = base.distinct()
    scattered = dedup.select(
        "event_type",
        F.explode(
            F.sequence(
                F.col("hour_bucket"),
                F.col("hour_bucket") + (_HLL_SLIDE_W - 1),
            )
        ).alias("hour_bucket"),
        "val",
    )
    anchors = base.select("event_type", "hour_bucket").distinct()
    exact = (
        scattered.join(anchors, ["event_type", "hour_bucket"], "left_semi")
        .groupBy("event_type", "hour_bucket")
        .agg(F.count_distinct("val").alias("exact_distinct"))
    )
    return est.join(exact, ["event_type", "hour_bucket"]).select(
        "event_type",
        "hour_bucket",
        "m_registers",
        "zero_registers",
        "hll_estimate",
        "exact_distinct",
    )


def _hll_sliding_oracle() -> str:
    # every estimator-critical fragment (hash, rank CASE, term scaling,
    # ln table, numerator) comes from the ONE shared builder —
    # plans.patterns.hll_sql_parts — so this oracle cannot drift from
    # the batch/streamed ones (round-6 review dedup finding)
    from .patterns import hll_sql_parts

    w = _HLL_SLIDE_W
    q = hll_sql_parts(_HLL_SLIDE_P)
    return f"""
WITH base AS (
  SELECT event_type,
         epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS hour_bucket,
         CAST(user_id AS VARCHAR) AS val
  FROM events
), hashed AS (
  SELECT event_type, hour_bucket, {q["hash_expr"]} AS h FROM base
), regs AS (
  SELECT event_type, hour_bucket, h // {1 << q["sb"]} AS register,
         max({q["rank_case"]}) AS max_rho
  FROM hashed GROUP BY 1, 2, 3
), anchors AS (
  SELECT DISTINCT event_type, hour_bucket FROM base
), scattered AS (
  SELECT r.event_type, r.hour_bucket + j.j AS hour_bucket,
         register, max_rho
  FROM regs r CROSS JOIN (SELECT unnest(generate_series(0, {w - 1})) AS j) j
), merged AS (
  SELECT s.event_type, s.hour_bucket, s.register, max(s.max_rho) AS max_rho
  FROM scattered s JOIN anchors USING (event_type, hour_bucket)
  GROUP BY 1, 2, 3
), agg AS (
  SELECT event_type, hour_bucket,
         CAST({q["m"]} - count(*) AS BIGINT) AS zero_registers,
         sum({q["term_sql"]}) AS s_present
  FROM merged GROUP BY 1, 2
), lc(v, lc_est) AS (VALUES
    {q["lc_rows"]}
), est AS (
  SELECT event_type, hour_bucket, zero_registers,
         {q["numerator"]!r} / CAST(s_present
             + CAST(zero_registers AS DECIMAL(38,0))
               * {q["zero_term"]} AS DOUBLE) AS e_raw
  FROM agg
), dedup AS (
  SELECT DISTINCT event_type, hour_bucket, val FROM base
), scat2 AS (
  SELECT d.event_type, d.hour_bucket + j.j AS hour_bucket, val
  FROM dedup d CROSS JOIN (SELECT unnest(generate_series(0, {w - 1})) AS j) j
), exact AS (
  SELECT s.event_type, s.hour_bucket,
         CAST(count(DISTINCT val) AS BIGINT) AS exact_distinct
  FROM scat2 s JOIN anchors USING (event_type, hour_bucket)
  GROUP BY 1, 2
)
SELECT est.event_type, est.hour_bucket,
       CAST({q["m"]} AS BIGINT) AS m_registers, zero_registers,
       round(CASE WHEN e_raw <= {q["lc_bound"]!r} AND zero_registers > 0
                  THEN (SELECT lc_est FROM lc WHERE v = zero_registers)
                  ELSE e_raw END, 6) AS hll_estimate,
       exact_distinct
FROM est JOIN exact USING (event_type, hour_bucket)
"""


_CMS_STREAM_DEPTH, _CMS_STREAM_WIDTH, _CMS_STREAM_K = 4, 1024, 20


def q_cms_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event frequencies via a Count-Min sketch maintained
    INCREMENTALLY by the streaming runtime (streaming.jobs
    run_cms_sketch_stream_available_now) — the sum-merge member that
    completes the streamed sketch trio (KMV min / HLL max / CMS sum):
    state is the d×w cell table, constant for any stream volume. The
    exact top-20 users and their probe estimates are assembled in
    batch by the SAME heavy_hitters_report the batch catalog entry
    uses. Oracle = full batch md5 replay: incremental count
    maintenance must converge to exactly the batch sketch."""
    from pyspark.sql import functions as F

    from ..sketches.countmin import heavy_hitters_report
    from ..streaming.jobs import run_cms_sketch_stream_available_now

    cells = run_cms_sketch_stream_available_now(
        spark,
        _landed_events_dir(spark, sf_dir),
        depth=_CMS_STREAM_DEPTH,
        width=_CMS_STREAM_WIDTH,
        max_files_per_trigger=None,
        stream_shuffle_partitions=8,
    )
    occ = _events(spark, sf_dir).select(
        F.col("user_id").cast("string").alias("term")
    )
    return heavy_hitters_report(
        cells,
        occ,
        term_col="term",
        k=_CMS_STREAM_K,
        depth=_CMS_STREAM_DEPTH,
        width=_CMS_STREAM_WIDTH,
    )


from .patterns import count_min_oracle_sql as _cms_oracle_sql  # noqa: E402

_CMS_STREAM_ORACLE = _cms_oracle_sql(
    "SELECT CAST(user_id AS VARCHAR) AS term FROM events",
    _CMS_STREAM_DEPTH,
    _CMS_STREAM_WIDTH,
    _CMS_STREAM_K,
)


_SS_M = 4  # counters per group: 9-ish live buckets force real evictions


def q_spacesaving_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SpaceSaving / Misra-Gries streamed top-k heavy hitters
    (sketches/spacesaving.py): per event_type, a 4-counter summary of
    the |value| bit-length buckets folded across 4 file-granular
    micro-batches via the mergeable-summaries MG step — the
    deletion-free COUNTER-SET member that completes the streamed
    sketch family (min/max/sum/rank/counter-set).

    The tracked counters are inherently batch-order-dependent (micro-
    batch boundaries are not SQL-replayable), so the catalog output is
    the deterministic part: exact group sizes, the guaranteed-heavy-
    hitter count (c·(m+1) > n — integer compare), and the three MG
    theorem verdicts (every guaranteed HH tracked; w ≤ c ≤ w + D per
    tracked key; D·(m+1) ≤ n), plus stream-vs-batch row-count
    equality — the ml_*_banded evidentiary pattern: booleans oracled
    as constants, counts oracled exactly."""
    from pyspark.sql import functions as F

    from ..sketches.spacesaving import (
        ITEM_SQL,
        spacesaving_invariants_report,
        spacesaving_stream,
    )

    summaries = spacesaving_stream(
        spark,
        _landed_events_flat_dir(spark, sf_dir),
        m=_SS_M,
        query_name="events_spacesaving_stream",
        max_files_per_trigger=1,
        # state = m counters × 5 event types; every micro-batch commits
        # one state store per partition, so width tracks the GROUP
        # count, not the session's batch default (measured: 4.0 s at 8
        # partitions vs 3.2 s at 2, identical results — the
        # jobs._run_to_memory sizing rule)
        stream_shuffle_partitions=2,
    )
    exact = (
        _events(spark, sf_dir)
        .filter(F.col("event_type").isNotNull())
        .select("event_type", F.expr(ITEM_SQL).alias("item"))
        .groupBy("event_type", "item")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    report = spacesaving_invariants_report(summaries, exact, m=_SS_M)
    return report.join(
        summaries.select("event_type", "n_seen"), "event_type"
    ).select(
        "event_type",
        "n_events",
        "n_guaranteed_hh",
        "all_hh_tracked",
        "bounds_valid",
        "decrement_within_bound",
        (F.col("n_seen") == F.col("n_events")).alias("stream_count_matches"),
    )


_SS_STREAM_ORACLE = f"""
WITH it AS (
  SELECT event_type,
         least(15, length(bin(greatest(1,
             CAST(floor(abs(coalesce(value, 0.0))) AS BIGINT))))) AS item
  FROM events WHERE event_type IS NOT NULL
), cnt AS (
  SELECT event_type, item, CAST(count(*) AS BIGINT) AS c
  FROM it GROUP BY 1, 2
), tot AS (
  SELECT event_type, CAST(sum(c) AS BIGINT) AS n_events
  FROM cnt GROUP BY 1
)
SELECT t.event_type, t.n_events,
       CAST(coalesce((SELECT count(*) FROM cnt
                      WHERE cnt.event_type = t.event_type
                        AND c * {_SS_M + 1} > t.n_events), 0) AS BIGINT)
         AS n_guaranteed_hh,
       TRUE AS all_hh_tracked,
       TRUE AS bounds_valid,
       TRUE AS decrement_within_bound,
       TRUE AS stream_count_matches
FROM tot t
"""


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over each user's event
    stream: P(next event type | current), from lag pairs ordered by
    (ts, event_id) within user — the behavioral-model fit step
    (next-action prediction, anomaly scoring against the matrix).
    One window shuffle on user_id + one pair aggregate; probabilities
    are exact-count ratios rounded at display."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    pairs = (
        ev.select("user_id", "ts", "event_id", "event_type")
        .withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    wf = Window.partitionBy("from_type")
    return pairs.select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(wf), 6).alias("p"),
    )


_TRANSITIONS_ORACLE = """
WITH ordered AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (
             PARTITION BY user_id ORDER BY ts ASC, event_id ASC
         ) AS next_type
  FROM events
), pairs AS (
  SELECT event_type AS from_type, next_type AS to_type,
         CAST(count(*) AS BIGINT) AS n
  FROM ordered WHERE next_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT from_type, to_type, n,
       round(CAST(n AS DOUBLE)
             / sum(n) OVER (PARTITION BY from_type), 6) AS p
FROM pairs
"""


def q_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sliding_counts(_events(spark, sf_dir), width="1 hour", slide="30 minutes")


def q_sliding_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sliding aggregation under the real streaming runtime
    (availableNow drain, complete mode) — oracled ≡ batch."""
    from ..streaming.jobs import run_sliding_stream_available_now

    return run_sliding_stream_available_now(
        spark,
        _landed_events_dir(spark, sf_dir),
        watermark="30 minutes",
        width="1 hour",
        slide="30 minutes",
        max_files_per_trigger=None,
        # state-store commits scale with partition count; size to
        # harness-scale state volume, not the batch shuffle default
        stream_shuffle_partitions=8,
    )


def q_enrich_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STATIC enrichment join under the real streaming runtime
    (streaming/jobs.py:run_enrich_stream_available_now): the event
    stream is broadcast-joined per micro-batch to the customer
    dimension (stateless), then window-aggregated per market segment
    (the only stateful operator). Oracled ≡ the batch join+window."""
    from pyspark.sql import functions as F

    from ..sources.readers import read_testdata_table
    from ..streaming.jobs import run_enrich_stream_available_now

    dim = read_testdata_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("dim_key"),
        F.col("c_mktsegment").alias("segment"),
    )
    return run_enrich_stream_available_now(
        spark,
        _landed_events_dir(spark, sf_dir),
        dim,
        watermark="30 minutes",
        width="1 hour",
        max_files_per_trigger=None,
        stream_shuffle_partitions=8,
    )


_ENRICH_STREAM_ORACLE = """
SELECT strftime(time_bucket(INTERVAL '1 hour', CAST(e.ts AS TIMESTAMP)),
                '%Y-%m-%d %H:%M:%S') AS window_start,
       coalesce(c.c_mktsegment, 'UNKNOWN') AS segment,
       count(*) AS n_events,
       CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1, 2
"""


def q_upsert_sink_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming UPSERT sink (streaming/jobs.py
    run_upsert_sink_stream_available_now): micro-batches merge into a
    keyed parquet state via foreachBatch (generation-swap writes);
    the final serving table must equal the batch latest-event-per-user
    — which is exactly what the oracle computes. max_files_per_trigger
    = 4 forces MULTIPLE merge generations over the landed directory,
    so the cross-batch upsert path executes, not just the first-batch
    bootstrap."""
    from pyspark.sql import functions as F

    from ..streaming.jobs import run_upsert_sink_stream_available_now

    out = run_upsert_sink_stream_available_now(
        spark,
        _landed_events_dir(spark, sf_dir),
        max_files_per_trigger=4,
    )
    return out.select(
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
        F.col("event_id").alias("last_event_id"),
        F.col("value").alias("last_value"),
    )


_UPSERT_SINK_ORACLE = """
WITH ranked AS (
  SELECT user_id, ts, event_id, value,
         row_number() OVER (
           PARTITION BY user_id ORDER BY ts DESC, event_id DESC, value DESC
         ) AS rn
  FROM events
)
SELECT user_id,
       strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS last_ts,
       event_id AS last_event_id,
       value AS last_value
FROM ranked WHERE rn = 1
"""


def q_session_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The session-window aggregation under the real streaming runtime
    — the state-heavy case (merging windows) — oracled ≡ batch."""
    from ..streaming.jobs import run_session_stream_available_now

    return run_session_stream_available_now(
        spark,
        _landed_events_dir(spark, sf_dir),
        watermark="30 minutes",
        gap="5 minutes",
        max_files_per_trigger=None,
        # state-store commits scale with partition count; size to
        # harness-scale state volume, not the batch shuffle default
        stream_shuffle_partitions=8,
    )


# An event at t belongs to the two 1h windows starting at floor30(t) and
# floor30(t) - 30min (width/slide = 2 overlapping windows).
_SLIDING_ORACLE = """
WITH placed AS (
  SELECT time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP)) AS window_start,
         event_type FROM events
  UNION ALL
  SELECT time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP)) - INTERVAL '30 minutes',
         event_type FROM events
)
SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type, count(*) AS n_events
FROM placed GROUP BY 1, 2
"""


def q_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_counts(_events(spark, sf_dir), gap="5 minutes")


# Gaps-and-islands: a new session starts when the gap from the previous
# event of the same user is >= 5 minutes (session_window's end-exclusive
# [start, last+gap) semantics).
_SESSION_ORACLE = """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   >= INTERVAL '5 minutes'
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events
), islands AS (
  SELECT user_id, ts,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS session_no
  FROM marked
)
SELECT user_id,
       strftime(CAST(min(ts) AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS session_start,
       count(*) AS n_events
FROM islands GROUP BY user_id, session_no
"""


_DEDUP_STREAM_ORACLE = """
SELECT event_id, user_id, event_type, value FROM events
"""


def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First- and last-touch attribution: each purchase credits the
    FIRST and the LAST click by the same user inside the 10-minute
    lookback. Scale shape: the bounded interval join (same predicate as
    events_interval_join) followed by one min/max aggregate per
    purchase — no window function, no unbounded state; deterministic
    because (c_ts, click_id) ordering is total."""
    from pyspark.sql import functions as F

    ev = _events(spark, sf_dir)
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), F.col("ts").alias("p_ts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    joined = p.join(
        c,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 10 MINUTES")),
    )
    # struct min/max orders by (ts, id) lexicographically → total order
    touch = F.struct(F.col("c_ts"), F.col("click_id"))
    return (
        joined.groupBy("user_id", "purchase_id")
        .agg(
            F.min(touch).getField("click_id").alias("first_touch_click"),
            F.max(touch).getField("click_id").alias("last_touch_click"),
            F.count(F.lit(1)).alias("n_touches"),
        )
    )


_ATTRIBUTION_ORACLE = """
WITH pairs AS (
  SELECT p.user_id, p.event_id AS purchase_id, c.event_id AS click_id, c.ts AS c_ts
  FROM (SELECT * FROM events WHERE event_type = 'purchase') p
  JOIN (SELECT * FROM events WHERE event_type = 'click') c
    ON p.user_id = c.user_id
   AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL '10 minutes'
)
SELECT user_id, purchase_id,
       (min(struct_pack(t := c_ts, i := click_id))).i AS first_touch_click,
       (max(struct_pack(t := c_ts, i := click_id))).i AS last_touch_click,
       count(*) AS n_touches
FROM pairs GROUP BY user_id, purchase_id
"""


def q_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day distinct active users per day — the DAU/WAU
    hypertable staple. Scale shape: dedupe to (user, day) FIRST (one
    shuffle that collapses the event volume), then each (user, day)
    contributes to ≤7 window days via a generated-sequence explode, and
    the per-day distinct count partially aggregates map-side. No
    self-join over raw events, no unbounded window frame."""
    from pyspark.sql import functions as F

    ev = _events(spark, sf_dir)
    user_days = ev.select(
        F.to_date("ts").alias("day"), "user_id"
    ).distinct()
    contrib = user_days.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
        ).alias("window_day"),
    )
    # active days derive from the already-collapsed (user, day) table —
    # no second scan of the raw event volume for a ~hundreds-row set
    active_days = user_days.select(F.col("day").alias("window_day")).distinct()
    return (
        contrib.join(active_days, "window_day")
        .groupBy("window_day")
        .agg(F.count_distinct("user_id").alias("active_users_7d"))
        .select(
            F.date_format("window_day", "yyyy-MM-dd").alias("window_day"),
            "active_users_7d",
        )
    )


_ROLLING_ACTIVE_ORACLE = """
WITH ud AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
), days AS (
  SELECT DISTINCT CAST(ts AS DATE) AS window_day FROM events
)
SELECT strftime(d.window_day, '%Y-%m-%d') AS window_day,
       count(DISTINCT u.user_id) AS active_users_7d
FROM days d
JOIN ud u ON u.day BETWEEN d.window_day - INTERVAL 6 DAY AND d.window_day
GROUP BY 1
"""


def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    return json_extract_k(_events(spark, sf_dir))


_JSON_ORACLE = """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events
"""


def q_multi_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.rollup import multi_granularity_rollup

    return multi_granularity_rollup(_events(spark, sf_dir))


_MULTI_ROLLUP_ORACLE = """
WITH minute AS (
  SELECT date_trunc('minute', CAST(ts AS TIMESTAMP)) AS bucket, event_type,
         count(*) AS n_events, SUM(CAST(value AS DECIMAL(18,2))) AS sum_dec
  FROM events GROUP BY 1, 2
), hour AS (
  SELECT date_trunc('hour', bucket) AS bucket, event_type,
         CAST(sum(n_events) AS BIGINT) AS n_events, sum(sum_dec) AS sum_dec
  FROM minute GROUP BY 1, 2
), day AS (
  SELECT date_trunc('day', bucket) AS bucket, event_type,
         CAST(sum(n_events) AS BIGINT) AS n_events, sum(sum_dec) AS sum_dec
  FROM hour GROUP BY 1, 2
)
SELECT 'minute' AS grain, strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket_start,
       event_type, n_events, CAST(sum_dec AS DOUBLE) AS sum_value FROM minute
UNION ALL
SELECT 'hour', strftime(bucket, '%Y-%m-%d %H:%M:%S'), event_type, n_events,
       CAST(sum_dec AS DOUBLE) FROM hour
UNION ALL
SELECT 'day', strftime(bucket, '%Y-%m-%d %H:%M:%S'), event_type, n_events,
       CAST(sum_dec AS DOUBLE) FROM day
"""


def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch interval join: each purchase paired with every click by the
    same user in the preceding 10 minutes — the batch twin of the
    watermarked stream-stream join (tests/test_streaming_join.py runs
    the same predicate as a real stream-stream join)."""
    ev = _events(spark, sf_dir)
    from pyspark.sql import functions as F

    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), F.col("ts").alias("p_ts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    return (
        p.join(
            c,
            (F.col("user_id") == F.col("c_user"))
            & (F.col("c_ts") <= F.col("p_ts"))
            & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 10 MINUTES")),
        )
        .select("user_id", "purchase_id", "click_id")
    )


_INTERVAL_JOIN_ORACLE = """
SELECT p.user_id, p.event_id AS purchase_id, c.event_id AS click_id
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id
 AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL '10 minutes'
"""


def q_interval_join_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The interval join as a real watermarked stream-stream join —
    oracled against the batch interval-join SQL."""
    from ..streaming.jobs import run_interval_join_stream_available_now

    return run_interval_join_stream_available_now(
        spark,
        _landed_events_dir(spark, sf_dir),
        watermark="30 minutes",
        lookback="10 MINUTES",
        max_files_per_trigger=None,
        # state-store commits scale with partition count; size to
        # harness-scale state volume, not the batch shuffle default
        stream_shuffle_partitions=8,
    )


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view → click → purchase: a user counts
    at step N only with an event strictly after their step-N-1 time.
    Per-user frames shrink to ≤ |users| rows after the first aggregate,
    so the step joins broadcast — at 100 TB the only big-data pass is
    the three filtered scans feeding the first groupBys."""
    from pyspark.sql import functions as F

    ev = _events(spark, sf_dir)
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(F.broadcast(v), "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(c), "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )

    def step(df: DataFrame, n: int, stage: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(n).cast("long").alias("step"),
            F.lit(stage).alias("stage"),
            "n_users",
        )

    return step(v, 1, "view").unionByName(step(c, 2, "click")).unionByName(
        step(p, 3, "purchase")
    )


_FUNNEL_ORACLE = """
WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
           WHERE event_type = 'view' GROUP BY user_id),
c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
      JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id),
p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
      JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id)
SELECT CAST(1 AS BIGINT) AS step, 'view' AS stage, count(*) AS n_users FROM v
UNION ALL SELECT 2, 'click', count(*) FROM c
UNION ALL SELECT 3, 'purchase', count(*) FROM p
"""


def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-bound equi-width histogram over value: width_bucket keeps
    it a single aggregate pass (no global min/max pre-scan), which is
    the right shape at scale — adaptive bounds would cost a second
    full read."""
    from pyspark.sql import functions as F

    ev = _events(spark, sf_dir)
    bucket = F.width_bucket(F.col("value"), F.lit(0.0), F.lit(500.0), F.lit(10))
    return ev.groupBy(bucket.cast("long").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
    )


# width_bucket clamps: value < lo -> bucket 0, value >= hi -> bucket
# n+1. The plain floor(value/50)+1 form agreed by accident at small sf
# (no value reached 600); sf0.1 exposed the divergence — the CASE
# replicates the clamp exactly.
_HISTOGRAM_ORACLE = """
SELECT CAST(CASE WHEN value < 0.0 THEN 0
                 WHEN value >= 500.0 THEN 11
                 ELSE floor(value / 50.0) + 1 END AS BIGINT) AS bucket,
       count(*) AS n_events,
       min(value) AS min_value,
       max(value) AS max_value,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1
"""


def q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity day, counted on
    each later active day (day_offset). The distinct collapses events to
    ≤ |users|·|days| rows before the cohort join, which then
    broadcasts."""
    from pyspark.sql import functions as F

    ev = _events(spark, sf_dir)
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("cohort_day")
    )
    active = ev.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("active_day")
    ).distinct()
    return (
        active.join(F.broadcast(firsts), "user_id")
        .groupBy(
            "cohort_day",
            F.datediff("active_day", "cohort_day").cast("long").alias("day_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
        .select(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            "day_offset",
            "n_users",
        )
    )


_RETENTION_ORACLE = """
WITH firsts AS (
  SELECT user_id, date_trunc('day', min(ts)) AS cd FROM events GROUP BY user_id
), active AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS ad FROM events
)
SELECT strftime(cd, '%Y-%m-%d') AS cohort_day,
       CAST(date_diff('day', cd, ad) AS BIGINT) AS day_offset,
       count(DISTINCT user_id) AS n_users
FROM active JOIN firsts USING (user_id)
GROUP BY cd, day_offset
"""


def q_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly regularization + forward fill
    (operators/timeseries.py:resample_ffill) over 8 user-band series —
    the telemetry gap-repair op. is_gap marks carried-forward rows, so
    the oracle (grid via generate_series + IGNORE NULLS last_value)
    verifies both the grid construction and the fill values."""
    from pyspark.sql import functions as F

    from ..operators.timeseries import resample_ffill

    ev = _events(spark, sf_dir)
    out = resample_ffill(
        ev,
        key_col=(F.col("user_id") % 8),
        ts_col="ts",
        value_col="value",
        unit="hour",
    )
    # timestamps serialize to strings for the cross-engine compare —
    # module convention (see window queries above)
    return out.select(
        "series",
        F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
        "value_ffill",
        "is_gap",
    )


_RESAMPLE_FFILL_ORACLE = """
WITH obs AS (
  SELECT user_id % 8 AS series, date_trunc('hour', ts) AS bucket,
         max(value) AS v
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT series, min(bucket) AS lo, max(bucket) AS hi FROM obs GROUP BY series
), grid AS (
  SELECT series, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
  FROM bounds
)
SELECT g.series,
       strftime(g.bucket, '%Y-%m-%d %H:%M:%S') AS bucket,
       last_value(o.v IGNORE NULLS) OVER (
         PARTITION BY g.series ORDER BY g.bucket
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ffill,
       o.v IS NULL AS is_gap
FROM grid g LEFT JOIN obs o ON g.series = o.series AND g.bucket = o.bucket
"""


def q_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Islands-and-gaps: per user, maximal runs of CONSECUTIVE active
    days (the retention/engagement streak metric). The classic
    constant-group trick — day − row_number() over distinct active
    days is constant within a consecutive run — turns streak detection
    into two windows + a groupBy, no self-join, no iteration. Output:
    per user, number of streaks, longest streak, and the longest
    streak's start day (ties → earliest)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    ev = _events(spark, sf_dir)
    days = ev.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    rn = F.row_number().over(W.partitionBy("user_id").orderBy("day"))
    grouped = days.withColumn("grp", F.date_sub("day", rn))
    streaks = grouped.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).cast("long").alias("len"),
        F.min("day").alias("start_day"),
    )
    # single-integer tiebreak key (DuckDB arg_min takes no struct):
    # longest first, then earliest start — epoch-day < 100000 for any
    # plausible date, streak len ≤ days in range
    key = (-F.col("len")) * 100000 + F.datediff(
        "start_day", F.lit("1970-01-01").cast("date")
    )
    return streaks.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_streaks"),
        F.max("len").alias("longest_streak"),
        F.date_format(F.min_by("start_day", key), "yyyy-MM-dd").alias(
            "longest_start"
        ),
    )


_STREAKS_ORACLE = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), grouped AS (
  SELECT user_id, day,
         day - CAST(row_number() OVER (
             PARTITION BY user_id ORDER BY day) AS INTEGER) AS grp
  FROM days
), streaks AS (
  SELECT user_id, grp, CAST(count(*) AS BIGINT) AS len,
         min(day) AS start_day
  FROM grouped GROUP BY user_id, grp
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_streaks,
       max(len) AS longest_streak,
       strftime(arg_min(start_day,
                        (-len) * 100000
                        + (start_day - DATE '1970-01-01')), '%Y-%m-%d')
         AS longest_start
FROM streaks GROUP BY user_id
"""


def q_events_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user — the telemetry mean that
    irregular sampling demands (an event's value holds until the next
    event, so it weighs by its holding time, not by 1). Weights are
    integer SECONDS from lead(ts) (the last event has no holding
    interval and is excluded — stated, and replayed by the oracle);
    value·dt accumulates in DECIMAL (the proven tumbling_counts
    discipline), one division at the end. One window + one aggregate;
    the window key is the series key, so no global sort."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    ev = _events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    dt = (
        F.unix_timestamp(F.lead("ts").over(w)) - F.unix_timestamp("ts")
    ).alias("dt")
    rows = ev.select(
        "user_id", F.col("value").cast("decimal(18,2)").alias("v"), dt
    ).filter(F.col("dt").isNotNull())
    return rows.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_intervals"),
        F.sum("dt").cast("long").alias("total_seconds"),
        (
            F.sum(F.col("v") * F.col("dt")).cast("double") / F.sum("dt")
        ).alias("twap"),
    )


_TWAP_ORACLE = """
WITH r AS (
  SELECT user_id, CAST(value AS DECIMAL(18,2)) AS v,
         -- floor each endpoint to whole seconds BEFORE subtracting —
         -- Spark's unix_timestamp truncates per-timestamp, and
         -- floor(a)-floor(b) != floor(a-b) on fractional seconds
         CAST(floor(date_part('epoch', lead(ts) OVER (
             PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT)
           - CAST(floor(date_part('epoch', ts)) AS BIGINT) AS dt
  FROM events
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_intervals,
       CAST(sum(dt) AS BIGINT) AS total_seconds,
       CAST(sum(v * dt) AS DOUBLE) / sum(dt) AS twap
FROM r WHERE dt IS NOT NULL
GROUP BY user_id
"""


def q_cumulative_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative unique users per day — the growth-curve metric. A
    naive per-day COUNT(DISTINCT ... WHERE ts <= day) rescans the
    history per day (quadratic); the scalable identity is
    first-seen-day per user (one agg) → new users per day (one agg) →
    running sum (one ordered window over day-sized rows)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    ev = _events(spark, sf_dir)
    first_seen = ev.groupBy("user_id").agg(
        F.to_date(F.min("ts")).alias("day")
    )
    daily_new = first_seen.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("new_users")
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    return daily_new.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "new_users",
        F.sum("new_users").over(w).cast("long").alias("cumulative_users"),
    )


_CUMULATIVE_USERS_ORACLE = """
WITH first_seen AS (
  SELECT user_id, CAST(min(ts) AS DATE) AS day FROM events GROUP BY user_id
), daily AS (
  SELECT day, CAST(count(*) AS BIGINT) AS new_users
  FROM first_seen GROUP BY day
)
SELECT strftime(day, '%Y-%m-%d') AS day, new_users,
       CAST(sum(new_users) OVER (
         ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       AS BIGINT) AS cumulative_users
FROM daily
"""


_CAP_GAP_MIN, _CAP_HOURS = 30, 2


def q_capped_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with BOTH rules production trackers apply: split
    on inactivity gaps (≥30 min) AND cap session duration (2 h) — an
    always-on device never emits a gap, so gap-only sessions
    (events_session_window) grow without bound. Semantics: gap
    boundaries first (window lag + cumulative sum — the standard
    sessionizer), then each gap-session sub-splits on a fixed 2 h grid
    anchored at its own start (floor((ts − start)/cap) — the
    deterministic grid variant, stated: a re-anchoring splitter is
    order-sequential and not SQL-replayable). Output: per user,
    session count and the longest session's event count."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    ev = _events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    is_new = (
        prev.isNull()
        | (F.unix_timestamp("ts") - F.unix_timestamp(prev) >= _CAP_GAP_MIN * 60)
    ).cast("int")
    sessioned = ev.select("user_id", "ts", "event_id").withColumn(
        "gap_sess", F.sum(is_new).over(w)
    )
    ws = W.partitionBy("user_id", "gap_sess")
    start = F.min("ts").over(ws)
    capped = sessioned.withColumn(
        "sub",
        F.floor(
            (F.unix_timestamp("ts") - F.unix_timestamp(start))
            / (_CAP_HOURS * 3600)
        ),
    )
    per_session = capped.groupBy("user_id", "gap_sess", "sub").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    return per_session.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.max("n_events").cast("long").alias("max_session_events"),
    )


_CAPPED_SESSIONS_ORACLE = f"""
WITH lagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR CAST(floor(date_part('epoch', ts)) AS BIGINT)
                   - CAST(floor(date_part('epoch', lag(ts) OVER w)) AS BIGINT)
                   >= {_CAP_GAP_MIN * 60}
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessioned AS (
  SELECT user_id, ts,
         sum(is_new) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS gap_sess
  FROM lagged
), capped AS (
  SELECT user_id, gap_sess,
         floor((CAST(floor(date_part('epoch', ts)) AS BIGINT)
                - CAST(floor(date_part('epoch',
                    min(ts) OVER (PARTITION BY user_id, gap_sess)))
                  AS BIGINT))
               / {_CAP_HOURS * 3600}.0) AS sub
  FROM sessioned
), per_session AS (
  SELECT user_id, gap_sess, sub, count(*) AS n_events
  FROM capped GROUP BY 1, 2, 3
)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(max(n_events) AS BIGINT) AS max_session_events
FROM per_session GROUP BY user_id
"""


_JOURNEY_PREFIX = 8


def q_journey_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top user-journey prefixes: each user's first 8 events (by ts,
    event_id) joined into an ordered path string, then counted across
    users — the product-analytics 'what do users do first' rollup.
    Ordered-collect semantics via sort_array over (ts, event_id, type)
    structs (struct sort is lexicographic on field order, so the path
    order is total and engine-replayable via string_agg ORDER BY)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    ev = _events(spark, sf_dir)
    rn = F.row_number().over(W.partitionBy("user_id").orderBy("ts", "event_id"))
    first_k = ev.select("user_id", "ts", "event_id", "event_type").withColumn(
        "rn", rn
    ).filter(F.col("rn") <= _JOURNEY_PREFIX)
    paths = first_k.groupBy("user_id").agg(
        F.concat_ws(
            ">",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ),
                lambda x: x["event_type"],
            ),
        ).alias("path")
    )
    return paths.groupBy("path").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )


_JOURNEY_ORACLE = f"""
WITH ranked AS (
  SELECT user_id, event_type,
         row_number() OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         ts, event_id
  FROM events
), paths AS (
  SELECT user_id,
         string_agg(event_type, '>' ORDER BY ts, event_id) AS path
  FROM ranked WHERE rn <= {_JOURNEY_PREFIX}
  GROUP BY user_id
)
SELECT path, CAST(count(*) AS BIGINT) AS n_users
FROM paths GROUP BY path
"""


QUERIES: dict[str, QuerySpec] = {
    "events_cumulative_users": QuerySpec(
        "events_cumulative_users", q_cumulative_users,
        _CUMULATIVE_USERS_ORACLE,
        "cumulative unique users per day (first-seen identity — no"
        " per-day history rescan)",
    ),
    "events_capped_sessions": QuerySpec(
        "events_capped_sessions", q_capped_sessions,
        _CAPPED_SESSIONS_ORACLE,
        "sessionization with gap split AND max-duration cap (grid"
        " sub-split, deterministic)",
    ),
    "events_journey_paths": QuerySpec(
        "events_journey_paths", q_journey_paths, _JOURNEY_ORACLE,
        "counted 8-event user-journey prefixes (ordered collect,"
        " total order via (ts, event_id))",
    ),
    "events_twap": QuerySpec(
        "events_twap", q_events_twap, _TWAP_ORACLE,
        "time-weighted average per user (holding-time weights, exact"
        " decimal accumulation)",
    ),
    "events_streaks": QuerySpec(
        "events_streaks", q_streaks, _STREAKS_ORACLE,
        "islands-and-gaps consecutive-day streaks per user (constant-"
        "group window trick, no self-join)",
    ),
    "events_resample_ffill": QuerySpec(
        "events_resample_ffill", q_resample_ffill, _RESAMPLE_FFILL_ORACLE,
        "hourly time-grid resample + forward fill over user-band series"
        " (gap repair; grid generated distributed)",
    ),
    "events_funnel": QuerySpec(
        "events_funnel", q_funnel, _FUNNEL_ORACLE,
        "ordered view→click→purchase conversion funnel",
    ),
    "events_histogram": QuerySpec(
        "events_histogram", q_histogram, _HISTOGRAM_ORACLE,
        "fixed-bound width_bucket histogram, single agg pass",
    ),
    "events_retention": QuerySpec(
        "events_retention", q_retention, _RETENTION_ORACLE,
        "first-day cohort retention by day offset",
    ),
    "events_interval_join": QuerySpec(
        "events_interval_join", q_interval_join, _INTERVAL_JOIN_ORACLE,
        "time-interval join (batch twin of the stream-stream join)",
    ),
    "events_interval_join_stream": QuerySpec(
        "events_interval_join_stream", q_interval_join_stream, _INTERVAL_JOIN_ORACLE,
        "the same interval join executed as a watermarked STREAM-STREAM "
        "join (availableNow drain, append mode ≡ batch pairs)",
    ),
    "events_multi_rollup": QuerySpec(
        "events_multi_rollup", q_multi_rollup, _MULTI_ROLLUP_ORACLE,
        "hypertable-style minute/hour/day continuous-aggregate rollup",
    ),
    "events_tumbling_window": QuerySpec(
        "events_tumbling_window", q_tumbling, _TUMBLING_ORACLE,
        "1h tumbling window counts + exact sums",
    ),
    "events_tumbling_stream": QuerySpec(
        "events_tumbling_stream", q_tumbling_stream, _TUMBLING_ORACLE,
        "the same tumbling agg executed as a watermarked availableNow "
        "Structured Streaming query (memory sink, complete mode)",
    ),
    "events_sliding_window": QuerySpec(
        "events_sliding_window", q_sliding, _SLIDING_ORACLE,
        "1h/30m sliding window counts",
    ),
    "events_upsert_sink_stream": QuerySpec(
        "events_upsert_sink_stream", q_upsert_sink_stream,
        _UPSERT_SINK_ORACLE,
        "REAL streaming upsert sink: foreachBatch keyed-state merge"
        " across generations, proven == batch latest-per-key",
    ),
    "events_enrich_stream": QuerySpec(
        "events_enrich_stream", q_enrich_stream, _ENRICH_STREAM_ORACLE,
        "REAL stream-static enrichment join (stateless broadcast per"
        " micro-batch) + windowed segment rollup, oracled ≡ batch",
    ),
    "events_sliding_stream": QuerySpec(
        "events_sliding_stream", q_sliding_stream, _SLIDING_ORACLE,
        "the same sliding agg executed as a watermarked availableNow "
        "Structured Streaming query (memory sink, complete mode)",
    ),
    "events_session_window": QuerySpec(
        "events_session_window", q_session, _SESSION_ORACLE,
        "5-minute-gap session windows per user",
    ),
    "events_session_stream": QuerySpec(
        "events_session_stream", q_session_stream, _SESSION_ORACLE,
        "the same session-window agg (merging-window state) executed as "
        "a watermarked availableNow Structured Streaming query",
    ),
    "events_json_extract": QuerySpec(
        "events_json_extract", q_json_extract, _JSON_ORACLE,
        "scalar JSON extraction from props",
    ),
    "events_dedup_stream": QuerySpec(
        "events_dedup_stream", q_dedup_stream, _DEDUP_STREAM_ORACLE,
        "watermarked streaming exact-dedup over an at-least-once doubled "
        "landing — emits each event exactly once (≡ batch projection)",
    ),
    "events_user_totals_stream": QuerySpec(
        "events_user_totals_stream", q_user_totals_stream,
        _USER_TOTALS_STREAM_ORACLE,
        "custom applyInPandasWithState running totals across 4 micro-"
        "batches ≡ batch groupBy (integer-cents exact state)",
    ),
    "events_markov_transitions": QuerySpec(
        "events_markov_transitions", q_event_transitions, _TRANSITIONS_ORACLE,
        "first-order Markov transition matrix over per-user event"
        " streams (lead pairs -> exact-count probabilities)",
    ),
    "events_hll_sliding_distinct": QuerySpec(
        "events_hll_sliding_distinct", q_hll_sliding_distinct,
        _hll_sliding_oracle(),
        "trailing 3h distinct users per (type, hour) via sliding HLL"
        " register scatter + max-merge — W×register shuffle per bucket,"
        " never a W-hour raw re-scan; exact reference rides along",
    ),
    "events_cms_stream": QuerySpec(
        "events_cms_stream", q_cms_stream, _CMS_STREAM_ORACLE,
        "Count-Min sketch maintained INCREMENTALLY by the streaming"
        " runtime (complete-mode sum state = the d×w cell table);"
        " exact top-k + probe estimates assembled in batch over the"
        " drain — completes the streamed sketch trio (min/max/sum)",
    ),
    "events_quantile_sketch_stream": QuerySpec(
        "events_quantile_sketch_stream", q_hdr_stream, _HDR_STREAM_ORACLE,
        "HDR quantile sketch maintained INCREMENTALLY by the streaming"
        " runtime (complete-mode count state = the group × bucket"
        " table); p50/p90/p99 + merge row assembled in batch over the"
        " drain — the RANK member of the streamed sketch family",
    ),
    "events_hll_stream": QuerySpec(
        "events_hll_stream", q_hll_stream, _HLL_STREAM_ORACLE,
        "HLL register sketch maintained INCREMENTALLY by the streaming"
        " runtime (complete-mode max state = the sketch itself);"
        " estimates + merge + exact reference in batch over the drain",
    ),
    "events_kmv_stream": QuerySpec(
        "events_kmv_stream", q_kmv_stream, _KMV_STREAM_ORACLE,
        "KMV distinct sketch maintained INCREMENTALLY by the streaming"
        " runtime (constant state = the sketch itself); estimates + "
        "merge row computed over the drained sketch ≡ batch replay",
    ),
    "events_rolling_active_users": QuerySpec(
        "events_rolling_active_users", q_rolling_active_users,
        _ROLLING_ACTIVE_ORACLE,
        "trailing 7-day distinct active users per day (dedupe-then-"
        "explode, no raw self-join)",
    ),
    "events_attribution": QuerySpec(
        "events_attribution", q_attribution, _ATTRIBUTION_ORACLE,
        "first/last-touch purchase attribution over the bounded click"
        " lookback (struct-min/max, no window)",
    ),
    "events_spacesaving_stream": QuerySpec(
        "events_spacesaving_stream", q_spacesaving_stream, _SS_STREAM_ORACLE,
        "SpaceSaving/Misra-Gries m-counter summary maintained by the"
        " streaming runtime across 4 micro-batches — deletion-free"
        " mergeable top-k; MG theorem verdicts + exact counts oracled"
        " (counter contents are batch-order-dependent by nature)",
    ),
}
