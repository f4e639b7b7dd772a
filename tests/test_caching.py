"""Bounded session-cache behavior (big_data_analysis_of_airline_data_set_spark.caching) — round-3
advice: per-session caches must not grow without bound in a long-lived
server session cycling many sf_dirs."""

from __future__ import annotations

import pytest

from big_data_analysis_of_airline_data_set_spark.caching import BoundedCache


def test_lru_eviction_order_and_bound():
    evicted = []
    c = BoundedCache(3, on_evict=lambda k, v: evicted.append(k))
    for i in range(3):
        c.put(i, str(i))
    c.get(0)  # refresh 0 → next eviction must pick 1
    c.put(3, "3")
    assert evicted == [1]
    assert len(c) == 3
    assert 0 in c and 2 in c and 3 in c


def test_put_existing_key_refreshes_not_grows():
    c = BoundedCache(2)
    c.put("a", 1)
    c.put("b", 2)
    c.put("a", 10)  # refresh, not insert
    assert len(c) == 2
    c.put("c", 3)  # evicts b (oldest), not a
    assert "a" in c and "c" in c and "b" not in c
    assert c.get("a") == 10


def test_clear_runs_evict_callback_for_all():
    evicted = []
    c = BoundedCache(5, on_evict=lambda k, v: evicted.append((k, v)))
    c.put("x", 1)
    c.put("y", 2)
    c.clear()
    assert sorted(evicted) == [("x", 1), ("y", 2)]
    assert len(c) == 0


def test_rejects_nonpositive_bound():
    with pytest.raises(ValueError):
        BoundedCache(0)


def test_module_caches_are_bounded():
    """Every module-level session cache is a BoundedCache (or carries
    its own explicit bound), so cycling many sf_dirs cannot grow any of
    them past its cap."""
    from big_data_analysis_of_airline_data_set_spark.plans import content, events_queries, ml_queries
    from big_data_analysis_of_airline_data_set_spark.sources import readers

    assert isinstance(ml_queries._FIT_CACHE, BoundedCache)
    assert isinstance(ml_queries._REF_BANDS_CACHE, BoundedCache)
    assert isinstance(content._IVF_CACHE, BoundedCache)
    assert isinstance(content._FREQ_CACHE, BoundedCache)
    assert isinstance(readers._SCHEMA_VERDICT_CACHE, BoundedCache)
    assert isinstance(events_queries._LANDED_CACHE, BoundedCache)


def test_schema_verdict_cache_bounded_across_many_dirs():
    from big_data_analysis_of_airline_data_set_spark.sources.readers import _SCHEMA_VERDICT_CACHE

    cap = _SCHEMA_VERDICT_CACHE.max_entries
    for i in range(cap * 3):
        _SCHEMA_VERDICT_CACHE.put(("app", f"/fake/sf{i}/lineitem.parquet"), "pin")
    assert len(_SCHEMA_VERDICT_CACHE) <= cap


def test_sink_dirs_bounded():
    import os

    from big_data_analysis_of_airline_data_set_spark.plans import patterns

    made = [patterns._sink_dir("cache_test_sink_") for _ in range(20)]
    assert len(patterns._SINK_DIRS) <= patterns._SINK_DIRS_MAX
    # evicted dirs are actually gone; the newest survive
    assert not os.path.isdir(made[0])
    assert os.path.isdir(made[-1])
    patterns._SINK_DIRS.clear()
    for d in made:
        import shutil

        shutil.rmtree(d, ignore_errors=True)


def test_rejects_none_values():
    import pytest as _pytest

    c = BoundedCache(2)
    with _pytest.raises(ValueError, match="None"):
        c.put("k", None)


def test_plan_pin_reuses_identical_plan_and_swaps(spark):
    """PlanPin: plan-identical frames share one Spark cache entry, so
    pin() must hand back the existing pin (not evict it); a different
    plan swaps; release() through the pin leaves nothing dangling."""
    from big_data_analysis_of_airline_data_set_spark.caching import PlanPin

    pin = PlanPin()
    df1 = spark.range(100).selectExpr("id", "id * 2 as v")
    df2 = spark.range(100).selectExpr("id", "id * 3 as v")

    a = pin.pin(df1)
    a.count()
    assert a.storageLevel.useMemory
    # plan-identical frame (fresh object): reuse, still cached
    b = pin.pin(spark.range(100).selectExpr("id", "id * 2 as v"))
    assert b is a
    assert a.storageLevel.useMemory and len(pin) == 1
    # different plan: swap, old released
    c = pin.pin(df2)
    assert c is not a and len(pin) == 1
    assert not a.storageLevel.useMemory
    # release through the pin
    pin.release(c)
    assert len(pin) == 0 and not c.storageLevel.useMemory
