"""Dev tool: correlate per-repetition query wall-clock with hypervisor
CPU-steal fraction (round-12 verdict task 1 — attributing the r6/r6b
suite drift).

The sandbox is a VM (Firecracker); co-tenant load on the host shows up
ONLY as steal time in /proc/stat — no guest process list will ever
name it. This times N repetitions of one catalog query and, for each,
the steal fraction over exactly that window: steal_delta /
(all_cpu_delta), from the aggregate cpu line. A positive wall-vs-steal
correlation on identical code + corpus is direct evidence that suite
drift between records is host co-tenancy, not plan or corpus change.

Usage: PYTHONPATH=/root/repo python3 tests/steal_probe.py \
           [query_name] [reps]
"""

from __future__ import annotations

import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def cpu_times() -> tuple[int, int]:
    """(total_jiffies, steal_jiffies) from the aggregate cpu line."""
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(x) for x in parts[1:]]
    return sum(vals), vals[7] if len(vals) > 7 else 0


def main() -> None:
    name = sys.argv[1] if len(sys.argv) > 1 else "graph_k_core"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from big_data_analysis_of_airline_data_set_spark.plans import all_queries
    from big_data_analysis_of_airline_data_set_spark.session import get_session

    spark = get_session("steal-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spec = all_queries()[name]
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    pairs = []
    for r in range(reps):
        t_all0, t_st0 = cpu_times()
        t0 = time.perf_counter()
        spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        t_all1, t_st1 = cpu_times()
        d_all = max(1, t_all1 - t_all0)
        steal_pct = 100.0 * (t_st1 - t_st0) / d_all
        pairs.append((wall, steal_pct))
        print(
            f"rep {r + 1}/{reps} {name}: wall={wall:.2f}s steal={steal_pct:.1f}%",
            flush=True,
        )

    walls = [w for w, _ in pairs]
    steals = [s for _, s in pairs]
    n = len(pairs)
    mw, ms = sum(walls) / n, sum(steals) / n
    cov = sum((w - mw) * (s - ms) for w, s in pairs)
    vw = sum((w - mw) ** 2 for w in walls) ** 0.5
    vs = sum((s - ms) ** 2 for s in steals) ** 0.5
    corr = cov / (vw * vs) if vw > 0 and vs > 0 else float("nan")
    print(f"# corr(wall, steal%) over {n} reps: {corr:.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
