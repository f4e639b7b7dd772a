"""Window-rotation planner (dev tool, not a test).

Prints the evidence state the per-round rotation policy needs: which
catalog entries have NEVER had a driver CORRECTNESS row, and the
latest driver round for every other entry (oldest first) — the two
inputs to the never-checked-first / oldest-evidence-second policy in
``plans/__init__.py:_CORRECTNESS_WINDOW``.

Usage:  PYTHONPATH=/root/repo python3 tests/window_planner.py
"""

from __future__ import annotations

import glob
import json
import os
import re


def evidence_state(repo: str = "/root/repo"):
    from big_data_analysis_of_airline_data_set_spark.plans import all_queries

    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else -1
        for name in json.load(open(path)):
            latest[name] = max(latest.get(name, 0), rnd)
    catalog = list(all_queries())
    never = [n for n in catalog if n not in latest]
    aged = sorted(
        ((latest[n], n) for n in catalog if n in latest), key=lambda t: t
    )
    return catalog, never, aged


def main() -> None:
    catalog, never, aged = evidence_state()
    window = catalog[:50]
    print(f"catalog: {len(catalog)}  window: {len(window)}")
    print(f"\nNEVER driver-checked ({len(never)}):")
    for n in never:
        tag = " [IN WINDOW]" if n in window else ""
        print(f"  {n}{tag}")
    print("\nOldest evidence first (round, name):")
    for rnd, n in aged[:40]:
        tag = " [IN WINDOW]" if n in window else ""
        print(f"  r{rnd}  {n}{tag}")


if __name__ == "__main__":
    main()
