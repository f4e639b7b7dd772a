"""Named query catalog — the judge-visible surface.

Each module contributes ``QUERIES: dict[str, QuerySpec]``; this package
merges them. ``__spark_entry__.py`` exposes exactly this registry to the
driver's correctness harness.
"""

from __future__ import annotations

from .spec import QuerySpec
from . import (
    content,
    events_queries,
    flights_job,
    ml_queries,
    patterns,
    relational,
    relational2,
    relational3,
    statistics,
)

_MODULES = [
    relational,
    relational2,
    relational3,
    patterns,
    statistics,
    ml_queries,
    content,
    events_queries,
    flights_job,
]


def all_queries() -> dict[str, QuerySpec]:
    merged: dict[str, QuerySpec] = {}
    for mod in _MODULES:
        for name, spec in mod.QUERIES.items():
            if name in merged:
                raise ValueError(f"duplicate query name: {name}")
            merged[name] = spec
    return merged


__all__ = ["QuerySpec", "all_queries"]
