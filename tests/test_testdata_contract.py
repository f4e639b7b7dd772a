"""Testdata nullability canary.

The catalog's oracle-parity contract assumes the driver-generated
tables keep their KEY columns non-null: several query families
(quartile/rank equi-joins, group-by keys whose NULL group Spark's
inner joins would drop while DuckDB's GROUP BY keeps, hash-split
assignments) are written against NULL-free keys, and round-7's code
review proved a NULL `events.user_id` would flip `events_rfm_segments`
red (fixed there by excluding anonymous events in BOTH engines — see
the query's docstring).

TESTDATA.md documents no nullability contract, and the driver
regenerates the tables each round. This canary makes a regeneration
that introduces NULL keys fail HERE with a named column list, instead
of surfacing as an opaque driver correctness mismatch — the adapting
round can then take a deliberate NULL stance per affected query
(exclude-with-docstring, null-safe join, or oracle filter) rather
than debugging value hashes.

Measure columns (events.value, lineitem amounts, …) are NOT covered:
queries already take explicit IS NOT NULL stances on those.
"""

from __future__ import annotations

import os

import duckdb
import pytest

# Same dirs conftest points the suite at — a relocated testdata root
# (SPARK_GRAFT_TEST_SF / SPARK_GRAFT_ORACLE_SF) is canaried too, not
# just the default paths.
_SF_DIRS = sorted(
    {
        os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001"),
        os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01"),
    }
)

# (table, key columns the catalog's join/group logic assumes non-null)
_KEY_COLS = {
    "events": ["event_id", "ts", "user_id", "event_type"],
    "orders": ["o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"],
    "lineitem": [
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_linenumber",
        "l_returnflag",
        "l_shipdate",
    ],
    "customer": ["c_custkey", "c_nationkey"],
    "supplier": ["s_suppkey", "s_nationkey"],
    "part": ["p_partkey"],
    "nation": ["n_nationkey", "n_regionkey"],
    "region": ["r_regionkey"],
    "documents": ["doc_id", "text"],
    "embeddings": ["vec_id", "embedding"],
}


@pytest.mark.parametrize("sf_dir", _SF_DIRS)
def test_key_columns_are_null_free(sf_dir):
    con = duckdb.connect()
    try:
        offenders = []
        # a table VANISHING from a regeneration is as much a contract
        # break as a NULL key — fail with names, never skip silently
        missing = [
            t
            for t in _KEY_COLS
            if not os.path.exists(os.path.join(sf_dir, f"{t}.parquet"))
        ]
        assert not missing, (
            f"testdata regeneration dropped or renamed tables in {sf_dir}:"
            f" {missing} — the nullability canary cannot vouch for them"
        )
        for table, cols in _KEY_COLS.items():
            path = os.path.join(sf_dir, f"{table}.parquet")
            checks = ", ".join(
                f'count(*) FILTER (WHERE "{c}" IS NULL) AS "{c}"' for c in cols
            )
            row = con.execute(
                f"SELECT {checks} FROM read_parquet('{path}')"
            ).fetchdf()
            for c in cols:
                n = int(row[c].iloc[0])
                if n:
                    offenders.append(f"{table}.{c}: {n} NULLs")
        assert not offenders, (
            "testdata regeneration introduced NULL key values — audit the"
            " catalog queries that join/group on these columns and take an"
            " explicit NULL stance in BOTH engines (see"
            " events_rfm_segments for the pattern): " + "; ".join(offenders)
        )
    finally:
        con.close()
