"""Cross-engine integer-division semantics for the exact k-means.

DuckDB's integer `//` truncates toward zero; Python's floors.  The
centroid update must use DuckDB's semantics on the Spark/driver side
(_km_tdiv) or negative per-dimension sums would diverge by one unit
and the Lloyd trajectories would split.  Fuzzed here against DuckDB
itself.
"""

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from production_grade_rag_spark.plans.catalog_r8 import _km_tdiv


@settings(max_examples=200, deadline=None)
@given(st.integers(-10**15, 10**15), st.integers(1, 10**9))
def test_tdiv_matches_duckdb(a, n):
    expected = duckdb.sql(
        f"SELECT CAST({a} AS BIGINT) // CAST({n} AS BIGINT)").fetchone()[0]
    assert _km_tdiv(a, n) == expected


def test_tdiv_negative_examples():
    # the cases where floor and truncation differ
    assert _km_tdiv(-7, 2) == -3          # python -7 // 2 == -4
    assert _km_tdiv(7, 2) == 3
    assert _km_tdiv(-8, 2) == -4
    assert _km_tdiv(0, 5) == 0
