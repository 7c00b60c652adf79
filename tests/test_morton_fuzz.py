"""Cross-engine fuzz for the Morton bit-interleave behind the z-order
layout: the Spark column expression, the DuckDB SQL fragment, and a
plain-Python reference must agree bit-for-bit on the full 16-bit/dim
domain (the three implementations are generated from the same
constant but live in different engines)."""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from production_grade_rag_spark.plans.catalog_r8 import (_morton_col,
                                                         _morton_sql)


def morton_py(x: int, y: int) -> int:
    z = 0
    for i in range(16):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


COORD = st.integers(0, 65535)


@settings(max_examples=15, deadline=None)
@given(st.lists(st.tuples(COORD, COORD), min_size=1, max_size=12))
def test_morton_spark_duckdb_python_agree(spark, pairs):
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(pairs)], ["i", "xs", "ys"])
    got = {r["i"]: r["z"] for r in df.select(
        "i", _morton_col(F.col("xs"), F.col("ys")).alias("z")).collect()}
    con = duckdb.connect()
    for i, (x, y) in enumerate(pairs):
        expected = morton_py(x, y)
        assert got[i] == expected, (x, y)
        sql = _morton_sql(str(x), str(y))
        assert con.execute(f"SELECT {sql}").fetchone()[0] == expected, (x, y)


def test_morton_corners():
    assert morton_py(0, 0) == 0
    assert morton_py(65535, 0) == 0x55555555
    assert morton_py(0, 65535) == 0xAAAAAAAA
    assert morton_py(65535, 65535) == 0xFFFFFFFF
