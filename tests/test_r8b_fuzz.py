"""Cross-engine fuzz for the session-3 determinism claims that the
one-corpus oracle parity can't generalize:

- t24's temperature thresholds lean on sqrt being IEEE-754
  correctly-rounded (so floor(1e6*sqrt(m/n)) is engine-identical
  WITHOUT quantization) — fuzz Spark vs DuckDB vs Python over
  arbitrary source-size pairs.
- a21's Bloom bit arithmetic (word = p div 32, bit = 1<<(p%32),
  bit_or fold, min-over-rows probe) must agree with a plain-Python
  bitset on arbitrary key sets — including the DuckDB INT32 shift
  overflow trap the Morton fuzz caught (always 1::BIGINT << ...).
"""

from __future__ import annotations

import hashlib
import math

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F


N_SRC = st.integers(1, 10_000_000_000)


@settings(max_examples=10, deadline=None)
@given(st.lists(st.tuples(N_SRC, N_SRC), min_size=1, max_size=8))
def test_sqrt_threshold_spark_duckdb_python_agree(spark, pairs):
    pairs = [(min(m, n), max(m, n)) for m, n in pairs]
    expected = [math.floor(1_000_000.0 * math.sqrt(m / n))
                for m, n in pairs]
    df = spark.createDataFrame(
        [(i, m, n) for i, (m, n) in enumerate(pairs)], ["i", "m", "n"])
    got = {r["i"]: r["t"] for r in df.select(
        "i",
        F.floor(F.lit(1000000.0)
                * F.sqrt(F.col("m").cast("double")
                         / F.col("n").cast("double")))
         .cast("long").alias("t")).collect()}
    con = duckdb.connect()
    for i, (m, n) in enumerate(pairs):
        duck = con.execute(
            "SELECT CAST(floor(1000000.0::DOUBLE * sqrt(?::DOUBLE "
            "/ ?::DOUBLE)) AS BIGINT)", [m, n]).fetchone()[0]
        assert got[i] == expected[i] == duck, (m, n)


def _bloom_py(store: set[str], probe: str,
              m: int = 4096, k: int = 3) -> bool:
    def positions(h: str):
        return [int(hashlib.md5(f"{h}:bf{j}".encode()).hexdigest()[:8],
                    16) % m for j in range(k)]
    bits = set()
    for h in store:
        bits.update(positions(h))
    return all(p in bits for p in positions(probe))


KEY = st.text(alphabet="abcdef0123456789", min_size=4, max_size=8)


@settings(max_examples=8, deadline=None)
@given(st.sets(KEY, min_size=1, max_size=20), st.lists(KEY, min_size=1,
                                                       max_size=8))
def test_bloom_bitmap_matches_python_bitset(spark, store, probes):
    # build the word table exactly as a21 does, then probe — results
    # must equal a plain-Python set-of-bit-positions reference
    from production_grade_rag_spark.operators.dedup import md5_int32
    sdf = spark.createDataFrame([(h,) for h in sorted(store)], ["h"])
    jcol = F.explode(F.array(*[F.lit(j) for j in range(3)])).alias("j")

    def positions(df):
        return (df.select("h", jcol)
                .withColumn("p", F.pmod(
                    md5_int32(F.concat(F.col("h"), F.lit(":bf"),
                                       F.col("j").cast("string"))),
                    F.lit(4096)))
                .withColumn("bitval", F.expr(
                    "shiftleft(cast(1 as bigint), cast(p % 32 as int))")))

    words = (positions(sdf)
             .groupBy(F.expr("p div 32").alias("word"))
             .agg(F.expr("bit_or(bitval)").alias("wbits")))
    pdf = spark.createDataFrame([(h,) for h in probes], ["h"]).distinct()
    probe = (positions(pdf).withColumn("word", F.expr("p div 32"))
             .join(F.broadcast(words), "word", "left")
             .withColumn("hit", F.coalesce(
                 (F.col("wbits").bitwiseAND(F.col("bitval")) != 0),
                 F.lit(False)))
             .groupBy("h").agg(F.expr("bool_and(hit)").alias("bloom_hit")))
    got = {r["h"]: r["bloom_hit"] for r in probe.collect()}
    for h in set(probes):
        assert got[h] == _bloom_py(store, h), (h, sorted(store))
        if h in store:
            assert got[h] is True  # no false negatives, ever
