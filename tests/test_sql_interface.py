"""The engine is usable through plain spark.sql over registered views
(the DataFrame catalog entries and ad-hoc SQL share Catalyst plans)."""

from __future__ import annotations

from production_grade_rag_spark.sources import register_views

from conftest import SF001


def test_sql_over_views_matches_dataframe(spark):
    register_views(spark, SF001)
    sql = spark.sql("""
        SELECT d.source, count(*) AS n_docs, sum(d.n_chars) AS chars
        FROM documents d
        WHERE d.lang = 'en'
        GROUP BY d.source
    """).collect()
    from pyspark.sql import functions as F
    from production_grade_rag_spark.sources import load_table
    df = (load_table(spark, SF001, "documents")
          .filter(F.col("lang") == "en").groupBy("source")
          .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("chars")))
    assert sorted(map(tuple, sql)) == sorted(map(tuple, df.collect()))


def test_sql_join_star_schema(spark):
    register_views(spark, SF001)
    rows = spark.sql("""
        SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS rev
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY rev DESC LIMIT 5
    """).collect()
    assert len(rows) == 5
    assert all(r["rev"] is not None for r in rows)


def test_sql_udfs_match_column_forms(spark):
    """The pgrs_* SQL UDFs must agree with the Column builders in
    functions/text.py on the same inputs (one definition of 'word
    count' across SQL and DataFrame users)."""
    from pyspark.sql import functions as F
    from production_grade_rag_spark.functions import text as X
    from production_grade_rag_spark.functions.sql_udfs import (
        register_sql_udfs)

    register_sql_udfs(spark)
    df = spark.createDataFrame(
        [(" hello  world \n",), ("",), ("   ",), ("abcd" * 30,)],
        "s string")
    df.createOrReplaceTempView("__t_sqludf")
    got = spark.sql("""
        SELECT pgrs_word_count(s) AS wc, pgrs_token_estimate(s) AS tok,
               pgrs_truncate(s, 20) AS tr
        FROM __t_sqludf""").collect()
    want = df.select(
        X.word_count(F.col("s")).alias("wc"),
        X.token_estimate(F.col("s")).alias("tok"),
        X.truncate_ellipsis(F.col("s"), 20).alias("tr")).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    # jaccard agrees with the fusion-family expression (F14)
    j = spark.sql("""
        SELECT pgrs_jaccard(array('a','b','c'), array('b','c','d')) AS j,
               pgrs_jaccard(array(), array()) AS z,
               pgrs_jaccard(array(), array('x')) AS h""").first()
    # reference empty-set convention (advanced_search.py:303-306):
    # both empty -> identical (1.0); one empty -> disjoint (0.0) —
    # the same convention as fusion._jac / greedy_diversity.
    assert abs(j["j"] - 0.5) < 1e-12 and j["z"] == 1.0 and j["h"] == 0.0


def test_sql_udf_fuzz_parity(spark):
    """Property: pgrs_word_count / pgrs_token_estimate agree with the
    Column builders on arbitrary unicode text (whitespace runs, CJK,
    control chars)."""
    from hypothesis import given, settings, strategies as st
    from pyspark.sql import functions as F
    from production_grade_rag_spark.functions import text as X
    from production_grade_rag_spark.functions.sql_udfs import (
        register_sql_udfs)

    register_sql_udfs(spark)

    @settings(max_examples=15, deadline=None)
    @given(st.lists(st.text(max_size=60), min_size=1, max_size=8))
    def prop(texts):
        df = spark.createDataFrame([(t,) for t in texts], "s string")
        df.createOrReplaceTempView("__t_sqludf_fuzz")
        got = spark.sql(
            "SELECT pgrs_word_count(s) AS wc, "
            "pgrs_token_estimate(s) AS tok FROM __t_sqludf_fuzz"
        ).collect()
        want = df.select(
            X.word_count(F.col("s")).alias("wc"),
            X.token_estimate(F.col("s")).alias("tok")).collect()
        assert [tuple(r) for r in got] == [tuple(r) for r in want]

    prop()
