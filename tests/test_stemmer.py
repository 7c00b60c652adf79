"""Porter-lite stemmed analyzer (round-7 verdict item 6): the
deterministic suffix chain must map morphological variants of a word to
one term on BOTH the document side (functions.text.stemmed_tokens /
its DuckDB twin) and the query side (stem_analyze_py), and the r7
stemmed-BM25 entry wires it through the same analyzer knob as the
standard twin (reference $search analyzer family,
index_manager.py:117-152)."""

from __future__ import annotations

from pyspark.sql import functions as F

from production_grade_rag_spark.functions.text import (
    std_analyze_py, stem_analyze_py, stem_py, stemmed_tokens)


def test_stem_mappings():
    # variants collapse to the shared stem
    assert stem_py("filters") == stem_py("filtered") \
        == stem_py("filtering") == "filter"
    assert stem_py("meetings") == stem_py("meeting") == "meet"
    assert stem_py("running") == "run"
    assert stem_py("queries") == stem_py("query") == "query"
    assert stem_py("classes") == stem_py("class") == "class"
    # guards: -ss and -us survive the plural rule, short tokens survive
    # ed/ing/e rules
    assert stem_py("bus") == "bus"
    assert stem_py("used") == "used"
    assert stem_py("the") == "the"


def test_term_set_difference_vs_standard():
    text = "Filtering joined tables; the filters were joined quickly."
    std = std_analyze_py(text)
    stm = stem_analyze_py(text)
    assert len(std) == len(stm)
    # the stemmed set must actually differ (the analyzer does work)...
    assert set(std) != set(stm)
    # ...and collapse the filter/join variants the standard set keeps apart
    assert {"filtering", "filters"} <= set(std)
    assert "filter" in stm and "filtering" not in stm
    # "tabl" is real Porter behavior too (final-e drop)
    assert {"join", "quick", "tabl"} <= set(stm)


def test_spark_duckdb_stem_parity(spark, duck):
    """STEM_RULES shared verbatim: Spark's stemmed_tokens and the
    DuckDB twin must produce identical token arrays over real corpus
    text (the same property the bm25_stem oracle hashes end-to-end)."""
    from production_grade_rag_spark.plans.oracle_vec import stemmed_tokens_sql
    got = (spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
           .orderBy("doc_id").limit(50)
           .select("doc_id", stemmed_tokens(F.col("text")).alias("toks"))
           .collect())
    want = duck.execute(
        f"SELECT doc_id, {stemmed_tokens_sql('text')} AS toks "
        f"FROM documents ORDER BY doc_id LIMIT 50").fetchall()
    assert [(r["doc_id"], r["toks"]) for r in got] \
        == [(d, list(t)) for d, t in want]


def test_engine_stemmed_analyzer_dispatch(spark):
    """text_analyzer="stemmed" must route hybrid search end to end and
    match morphological variants the standard analyzer misses."""
    from production_grade_rag_spark.config import EngineConfig
    from production_grade_rag_spark.engine import SparkRagEngine
    import pytest
    docs = spark.createDataFrame(
        [(1, "filtering tables joined by scanning engines is what this "
             "document keeps describing: filtered tables, joined scans, "
             "filters everywhere in the execution engine"),
         (2, "completely unrelated prose about gardens and weather, "
             "flowers blooming through a long quiet rainy afternoon")],
        ["doc_id", "text"])
    eng = SparkRagEngine(spark, EngineConfig(
        text_analyzer="stemmed", enable_hybrid_search=True,
        quality_threshold=0.0))
    idx = eng.build_index(docs)
    out = eng.search(idx, query_text="filtered table scan",
                     search_type="hybrid", limit=5).collect()
    assert out
    top_chunk = out[0]
    assert top_chunk["text_score"] > 0, \
        "stemmed query terms must match the stemmed document tokens"
    with pytest.raises(ValueError, match="text_analyzer"):
        EngineConfig(text_analyzer="lucene").validate()


def test_english_analyzer_stopwords_then_stem():
    from production_grade_rag_spark.functions.text import (
        EN_STOPWORDS, english_analyze_py)
    out = english_analyze_py("The filters that are in the tables will join")
    assert "the" not in out and "that" not in out and "will" not in out
    assert out == ["filter", "tabl", "join"]
    # stopwords are filtered in their UNstemmed form (Lucene chains
    # StopFilter before PorterStemFilter): "these" is stopped, while a
    # word stemming TO a stop-like form survives
    assert "these" in EN_STOPWORDS


def test_spark_duckdb_english_parity(spark, duck):
    from pyspark.sql import functions as F
    from production_grade_rag_spark.functions.text import english_tokens
    from production_grade_rag_spark.plans.oracle_vec import english_tokens_sql
    got = (spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
           .orderBy("doc_id").limit(50)
           .select("doc_id", english_tokens(F.col("text")).alias("toks"))
           .collect())
    want = duck.execute(
        f"SELECT doc_id, {english_tokens_sql('text')} AS toks "
        f"FROM documents ORDER BY doc_id LIMIT 50").fetchall()
    assert [(r["doc_id"], r["toks"]) for r in got] \
        == [(d, list(t)) for d, t in want]
