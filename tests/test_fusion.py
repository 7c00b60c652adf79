"""A3 fusion equivalence (SURVEY §7.4 risk 4): the reference's
sequential running weighted mean (advanced_search.py:236-253) equals
the grouped weighted mean sum(s*w)/sum(w) when each strategy
contributes once per id — plus Spark-side checks of the fusion ops."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from production_grade_rag_spark.operators.fusion import STRATEGY_WEIGHTS


def running_weighted_mean(pairs):
    """The reference's sequential fold: combined = (prev*prev_w + s*w)
    / (prev_w + w), accumulating weights."""
    score, weight = 0.0, 0.0
    for s, w in pairs:
        score = (score * weight + s * w) / (weight + w)
        weight += w
    return score


@given(st.lists(
    st.tuples(st.floats(0, 1), st.sampled_from(list(STRATEGY_WEIGHTS.values()))),
    min_size=1, max_size=3, unique_by=lambda p: p[1]))
@settings(max_examples=300, deadline=None)
def test_running_mean_equals_grouped_weighted_mean(pairs):
    grouped = sum(s * w for s, w in pairs) / sum(w for _, w in pairs)
    assert math.isclose(running_weighted_mean(pairs), grouped, rel_tol=1e-12)


def test_multi_strategy_fusion_spark(spark):
    from pyspark.sql import functions as F  # noqa: F401
    from production_grade_rag_spark.operators.fusion import multi_strategy_fusion
    rows = [(1, 0.9, "similarity"), (1, 0.5, "hybrid"),
            (2, 0.8, "parent_child"), (3, 0.4, "similarity")]
    df = spark.createDataFrame(rows, ["id", "score", "strategy"])
    out = {r["id"]: r for r in multi_strategy_fusion(df).collect()}
    exp1 = (0.9 * 0.6 + 0.5 * 0.5) / (0.6 + 0.5)
    assert math.isclose(out[1]["fused_score"], exp1, rel_tol=1e-12)
    assert out[1]["strategies_used"] == ["hybrid", "similarity"]
    assert math.isclose(out[2]["fused_score"], 0.8, rel_tol=1e-12)
    assert math.isclose(out[3]["fused_score"], 0.4, rel_tol=1e-12)


def test_greedy_diversity_keeps_rank_order_subset(spark):
    from production_grade_rag_spark.operators.fusion import greedy_diversity
    rows = [
        ("q", 1, 0.9, "alpha beta gamma delta"),
        ("q", 2, 0.8, "alpha beta gamma delta"),      # dup of 1 -> dropped
        ("q", 3, 0.7, "совсем other words here"),
        ("q", 4, 0.6, "alpha beta gamma echo"),       # J=3/5 vs 1 -> kept
    ]
    df = spark.createDataFrame(rows, ["query_id", "doc_id", "score", "content"])
    kept = sorted(r["doc_id"] for r in greedy_diversity(df, threshold=0.7).collect())
    assert kept == [1, 3, 4]


def test_greedy_diversity_skips_small_sets(spark):
    from production_grade_rag_spark.operators.fusion import greedy_diversity
    rows = [("q", 1, 0.9, "same words"), ("q", 2, 0.8, "same words")]
    df = spark.createDataFrame(rows, ["query_id", "doc_id", "score", "content"])
    # <= min_results rows -> no filtering at all (advanced_search.py:282)
    assert greedy_diversity(df).count() == 2


def test_tfidf_score_matches_formula(spark):
    import math
    from production_grade_rag_spark.operators.textscore import tfidf_score
    rows = [(1, "a a b x"), (2, "a c"), (3, "y z"), (4, None)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r["text_score"]
           for r in tfidf_score(df, ["a", "b"]).collect()}
    n = 4
    idf_a = math.log((1 + n) / (1 + 2)) + 1   # 'a' in docs 1,2
    idf_b = math.log((1 + n) / (1 + 1)) + 1   # 'b' in doc 1
    assert math.isclose(out[1], 2 * idf_a + 1 * idf_b, rel_tol=1e-12)
    assert math.isclose(out[2], 1 * idf_a, rel_tol=1e-12)
    assert out[3] == 0.0 and out[4] == 0.0


def test_bm25_score_matches_formula(spark):
    import math
    from production_grade_rag_spark.operators.textscore import bm25_score
    rows = [(1, "a a b x"), (2, "a c"), (3, "y z"), (4, None)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r["text_score"]
           for r in bm25_score(df, ["a", "b"]).collect()}
    n, k1, b = 4, 1.2, 0.75
    avgdl = (4 + 2 + 2 + 0) / 4
    def idf(dfreq):
        return math.log(1 + (n - dfreq + 0.5) / (dfreq + 0.5))
    def term(tf, dl, dfreq):
        return idf(dfreq) * (tf * (k1 + 1)) / \
            (tf + k1 * (1 - b + b * dl / avgdl))
    assert math.isclose(out[1], term(2, 4, 2) + term(1, 4, 1), rel_tol=1e-12)
    assert math.isclose(out[2], term(1, 2, 2), rel_tol=1e-12)
    assert out[3] == 0.0 and out[4] == 0.0


def test_bm25_saturation_and_length_norm(spark):
    # BM25's two properties TF-IDF lacks (the round-3 gap this closes):
    # (1) term-frequency SATURATION — marginal gain per extra
    # occurrence strictly shrinks and the score stays below the
    # idf*(k1+1) asymptote; (2) LENGTH NORMALIZATION — same tf in a
    # longer document scores lower.
    import math
    from production_grade_rag_spark.operators.textscore import bm25_score
    # same length (padding with distinct junk), growing tf of "a"
    rows = [(i, " ".join(["a"] * i + [f"x{j}" for j in range(10 - i)]))
            for i in range(1, 9)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    s = {r["doc_id"]: r["text_score"]
         for r in bm25_score(df, ["a"]).collect()}
    gains = [s[i + 1] - s[i] for i in range(1, 8)]
    assert all(g > 0 for g in gains), "more tf must still help"
    assert all(g2 < g1 for g1, g2 in zip(gains, gains[1:])), "diminishing"
    n, k1 = 8, 1.2
    asymptote = math.log(1 + (n - 8 + 0.5) / (8 + 0.5)) * (k1 + 1)
    assert all(v < asymptote for v in s.values())
    # length norm: tf=2 of "a" in a 4-token doc vs a 20-token doc
    rows2 = [(1, "a a x y"), (2, "a a " + " ".join(f"z{j}" for j in range(18)))]
    df2 = spark.createDataFrame(rows2, ["doc_id", "text"])
    s2 = {r["doc_id"]: r["text_score"]
          for r in bm25_score(df2, ["a"]).collect()}
    assert s2[1] > s2[2]


def test_standard_analyzer_term_set_difference(spark):
    """The Lucene-standard twin strips punctuation the whitespace
    tokenizer keeps: "Vector, scan!" analyzes to {vector, scan} but
    whitespace-tokenizes to {"vector,", "scan!"} — so a punctuated
    document matches query term "vector" only under the standard
    analyzer (the reference's $search analyzer,
    index_manager.py:117-152)."""
    import pyspark.sql.functions as F
    from production_grade_rag_spark.functions.text import (std_analyze_py,
                                                           std_tokens)
    from production_grade_rag_spark.operators import textscore
    from production_grade_rag_spark.operators.dedup import tokens

    df = spark.createDataFrame(
        [(1, "Vector, scan! over the big-table"),
         (2, "vector scan plain")], ["doc_id", "text"])
    got = {r["doc_id"]: (set(r["ws"]), set(r["std"])) for r in
           df.select("doc_id", tokens(F.col("text")).alias("ws"),
                     std_tokens(F.col("text")).alias("std")).collect()}
    ws1, std1 = got[1]
    assert std1 == {"vector", "scan", "over", "the", "big", "table"}
    assert "vector," in ws1 and "vector" not in ws1
    # driver-side query analysis matches the column expression
    assert std_analyze_py("Vector, scan! over the big-table") == \
        ["vector", "scan", "over", "the", "big", "table"]

    # BM25: punctuated doc scores for "vector" only under standard
    ws_scores = {r["doc_id"]: r["text_score"] for r in
                 textscore.bm25_score(df, ["vector"]).collect()}
    std_scores = {r["doc_id"]: r["text_score"] for r in
                  textscore.bm25_score(df, ["vector"],
                                       analyzer="standard").collect()}
    assert ws_scores[1] == 0.0 and ws_scores[2] > 0.0
    assert std_scores[1] > 0.0 and std_scores[2] > 0.0
