"""T7 exact greedy budget: the distributed applyInPandas operator must
equal the pure-Python reference loop on every group."""

from __future__ import annotations

from production_grade_rag_spark.operators.budget import (
    greedy_budget_py,
    greedy_token_budget,
)


def test_greedy_skips_and_continues():
    rows = [
        {"doc_id": 1, "content": "x" * 400},   # 100 tokens
        {"doc_id": 2, "content": "x" * 800},   # 200 -> would overflow, skipped
        {"doc_id": 3, "content": "x" * 200},   # 50  -> still fits
    ]
    out = greedy_budget_py(rows, max_total_tokens=160, max_result_tokens=1000)
    assert [r["doc_id"] for r in out] == [1, 3]


def test_single_result_truncation():
    rows = [{"doc_id": 1, "content": "y" * 1000}]
    out = greedy_budget_py(rows, max_total_tokens=10_000, max_result_tokens=50)
    assert out[0]["est_tokens"] == 50
    assert out[0]["content"] == "y" * 200 + "..."


def test_oversized_doc_skipped_before_truncation():
    # reference checks the RAW estimate against the total budget first
    # (rag_engine.py _filter_and_optimize_results): a huge doc that
    # would fit only after truncation is skipped, not kept-truncated.
    rows = [
        {"doc_id": 1, "content": "x" * 2000},  # 500 raw > 160 total -> skip
        {"doc_id": 2, "content": "x" * 400},   # 100 fits
    ]
    out = greedy_budget_py(rows, max_total_tokens=160, max_result_tokens=50)
    assert [r["doc_id"] for r in out] == [2]


def test_spark_matches_python(spark):
    import random
    rng = random.Random(7)
    rows = [(str(q), i, float(rng.randint(0, 100)),
             "w" * rng.randint(0, 600))
            for q in range(4) for i in range(12)]
    df = spark.createDataFrame(rows, ["query_id", "doc_id", "score", "content"])
    got = greedy_token_budget(df, max_total_tokens=300,
                              max_result_tokens=100).collect()
    by_q = {}
    for r in sorted(rows, key=lambda r: (r[0], -r[2], r[1])):
        by_q.setdefault(r[0], []).append(
            {"query_id": r[0], "doc_id": r[1], "score": r[2], "content": r[3]})
    expected = {}
    for q, rs in by_q.items():
        for r in greedy_budget_py(rs, max_total_tokens=300,
                                  max_result_tokens=100):
            expected[(q, r["doc_id"])] = (r["content"], r["est_tokens"])
    assert {(r["query_id"], r["doc_id"]): (r["content"], r["est_tokens"])
            for r in got} == expected
