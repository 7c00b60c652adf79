"""PQ ANN must trade recall, not correctness: returned rows carry
EXACT cosine scores (rescoring), recall against the exact search stays
above a floor, and the whole path (sample -> k-means -> encode ->
ADC -> rescore) is deterministic run to run."""

from __future__ import annotations

import numpy as np

from production_grade_rag_spark.operators import pq, similarity
from production_grade_rag_spark.plans.oracle_vec import QUERY_VEC
from production_grade_rag_spark.sources import load_table

from conftest import SF001


def _pq_ids_scores(spark, rescore=8):
    emb = load_table(spark, SF001, "embeddings")
    books = pq.pq_train(emb)
    enc = pq.pq_encode(emb, books).select("vec_id", "pq_codes")
    rows = pq.pq_topk(enc, emb, QUERY_VEC, books, k=10,
                      rescore=rescore).collect()
    return [(r["vec_id"], r["score"]) for r in rows]


def test_pq_recall_and_exact_scores(spark):
    emb = load_table(spark, SF001, "embeddings")
    exact = [r["vec_id"] for r in
             similarity.knn_topk(emb, QUERY_VEC, k=10).collect()]
    got = _pq_ids_scores(spark)
    recall = len(set(exact) & {i for i, _ in got}) / len(exact)
    assert recall >= 0.5, f"PQ recall@10 too low: {recall}"
    # rescored scores are exact cosine (to the same 1e-6 rounding)
    ex = {r["vec_id"]: round(r["score"], 6) for r in
          similarity.knn_topk(emb, QUERY_VEC, k=500).collect()}
    for vid, score in got:
        assert abs(ex[vid] - score) < 1e-9


def test_pq_deterministic(spark):
    assert _pq_ids_scores(spark) == _pq_ids_scores(spark)


def test_pq_train_encode_shapes(spark):
    emb = load_table(spark, SF001, "embeddings")
    books = pq.pq_train(emb, m=8, k_codes=16)
    assert len(books) == 8
    assert all(b.shape == (16, 8) for b in books)
    enc = pq.pq_encode(emb, books)
    row = enc.select("pq_codes").first()
    codes = row["pq_codes"]
    assert len(codes) == 8
    assert all(0 <= c < 16 for c in codes)
    # encoding matches a driver-side numpy argmin for one vector
    v = np.asarray(emb.select("embedding").first()["embedding"], float)
    first = enc.select("embedding", "pq_codes").first()
    v = np.asarray(first["embedding"], float)
    want = [int(((v[j * 8:(j + 1) * 8] - books[j]) ** 2).sum(1).argmin())
            for j in range(8)]
    assert list(first["pq_codes"]) == want


def test_pq_full_rescore_equals_exact(spark):
    """rescore wide enough to cover the corpus -> exact top-k."""
    emb = load_table(spark, SF001, "embeddings")
    exact = [r["vec_id"] for r in
             similarity.knn_topk(emb, QUERY_VEC, k=10).collect()]
    got = [i for i, _ in _pq_ids_scores(spark, rescore=100)]
    assert got == exact


def test_ivfpq_store_recall_pruning_and_exact_scores(spark, tmp_path):
    """The composed IVFPQ store must (a) prune unprobed cells at the
    PARTITION level, (b) keep recall above the gate floor, (c) return
    EXACT cosine scores (rescoring), and (d) recover the exact top-k
    when probing every cell with corpus-wide rescore."""
    emb = load_table(spark, SF001, "embeddings")
    path = str(tmp_path / "ivfpq")
    pq.ivfpq_build_store(emb, path, n_lists=8, m=8, k_codes=32)

    out = pq.ivfpq_search_store(spark, path, QUERY_VEC, k=10,
                                n_probe=4)
    rows = out.collect()
    assert len(rows) == 10
    exact = similarity.knn_topk(emb, QUERY_VEC, k=500).collect()
    exact_ids = [r["vec_id"] for r in exact[:10]]
    recall = len(set(exact_ids) & {r["vec_id"] for r in rows}) / 10
    assert recall >= 0.5, f"IVFPQ recall@10 too low: {recall}"
    # rescored scores are exact cosine
    escore = {r["vec_id"]: round(r["score"], 6) for r in exact}
    for r in rows:
        assert abs(escore[r["vec_id"]] - r["score"]) < 1e-9
    # candidate scan carries cell IN (...) as a partition filter
    plan = out._jdf.queryExecution().executedPlan().toString()
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "cell" in pf[0] and "IN" in pf[0].upper()
    # probe everything + corpus-wide rescore -> exact top-k
    full = [r["vec_id"] for r in
            pq.ivfpq_search_store(spark, path, QUERY_VEC, k=10,
                                  n_probe=8, rescore=100).collect()]
    assert full == exact_ids


def test_ivfpq_deterministic(spark, tmp_path):
    emb = load_table(spark, SF001, "embeddings")
    a_path, b_path = str(tmp_path / "a"), str(tmp_path / "b")
    got = []
    for p in (a_path, b_path):
        pq.ivfpq_build_store(emb, p, n_lists=8, m=8, k_codes=32)
        got.append([(r["vec_id"], r["score"]) for r in
                    pq.ivfpq_search_store(spark, p, QUERY_VEC,
                                          k=10).collect()])
    assert got[0] == got[1]


def test_ivfpq_n_candidates_knob(spark, tmp_path):
    """numCandidates semantics (two-stage rerank, vector_search.py:67):
    n_candidates overrides k*rescore as the exact-rerank shortlist;
    wide-open shortlist at full probes recovers the exact top-k, a
    1-row shortlist degenerates to the single best ADC candidate, and
    round_to=None keeps raw (unrounded) cosine scores."""
    emb = load_table(spark, SF001, "embeddings")
    path = str(tmp_path / "ivfpq_cand")
    pq.ivfpq_build_store(emb, path, n_lists=8, m=8, k_codes=32)
    exact = similarity.knn_topk(emb, QUERY_VEC, k=10).collect()
    exact_ids = [r["vec_id"] for r in exact]

    full = pq.ivfpq_search_store(spark, path, QUERY_VEC, k=10,
                                 n_probe=8, n_candidates=10_000,
                                 round_to=None).collect()
    assert [r["vec_id"] for r in full] == exact_ids
    # raw scores: bit-equal to the exact operator's raw cosine
    eraw = {r["vec_id"]: r["score"] for r in
            similarity.knn_topk(emb, QUERY_VEC, k=500).collect()}
    for r in full:
        assert r["score"] == round(eraw[r["vec_id"]], 6) or \
            abs(r["score"] - eraw[r["vec_id"]]) < 1e-12

    one = pq.ivfpq_search_store(spark, path, QUERY_VEC, k=10,
                                n_probe=8, n_candidates=1).collect()
    assert len(one) == 1, "shortlist of 1 must yield exactly 1 row"
