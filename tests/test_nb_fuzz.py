"""Hypothesis fuzz for the NB quality classifier's MATH — add-one
smoothing, the 1e-6 log-ratio quantization, prior, and the per-doc
integer score sum — against a plain-Python reference, on arbitrary
tiny labeled corpora (the Gopher labeler is fuzzed separately; here
labels are free booleans so degenerate classes are reachable:
all-positive, all-negative, single-token vocabularies)."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

_SCALE = 1_000_000


def _q(x: float) -> int:
    # round-half-away-from-zero of x*1e6 (Spark round / DuckDB round)
    y = x * _SCALE
    return int(math.floor(y + 0.5)) if y >= 0 else int(math.ceil(y - 0.5))


def nb_scores_py(docs):
    """docs: list of (doc_id, pos, [tok, ...]) -> {doc_id: score_s}."""
    cls: dict[str, list[int]] = {}
    for _, pos, toks in docs:
        for t in toks:
            c = cls.setdefault(t, [0, 0])
            c[0 if pos else 1] += 1
    n_pos_tok = float(sum(c[0] for c in cls.values()))
    n_neg_tok = float(sum(c[1] for c in cls.values()))
    v = float(len(cls))
    n_pos_docs = float(sum(1 for x in docs if x[1]))
    n_neg_docs = float(sum(1 for x in docs if not x[1]))
    lr = {t: _q(math.log((c[0] + 1.0) / (n_pos_tok + v))
                - math.log((c[1] + 1.0) / (n_neg_tok + v)))
          for t, c in cls.items()}
    prior = _q(math.log((n_pos_docs + 1.0) / (n_neg_docs + 1.0)))
    return {doc_id: prior + sum(lr[t] for t in toks)
            for doc_id, pos, toks in docs if toks}


TOK = st.sampled_from(["the", "a", "xx", "yy", "zz", "q"])


@settings(max_examples=25, deadline=None)
@given(st.lists(st.tuples(st.booleans(),
                          st.lists(TOK, min_size=0, max_size=6)),
                min_size=1, max_size=6))
def test_nb_scores_match_python(spark, labeled):
    # the registry entry point first: importing catalog_r8 directly
    # leaves it partially initialized when catalog.py's module chain
    # re-enters it (solo-run import order; the full suite imports the
    # registry earlier via the test_catalog_* modules)
    from production_grade_rag_spark.plans import catalog  # noqa: F401
    from production_grade_rag_spark.plans.catalog_r8 import _nb_scores_from
    docs = [(i, pos, toks) for i, (pos, toks) in enumerate(labeled)]
    if not any(t for _, _, t in docs):
        return  # empty vocabulary: no scored rows on either side
    base = spark.createDataFrame(docs, ["doc_id", "pos", "toks"])
    got = {r["doc_id"]: r["score_s"]
           for r in _nb_scores_from(base).collect()}
    assert got == nb_scores_py(docs)
