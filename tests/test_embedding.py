"""M3 embedder: the three implementations (builtin expressions,
pandas-UDF, pure Python) must produce identical vectors, and normalized
vectors must be unit-length."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from production_grade_rag_spark.operators.embedding import (
    embed_text_py,
    hash_embed,
    hash_embed_pandas,
)
from production_grade_rag_spark.sources import load_table

from conftest import SF001


def test_builtin_equals_pandas_equals_python(spark):
    docs = load_table(spark, SF001, "documents").limit(40) \
        .select("doc_id", F.col("text").alias("content"))
    a = {r["doc_id"]: r["embedding"] for r in
         hash_embed(docs, id_col="doc_id", dim=32).collect()}
    b = {r["doc_id"]: r["embedding"] for r in
         hash_embed_pandas(docs, dim=32).select("doc_id", "embedding").collect()}
    texts = {r["doc_id"]: r["content"] for r in docs.collect()}
    assert set(a) == set(b) == set(texts)
    for k in a:
        c = embed_text_py(texts[k], dim=32)
        for x, y, z in zip(a[k], b[k], c):
            assert math.isclose(x, y, rel_tol=0, abs_tol=1e-12)
            assert math.isclose(x, z, rel_tol=0, abs_tol=1e-12)


def test_hash_embed_arrow_equals_builtin(spark):
    # r16: the ArrowEvalPython dense embedder is BIT-identical to the
    # builtin explode/agg/join form — bucket sums and the norm's sum of
    # squares are exact integer arithmetic in doubles, sqrt/division
    # are IEEE-identical across the JVM and CPython.  Edge rows: NULL,
    # empty, whitespace-only, and a sign-cancelling token pair.
    from production_grade_rag_spark.operators.embedding import hash_embed_arrow
    docs = load_table(spark, SF001, "documents").limit(40) \
        .select("doc_id", F.col("text").alias("content"))
    edge = spark.createDataFrame(
        [(9001, None), (9002, ""), (9003, "   \t\n  "),
         (9004, "alpha alpha beta"), (9005, "x")],
        "doc_id long, content string")
    both = docs.unionByName(edge)
    a = {r["doc_id"]: (r["embedding"], r["embedding_model"]) for r in
         hash_embed(both, id_col="doc_id", dim=32).collect()}
    b = {r["doc_id"]: (r["embedding"], r["embedding_model"]) for r in
         hash_embed_arrow(both, dim=32)
         .select("doc_id", "embedding", "embedding_model").collect()}
    assert set(a) == set(b)
    for k in a:
        assert a[k][1] == b[k][1]
        assert a[k][0] == b[k][0], f"doc {k} differs"
    # unnormalized form too (raw integer-count vectors)
    ar = {r["doc_id"]: r["embedding"] for r in
          hash_embed(both, id_col="doc_id", dim=32,
                     normalize=False).collect()}
    br = {r["doc_id"]: r["embedding"] for r in
          hash_embed_arrow(both, dim=32, normalize=False)
          .select("doc_id", "embedding").collect()}
    assert ar == br


def test_hash_components_arrow_equals_builtin(spark):
    # r16: the Arrow sparse-component fold emits exactly the relational
    # form's (id, bucket, val) rows — zero-token docs emit nothing,
    # sign-cancelled buckets keep their 0.0 row in both.
    from production_grade_rag_spark.operators.embedding import (
        hash_components, hash_components_arrow)
    docs = load_table(spark, SF001, "documents").limit(60) \
        .select("doc_id", F.col("text").alias("content"))
    edge = spark.createDataFrame(
        [(9001, None), (9002, ""), (9003, "   "), (9004, "only one")],
        "doc_id long, content string")
    both = docs.unionByName(edge)
    a = {(r["doc_id"], r["bucket"]): r["val"] for r in
         hash_components(both, id_col="doc_id", dim=32).collect()}
    b = {(r["doc_id"], r["bucket"]): r["val"] for r in
         hash_components_arrow(both, id_col="doc_id", dim=32).collect()}
    assert a == b
    assert not any(k[0] in (9001, 9002, 9003) for k in b)


def test_normalized_vectors_are_unit_or_zero(spark):
    docs = load_table(spark, SF001, "documents").limit(40) \
        .select("doc_id", F.col("text").alias("content"))
    for r in hash_embed(docs, id_col="doc_id", dim=32).collect():
        n = math.sqrt(sum(x * x for x in r["embedding"]))
        assert math.isclose(n, 1.0, abs_tol=1e-9) or n == 0.0


def test_model_embed_fake_backend_matches_hash_math(spark):
    # the fake encoder routes the SAME iterator-UDF/singleton/batch
    # plumbing as a real model; values equal the pure-Python twin.
    from production_grade_rag_spark.operators import embedding as E
    docs = load_table(spark, SF001, "documents").limit(40) \
        .select("doc_id", F.col("text").alias("content"))
    out = E.model_embed(
        docs, model_name="fake-minilm-32", batch_size=7,
        encoder_factory=E.fake_model_factory("fake-minilm-32", dim=32))
    rows = out.select("doc_id", "embedding", "embedding_model").collect()
    texts = {r["doc_id"]: r["content"] for r in docs.collect()}
    assert len(rows) == 40
    for r in rows:
        assert r["embedding_model"] == "fake-minilm-32"
        assert len(r["embedding"]) == 32
        expect = embed_text_py(texts[r["doc_id"]] or "", 32, True)
        assert all(math.isclose(x, y, abs_tol=1e-12)
                   for x, y in zip(r["embedding"], expect))
        n = math.sqrt(sum(x * x for x in r["embedding"]))
        assert n == 0.0 or math.isclose(n, 1.0, rel_tol=1e-9)


def test_embed_backend_dispatch(spark):
    from production_grade_rag_spark.operators import embedding as E
    import pytest
    docs = load_table(spark, SF001, "documents").limit(10) \
        .select("doc_id", F.col("text").alias("content"))
    h = E.embed(docs, backend="hash", id_col="doc_id", dim=16)
    assert h.select("embedding_model").first()["embedding_model"] == "hash-16"
    # auto falls back to hash when the model library is missing
    a = E.embed(docs, backend="auto", id_col="doc_id", dim=16)
    if E.model_available():
        assert a.select("embedding_model").first()["embedding_model"] \
            == E.DEFAULT_MODEL
    else:
        assert a.select("embedding_model").first()["embedding_model"] \
            == "hash-16"
        with pytest.raises(ImportError):
            E.model_embed(docs)
    with pytest.raises(ValueError):
        E.embed(docs, backend="nope")


def test_model_cache_keyed_by_factory_identity(spark):
    # two model_embed calls sharing a model_name but carrying DIFFERENT
    # encoder factories (dim 16 vs dim 32 fakes) must not reuse each
    # other's per-worker singleton — the cache key includes the factory
    # identity, not just model_name.
    from production_grade_rag_spark.operators import embedding as E
    docs = load_table(spark, SF001, "documents").limit(20) \
        .select("doc_id", F.col("text").alias("content"))
    a = E.model_embed(docs, model_name="shared-name",
                      encoder_factory=E.fake_model_factory("shared-name", dim=16))
    b = E.model_embed(docs, model_name="shared-name",
                      encoder_factory=E.fake_model_factory("shared-name", dim=32))
    # run in one action so both UDFs execute in the same python workers
    joined = a.select("doc_id", F.col("embedding").alias("e16")) \
        .join(b.select("doc_id", F.col("embedding").alias("e32")), "doc_id")
    for r in joined.collect():
        assert len(r["e16"]) == 16
        assert len(r["e32"]) == 32
