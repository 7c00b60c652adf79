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


def test_normalized_vectors_are_unit_or_zero(spark):
    docs = load_table(spark, SF001, "documents").limit(40) \
        .select("doc_id", F.col("text").alias("content"))
    for r in hash_embed(docs, id_col="doc_id", dim=32).collect():
        n = math.sqrt(sum(x * x for x in r["embedding"]))
        assert math.isclose(n, 1.0, abs_tol=1e-9) or n == 0.0
