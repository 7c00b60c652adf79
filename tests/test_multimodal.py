"""Multimodal plumbing: binary column semantics, deterministic decode,
real-backend stub contract."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from production_grade_rag_spark.operators import multimodal as mm
from production_grade_rag_spark.sources import load_table

from conftest import SF001


def test_attach_binary_schema_and_bytes(spark):
    docs = load_table(spark, SF001, "documents").limit(5)
    media = mm.attach_binary(docs)
    row = media.select("text", "content_bytes", "media_meta").first()
    assert bytes(row["content_bytes"]) == row["text"].encode("utf-8")
    assert row["media_meta"]["n_bytes"] == len(row["text"].encode("utf-8"))
    assert row["media_meta"]["modality"] == "image"


def test_fake_decode_matches_local_hash(spark):
    docs = load_table(spark, SF001, "documents").limit(10)
    feats = {r["doc_id"]: r for r in
             mm.decode_features(mm.attach_binary(docs)).collect()}
    for r in docs.select("doc_id", "text").collect():
        payload = r["text"].encode("utf-8")
        exp = mm.fake_decode_bytes(payload)
        got = feats[r["doc_id"]]
        assert got["n_bytes"] == exp["n_bytes"]
        assert got["width"] == exp["width"]
        assert got["height"] == exp["height"]
        assert list(got["features"]) == exp["features"]
        assert len(got["features"]) == mm.N_FEATURES
        # and the whole thing is just md5 of the payload
        assert exp["width"] == 1 + int(
            hashlib.md5(payload).hexdigest()[:4], 16) % 2048


def test_real_backend_is_explicit_stub(spark):
    docs = load_table(spark, SF001, "documents").limit(1)
    with pytest.raises(NotImplementedError):
        mm.decode_features(mm.attach_binary(docs), backend="real")


def test_frame_sample_bounds(spark):
    docs = load_table(spark, SF001, "documents").limit(50).select(
        "doc_id", (F.col("n_chars") / 100.0).alias("duration_s"))
    out = mm.frame_sample(docs)
    per = out.groupBy("doc_id").count().collect()
    assert all(1 <= r["count"] <= 5 for r in per)
    assert out.filter((F.col("frame_ts") < 0)).count() == 0
