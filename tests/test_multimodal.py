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


def test_audio_windows_layout(spark):
    from production_grade_rag_spark.operators import multimodal
    rows = [(1, 40000), (2, 16000), (3, 0), (4, 7000)]
    df = spark.createDataFrame(rows, ["doc_id", "n_samples"])
    out = multimodal.audio_windows(df)
    by_doc = {}
    for r in out.collect():
        by_doc.setdefault(r["doc_id"], []).append(
            (r["window_index"], r["start_sample"], r["end_sample"]))
    for v in by_doc.values():
        v.sort()
    # 40000 samples: windows at 0/8000/16000/24000 -> 4 windows,
    # ceil((40000-16000)/8000)=3 plus the first
    assert by_doc[1] == [(0, 0, 16000), (1, 8000, 24000),
                         (2, 16000, 32000), (3, 24000, 40000)]
    # exactly one full window
    assert by_doc[2] == [(0, 0, 16000)]
    # empty payload still yields one (empty) window
    assert by_doc[3] == [(0, 0, 0)]
    # short payload truncates
    assert by_doc[4] == [(0, 0, 7000)]
