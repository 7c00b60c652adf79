"""Multimodal columns (beyond-reference, mandated by BASELINE.json).

Design: image/audio/video payloads are opaque ``binary`` columns with a
typed metadata struct alongside (mime_type, n_bytes, modality).  All
Spark-side plumbing — schema, partitioning, Arrow batch shape, UDF
signatures — is real and tested; the actual media decode is STUBBED
because no image/audio library ships in this container:

- ``backend="fake"`` (default): deterministic md5-derived features, so
  the whole path is reproducible AND oracle-checkable in DuckDB.
- ``backend="real"``: raises NotImplementedError at plan-build time
  with the integration point documented — a per-executor decoder
  singleton inside the same mapInPandas iterator.

100 TB notes: decode runs as mapInPandas over Arrow batches — one
narrow pass, no shuffle, parallel per input partition; cap batch bytes
via spark.sql.execution.arrow.maxRecordsPerBatch when payloads are
large, and store media in its own parquet column so column pruning
skips it for metadata-only queries.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

N_FEATURES = 8


def attach_binary(df: DataFrame, text_col: str = "text",
                  modality: str = "image") -> DataFrame:
    """Treat a column's bytes as an opaque media payload: binary content
    + typed metadata struct.  (Testdata has no real media; utf-8 text
    bytes stand in — the engine never interprets them.)"""
    content = F.encode(F.col(text_col), "utf-8")
    return df.withColumn("content_bytes", content).withColumn(
        "media_meta",
        F.struct(F.lit(f"application/x-{modality}").alias("mime_type"),
                 F.length(content).alias("n_bytes"),
                 F.lit(modality).alias("modality")))


_FEATURE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_bytes", T.IntegerType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("features", T.ArrayType(T.DoubleType())),
])


def fake_decode_bytes(payload: bytes) -> dict:
    """Deterministic stand-in for a media decoder: md5-derived
    dimensions + N_FEATURES floats in [0, 1].  Pure function of the
    bytes — the DuckDB oracle replicates it exactly."""
    h = hashlib.md5(payload).hexdigest()
    return {
        "n_bytes": len(payload),
        "width": 1 + int(h[0:4], 16) % 2048,
        "height": 1 + int(h[4:8], 16) % 2048,
        "features": [int(h[2 * i: 2 * i + 2], 16) / 255.0
                     for i in range(N_FEATURES)],
    }


def decode_features(df: DataFrame, id_col: str = "doc_id",
                    bytes_col: str = "content_bytes",
                    backend: str = "fake") -> DataFrame:
    """Decode + feature-extract over binary payloads via mapInPandas.

    ``backend="real"`` is the integration point for an actual decoder
    (PIL/librosa/decord singleton per executor, initialized lazily in
    the iterator closure exactly where ``fake_decode_bytes`` is called).
    """
    if backend != "fake":
        raise NotImplementedError(
            "media decode backend %r: no media library ships in this "
            "container; plug a per-executor decoder singleton into "
            "decode_features._decode (same mapInPandas shape)" % backend)

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[bytes_col]):
                rec = fake_decode_bytes(bytes(payload))
                rec["doc_id"] = doc_id
                rows.append(rec)
            yield pd.DataFrame(rows,
                               columns=[f.name for f in _FEATURE_SCHEMA.fields])

    return (df.select(id_col, bytes_col)
              .mapInPandas(_decode, schema=_FEATURE_SCHEMA))


N_GRID_CELLS = 16

_GRID_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("cells", T.ArrayType(T.LongType())),
])


def grid_features(df: DataFrame, id_col: str = "doc_id",
                  bytes_col: str = "content_bytes",
                  backend: str = "fake") -> DataFrame:
    """Per-region luminance grid for perceptual hashing: one integer
    cell value (0-255) per grid region — the input aHash/pHash
    consume (production uses an 8x8 = 64-cell grid; the fake backend
    emits the 16 md5 bytes of the payload, a deterministic stand-in
    a real downscale-and-average drops into at the same iterator
    point).  Same Arrow mapInPandas shape as decode_features, wider
    hash domain (the 8-feature path's 8-bit hash collides
    quadratically at corpus scale — see mm_ahash_neardup)."""
    if backend != "fake":
        raise NotImplementedError(
            "grid backend %r: no media library ships in this "
            "container; plug a downscale-and-average into "
            "grid_features' iterator" % backend)

    def _grid(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[bytes_col]):
                h = hashlib.md5(bytes(payload)).hexdigest()
                rows.append({
                    "doc_id": doc_id,
                    "cells": [int(h[2 * i: 2 * i + 2], 16)
                              for i in range(N_GRID_CELLS)],
                })
            yield pd.DataFrame(rows, columns=["doc_id", "cells"])

    return (df.select(id_col, bytes_col)
              .mapInPandas(_grid, schema=_GRID_SCHEMA))


_RESIZE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("new_width", T.IntegerType()),
    T.StructField("new_height", T.IntegerType()),
    T.StructField("resized_bytes", T.BinaryType()),
])


def resize_fit(df: DataFrame, target: int = 224,
               id_col: str = "doc_id",
               bytes_col: str = "content_bytes",
               backend: str = "fake") -> DataFrame:
    """Aspect-preserving fit-resize plumbing (the standard 224-target
    preprocessing step): mapInPandas over Arrow batches emits the
    resized payload plus old/new dimensions.  The fake backend derives
    dims via ``fake_decode_bytes`` and "resamples" by truncating the
    payload proportionally to the pixel-count change — EXACT integer
    arithmetic ((w*target)//max_side etc.), so the whole UDF path
    including the output byte content is DuckDB-oracle-checked; a real
    backend (PIL thumbnail per executor) drops into the same iterator."""
    if backend != "fake":
        raise NotImplementedError(
            "resize backend %r: no media library ships in this "
            "container; plug PIL into resize_fit's iterator" % backend)

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[bytes_col]):
                payload = bytes(payload)
                rec = fake_decode_bytes(payload)
                w, h = rec["width"], rec["height"]
                mx = max(w, h)
                if mx <= target:      # thumbnail semantics: never upscale
                    nw, nh = w, h
                else:
                    nw = max(1, (w * target) // mx)
                    nh = max(1, (h * target) // mx)
                n_out = max(1, (len(payload) * nw * nh) // (w * h))
                rows.append({
                    "doc_id": doc_id, "width": w, "height": h,
                    "new_width": nw, "new_height": nh,
                    "resized_bytes": payload[:n_out],
                })
            yield pd.DataFrame(rows, columns=[
                f.name for f in _RESIZE_SCHEMA.fields])

    return (df.select(id_col, bytes_col)
              .mapInPandas(_resize, schema=_RESIZE_SCHEMA))


def frame_sample(df: DataFrame, id_col: str = "doc_id",
                 duration_col: str = "duration_s",
                 max_frames: int = 5) -> DataFrame:
    """Frame-sampling plan for video payloads: pick up to ``max_frames``
    evenly spaced timestamps per item — pure column arithmetic (the
    decode of each sampled frame would then run through
    ``decode_features``).  One row per (item, frame_index)."""
    dur = F.col(duration_col).cast("double")
    base = df.select(
        F.col(id_col), dur.alias("__dur"),
        F.least(F.lit(max_frames),
                F.greatest(F.ceil(dur).cast("int"), F.lit(1))).alias("__n"))
    return (base
            .withColumn("frame_index",
                        F.explode(F.sequence(F.lit(0), F.col("__n") - 1)))
            .select(id_col,
                    F.col("frame_index").cast("int").alias("frame_index"),
                    F.round(F.col("__dur") * F.col("frame_index") / F.col("__n"), 6)
                     .alias("frame_ts")))


def audio_windows(df: DataFrame, id_col: str = "doc_id",
                  n_samples_col: str = "n_samples",
                  sample_rate: int = 16_000,
                  window_s: float = 1.0,
                  hop_s: float = 0.5) -> DataFrame:
    """Audio analysis-window plan: fixed-length windows with hop (the
    STFT/feature-frame layout) — pure integer column arithmetic, one
    row per (item, window_index) with [start_sample, end_sample)
    offsets; the final window truncates at the payload end, and empty
    payloads still get one empty window.  Each window's byte range
    would then feed ``decode_features`` for the actual feature pass.

    Window math stays in exact integers (samples, not seconds) so the
    plan is oracle-replayable; the count is
    1 + max(0, ceil((n_samples - win) / hop)).
    """
    win = int(sample_rate * window_s)
    hop = int(sample_rate * hop_s)
    ns = F.col(n_samples_col).cast("long")
    # integer ceil-div via (a + b - 1) div b, clamped before the div's
    # truncate-toward-zero can disagree with floor on negatives
    n_win = F.lit(1) + F.greatest(
        F.lit(0).cast("long"),
        F.expr(f"({n_samples_col} - {win} + {hop - 1}) div {hop}"))
    base = df.select(F.col(id_col), ns.alias("__ns"),
                     n_win.alias("__n_win"))
    return (base
            .withColumn("window_index",
                        F.explode(F.sequence(F.lit(0), F.col("__n_win") - 1)))
            .select(id_col,
                    F.col("window_index").cast("int").alias("window_index"),
                    (F.col("window_index") * hop).cast("long")
                    .alias("start_sample"),
                    F.least(F.col("window_index") * hop + win,
                            F.col("__ns")).cast("long").alias("end_sample")))
