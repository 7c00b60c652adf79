"""Streaming twins must agree with the batch operators on the same
data (closed windows only — availableNow drains everything, so every
window is closed)."""

from __future__ import annotations

from production_grade_rag_spark.plans.catalog import CATALOG
from production_grade_rag_spark.streaming import pipeline as sp

from conftest import SF001


def _rows(df, cols):
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


def test_hourly_counts_stream_matches_batch(spark):
    events = sp.read_event_stream(spark, SF001)
    out = sp.run_available_now(sp.hourly_counts(events), "t_hourly")
    batch = CATALOG["ev_hourly_event_counts"].build(spark, SF001)
    cols = ["window_start", "event_type", "n_events", "sum_value", "avg_value"]
    assert _rows(out, cols) == _rows(batch, cols)


def test_sessionize_stream_matches_batch(spark):
    events = sp.read_event_stream(spark, SF001)
    out = sp.run_available_now(sp.sessionized(events), "t_sessions")
    batch = CATALOG["ev_sessionize"].build(spark, SF001)
    # batch emits (user_id, session_id); compare on the session extents
    cols = ["user_id", "session_start", "session_end", "n_events", "sum_value"]
    assert _rows(out, cols) == _rows(batch.select(*cols), cols)
