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


def test_user_running_state_across_microbatches(spark, tmp_path):
    """applyInPandasWithState must carry state ACROSS micro-batches:
    split the events into 3 files, force one file per trigger, and the
    final per-user emission must equal the batch groupBy aggregate."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    src = str(tmp_path / "events_split")
    events = spark.read.parquet(f"{SF001}/events.parquet")
    events.repartition(3).write.parquet(src)

    raw = (spark.readStream.schema(sp.EVENTS_RAW_SCHEMA)
           .option("maxFilesPerTrigger", 1)
           .parquet(src))
    stream = (raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
                 .withWatermark("ts", "2 hours"))
    updates = sp.run_available_now(sp.user_running_state(stream),
                                   "t_user_state", output_mode="update")
    # >1 emission for at least one user proves multiple micro-batches ran
    assert updates.count() > updates.select("user_id").distinct().count()

    w = Window.partitionBy("user_id").orderBy(F.desc("event_count"))
    final = (updates.withColumn("rn", F.row_number().over(w))
             .filter("rn = 1").select("user_id", "event_count", "value_sum"))
    batch = (spark.read.parquet(f"{SF001}/events.parquet")
             .groupBy("user_id")
             .agg(F.count("*").alias("event_count"),
                  (F.sum(F.floor(F.col("value") * 10000).cast("long"))
                   / 10000.0).alias("value_sum")))
    cols = ["user_id", "event_count", "value_sum"]
    assert _rows(final, cols) == _rows(batch, cols)


def test_sessionize_stream_matches_batch(spark):
    events = sp.read_event_stream(spark, SF001)
    out = sp.run_available_now(sp.sessionized(events), "t_sessions")
    batch = CATALOG["ev_sessionize"].build(spark, SF001)
    # batch emits (user_id, session_id); compare on the session extents
    cols = ["user_id", "session_start", "session_end", "n_events", "sum_value"]
    assert _rows(out, cols) == _rows(batch.select(*cols), cols)


def test_stream_dedup_matches_batch_distinct(spark):
    from production_grade_rag_spark.streaming import pipeline as SP
    from production_grade_rag_spark.sources import load_table
    from conftest import SF001
    from pyspark.sql import functions as F
    stream = SP.dedup_stream(SP.read_document_stream(spark, SF001))
    out = SP.run_available_now(stream, "t_dedup_stream",
                               output_mode="append")
    docs = load_table(spark, SF001, "documents")
    batch_hashes = {r["h"] for r in docs.select(
        F.md5(F.coalesce("text", F.lit(""))).alias("h")).distinct().collect()}
    rows = out.collect()
    assert {r["content_hash"] for r in rows} == batch_hashes
    assert len(rows) == len(batch_hashes)   # exactly one survivor per hash
