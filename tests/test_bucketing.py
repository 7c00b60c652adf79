"""Bucketed co-located joins (SURVEY §2.11 / §7.2 phase 5: the
reference's btree indexes become partition/bucket layout in Spark).
Writing both sides bucketed by the join key lets the join run without
any Exchange — at 100 TB this is the difference between a full-table
shuffle and a local zip of pre-sorted buckets."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from production_grade_rag_spark.operators.chunking import chunk_fixed
from production_grade_rag_spark.sources import load_table

from conftest import SF001


@pytest.fixture(scope="module")
def warehouse(spark):
    tmp = tempfile.mkdtemp(prefix="pgrs_wh_")
    yield tmp
    spark.sql("DROP TABLE IF EXISTS b_docs")
    spark.sql("DROP TABLE IF EXISTS b_chunks")
    shutil.rmtree(tmp, ignore_errors=True)


def test_bucketed_join_has_no_exchange(spark, warehouse):
    docs = load_table(spark, SF001, "documents")
    chunks = chunk_fixed(docs).select("chunk_id", "doc_id", "word_count")
    (docs.select("doc_id", "source").write.mode("overwrite")
         .option("path", f"{warehouse}/b_docs")
         .bucketBy(8, "doc_id").sortBy("doc_id").saveAsTable("b_docs"))
    (chunks.write.mode("overwrite")
           .option("path", f"{warehouse}/b_chunks")
           .bucketBy(8, "doc_id").sortBy("doc_id").saveAsTable("b_chunks"))

    # force the shuffle-join path (tiny test tables would broadcast,
    # which sidesteps bucketing; at 100 TB neither side broadcasts)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (spark.table("b_chunks").join(spark.table("b_docs"), "doc_id")
                  .groupBy("source").agg(F.sum("word_count").alias("w")))
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # the join itself must not shuffle either side
    join_part = plan.split("HashAggregate")[-1]
    assert "Exchange" not in join_part, f"bucketed join still shuffles:\n{plan}"
    assert "SortMergeJoin" in plan and "Bucketed: true" in plan

    # and results equal the unbucketed join
    plain = (chunks.join(docs.select("doc_id", "source"), "doc_id")
             .groupBy("source").agg(F.sum("word_count").alias("w")))
    assert sorted(map(tuple, joined.collect())) == \
           sorted(map(tuple, plain.collect()))
