"""Flagship end-to-end slice (SURVEY §7.1):

ingest -> clean (T1) -> quality score+filter (T2/T3) -> chunk (M1) ->
embed (M3) -> top-k similarity (R4/W1) -> source attribution (R1).

This is the reference's rag_pipeline + similarity strategy
(rag_pipeline.py:189-236 -> vector_search.py:37-95 ->
source_attribution.py:23-129) as ONE DataFrame DAG: Catalyst fuses the
clean/score/chunk projections into the parquet scan stage, the only
shuffle is the embedder's (id, bucket) agg, and attribution is an
AQE-planned hash join (the reference's dict cache, distributed —
broadcast while the attrs fit, shuffled beyond).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as X
from ..operators.chunking import chunk_fixed
from ..operators.embedding import embed_text_py, hash_embed
from ..operators.similarity import knn_topk
from ..sources import load_table

FLAGSHIP_QUERY = "spark query fast table scan"


def flagship_search(spark: SparkSession, sf_dir: str, k: int = 10,
                    dim: int = 64) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    scored = X.with_quality(docs)                               # T2
    kept = X.quality_filter(scored, 0.3)                        # T3
    chunks = chunk_fixed(kept, chunk_size=400, overlap=80)      # T1+M1+T4+W2
    emb = hash_embed(chunks, text_col="content",
                     id_col="chunk_id", dim=dim)                # M3
    qv = embed_text_py(FLAGSHIP_QUERY, dim=dim)
    top = knn_topk(emb, qv, k=k, id_col="chunk_id")             # R4+T5+W1
    # R1: attribution join.  The attribution side is the full documents
    # projection — corpus-scaled, NOT a fixed dimension — and the
    # stream side is only k rows, so no forced broadcast: AQE
    # broadcasts the attrs while they fit and shuffle-joins beyond
    # (same policy as q3/s11).  quality_score is recomputed AFTER the
    # join, on the k surviving rows only — scoring is a regex-heavy
    # projection, and computing it on the attribution branch too would
    # mean a second full-corpus scoring pass (DAG branches don't share
    # subtree results without caching); post-join it costs k rows.
    attrib = docs.select("doc_id", F.col("source").alias("source_type"),
                         F.col("lang").alias("doc_lang"), "text")
    return (top.join(attrib, "doc_id", "left")
               .withColumn("quality_score",
                           X.quality_components(F.col("text"))["quality_score"])
               .select("chunk_id", "doc_id", "content",
                       F.round("score", 6).alias("score"),
                       "source_type", "doc_lang", "quality_score"))
