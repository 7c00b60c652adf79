"""Embedding generation (SURVEY §2.8 M3).

The reference embeds with sentence-transformers (document_processor.py:
125-150).  That model isn't in this container and is nondeterministic
across platforms, so the engine ships two backends behind one API:

- ``hash_embed``       : deterministic feature-hash embedder, 100%
  built-in expressions (explode -> md5 bucket/sign -> groupBy ->
  assemble).  The correctness path — reproducible everywhere, and the
  shape (one shuffle on the id) is exactly what a model embedder needs.
- ``hash_embed_pandas``: same math via an Arrow-batched pandas UDF —
  the slot where a real model (per-executor singleton, batched encode)
  plugs in; also serves as the UDF-path reference for tests.

Token hashing: bucket = int(md5(token)[:8], 16) % dim, sign from the
9th hex nibble — md5 because Spark, DuckDB, and Python all agree on it.

100 TB notes: the builtin path is explode + partial-agg (map-side
combine) + one shuffle on the row id; no driver collection, no skew
(ids are unique).  dim stays a column-free constant so Tungsten
codegens the assembly loop.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.text import WORD_SPLIT_RE, pystrip
from ..functions.vector import l2_normalize


def _bucket(tok: Column, dim: int) -> Column:
    return F.pmod(F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long"),
                  F.lit(dim))


def _sign(tok: Column) -> Column:
    nibble = F.conv(F.substring(F.md5(tok), 9, 1), 16, 10).cast("int")
    return F.when(nibble % 2 == 0, F.lit(1.0)).otherwise(F.lit(-1.0))


def tokenize(col: Column) -> Column:
    """Whitespace tokens, lowered, Python-strip first (F3 semantics)."""
    t = F.lower(pystrip(col))
    return F.when(F.length(t) == 0, F.array().cast("array<string>")) \
            .otherwise(F.split(t, WORD_SPLIT_RE))


def hash_components(df: DataFrame, text_col: str = "content",
                    id_col: str = "chunk_id", dim: int = 64) -> DataFrame:
    """Sparse components of the feature-hash embedding: one row per
    (id, bucket) with the signed token-count sum.  This is the partial
    (pre-assembly, pre-normalization) stage of ``hash_embed`` — exposed
    because it is fully relational (explode -> hash -> groupBy) and so
    oracle-checkable without array-stringification hazards."""
    toks = (df.select(F.col(id_col), F.explode(tokenize(F.col(text_col))).alias("__tok"))
              .select(F.col(id_col),
                      _bucket(F.col("__tok"), dim).alias("bucket"),
                      _sign(F.col("__tok")).alias("__sign")))
    return (toks.groupBy(id_col, "bucket")
                .agg(F.sum("__sign").alias("val")))


def hash_embed(df: DataFrame, text_col: str = "content",
               id_col: str = "chunk_id", dim: int = 64,
               normalize: bool = True,
               out_col: str = "embedding") -> DataFrame:
    """Deterministic feature-hash embedding, builtin-only.

    Plan: explode tokens -> hash to (bucket, sign) -> partial+final sum
    per (id, bucket) -> assemble dense array via map lookup.  Rows with
    zero tokens get the zero vector (left join keeps them).
    """
    sums = (hash_components(df, text_col, id_col, dim)
            .groupBy(id_col)
            .agg(F.map_from_entries(
                F.collect_list(F.struct(F.col("bucket").alias("__bucket"),
                                        F.col("val").alias("__val")))).alias("__m")))
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: F.coalesce(F.element_at(F.col("__m"), j.cast("long")), F.lit(0.0)),
    )
    if normalize:
        vec = l2_normalize(vec)
    out = (df.join(sums, id_col, "left")
             .withColumn(out_col, F.when(F.col("__m").isNull(),
                                         F.array_repeat(F.lit(0.0), dim))
                                   .otherwise(vec))
             .drop("__m")
             .withColumn("embedding_model", F.lit(f"hash-{dim}")))
    return out


def embed_text_py(text: str, dim: int = 64, normalize: bool = True) -> list[float]:
    """Pure-Python twin of ``hash_embed`` (for query vectors + tests)."""
    vec = [0.0] * dim
    toks = text.strip().lower().split()
    for tok in toks:
        h = hashlib.md5(tok.encode()).hexdigest()
        vec[int(h[:8], 16) % dim] += 1.0 if int(h[8], 16) % 2 == 0 else -1.0
    if normalize:
        n = sum(x * x for x in vec) ** 0.5
        if n > 0:
            vec = [x / n for x in vec]
    return vec


def hash_embed_pandas(df: DataFrame, text_col: str = "content",
                      dim: int = 64, normalize: bool = True,
                      out_col: str = "embedding") -> DataFrame:
    """Arrow-batched UDF backend — the plug point for a real model
    (sentence-transformers singleton per executor, reference
    rag_config.yaml:22-27); here it runs the deterministic hash math."""

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def embed_udf(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: embed_text_py(t or "", dim, normalize))

    return (df.withColumn(out_col, embed_udf(F.col(text_col)))
              .withColumn("embedding_model", F.lit(f"hash-{dim}")))
