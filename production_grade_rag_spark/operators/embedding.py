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
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.text import WORD_SPLIT_RE, pystrip
from .dedup import explode_attr


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
    # r15: project the token array BEFORE exploding it — handing the
    # generator an inline tokenize() expression makes the optimizer's
    # inferred non-empty filter re-evaluate the strip+split regex per
    # row (the dedup.shingles_of lesson); an attribute reference keeps
    # it to one evaluation.  Same rows, same multiplicity.
    toks = (df.select(F.col(id_col),
                      tokenize(F.col(text_col)).alias("__toks"))
              .select(F.col(id_col),
                      explode_attr(F.col("__toks")).alias("__tok"))
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

    r15: the assembled array and its norm are materialized as REAL
    projections before the normalize step.  The old form passed the
    whole map-assembly tree into ``l2_normalize``, whose per-element
    division lambda inlines the norm subtree — which itself inlines
    the dim-element assembly twice — so each row paid O(dim^2)
    interpreted map lookups (~295k element_at calls per row at the
    flagship's dim=384).  Factored over attributes the math is the
    SAME double ops in the same order: the zero-token and zero-norm
    rows still come out as the raw zero vector (norm(0)=0 hits the
    same ``when`` branch l2_normalize used), so every consumer oracle
    stands (pinned by tests/test_embedding.py).
    """
    from ..functions.vector import norm
    sums = (hash_components(df, text_col, id_col, dim)
            .groupBy(id_col)
            .agg(F.map_from_entries(
                F.collect_list(F.struct(F.col("bucket").alias("__bucket"),
                                        F.col("val").alias("__val")))).alias("__m")))
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: F.coalesce(F.element_at(F.col("__m"), j.cast("long")), F.lit(0.0)),
    )
    out = (df.join(sums, id_col, "left")
             .withColumn("__vec", F.when(F.col("__m").isNull(),
                                         F.array_repeat(F.lit(0.0), dim))
                                   .otherwise(vec))
             .drop("__m"))
    if normalize:
        out = (out.withColumn("__n", norm(F.col("__vec")))
                  .withColumn(out_col, F.when(
                      F.col("__n") == 0, F.col("__vec"))
                      .otherwise(F.transform(
                          F.col("__vec"),
                          lambda x: x / F.col("__n"))))
                  .drop("__vec", "__n"))
    else:
        out = out.withColumnRenamed("__vec", out_col)
    return out.withColumn("embedding_model", F.lit(f"hash-{dim}"))


# --------------------------------------------------------------------------
# r16: Arrow-vectorized embedder (optimization guide §4.2/§4.3).
#
# The builtin ``hash_embed`` pays one interpreted md5+conv+pmod chain
# per token (~225k tokens/corpus at sf0.1) plus two shuffles and a
# join to assemble the dense array.  The same math per ROW in a batched
# pandas UDF is one C-speed md5 per DISTINCT token (process-level
# memo), zero shuffles, zero joins — and it is BIT-identical:
# - bucket sums accumulate ±1.0 in doubles, exact integers (< 2^53);
# - the norm is sqrt over a sum of exact integer squares — exact in
#   any order, and IEEE sqrt/division match the JVM's;
# so the arrow path equals ``embed_text_py`` by construction (same
# statements) and ``hash_embed`` by the pinned twin test
# (tests/test_embedding.py).
# --------------------------------------------------------------------------

# process-level token -> (md5-high-32, sign) memo: tokens are Zipfian,
# so the md5 work collapses to one call per distinct token per worker.
# Bounded so a 100 TB vocabulary cannot grow a worker's RSS unbounded
# (guide §5): past the cap, misses just recompute.
_TOK_HS: dict[str, tuple[int, float]] = {}
_TOK_HS_CAP = 1 << 20


def _tok_hs(tok: str) -> tuple[int, float]:
    c = _TOK_HS.get(tok)
    if c is None:
        h = hashlib.md5(tok.encode()).hexdigest()
        c = (int(h[:8], 16), 1.0 if int(h[8], 16) % 2 == 0 else -1.0)
        if len(_TOK_HS) < _TOK_HS_CAP:
            _TOK_HS[tok] = c
    return c


def _embed_batch(texts: list, dim: int, normalize: bool) -> list[list[float]]:
    """Batched twin of ``embed_text_py`` (same statements, memoized
    md5) — one list of dense vectors per Arrow batch."""
    out = []
    for t in texts:
        vec = [0.0] * dim
        for tok in ("" if t is None else str(t)).strip().lower().split():
            h32, sign = _tok_hs(tok)
            vec[h32 % dim] += sign
        if normalize:
            n = sum(x * x for x in vec) ** 0.5
            if n > 0:
                vec = [x / n for x in vec]
        out.append(vec)
    return out


def hash_embed_arrow(df: DataFrame, text_col: str = "content",
                     dim: int = 64, normalize: bool = True,
                     out_col: str = "embedding") -> DataFrame:
    """Dense feature-hash embedding via one ArrowEvalPython node —
    value-identical to ``hash_embed`` (pinned by tests/test_embedding
    ::test_hash_embed_arrow_equals_builtin), with the explode/agg/join
    assembly replaced by a per-row batched computation.  The right
    backend when the dense vector is what downstream consumes (the
    flagship cosine); keep ``hash_embed``/``hash_components`` where
    the sparse relational view is the product."""

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def embed_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for texts in batches:
            yield pd.Series(_embed_batch(texts.tolist(), dim, normalize))

    return (df.withColumn(out_col, embed_udf(F.col(text_col)))
              .withColumn("embedding_model", F.lit(f"hash-{dim}")))


def _components_batch(texts: list, dim: int) -> list[list[dict]]:
    out = []
    for t in texts:
        d: dict[int, float] = {}
        for tok in ("" if t is None else str(t)).strip().lower().split():
            h32, sign = _tok_hs(tok)
            b = h32 % dim
            d[b] = d.get(b, 0.0) + sign
        out.append([{"bucket": b, "val": v} for b, v in d.items()])
    return out


def hash_components_arrow(df: DataFrame, text_col: str = "content",
                          id_col: str = "chunk_id",
                          dim: int = 64) -> DataFrame:
    """Sparse (id, bucket, val) components via one ArrowEvalPython
    node + explode — same rows as ``hash_components`` (bucket sums are
    exact signed-integer arithmetic; docs with zero tokens emit no
    rows in both forms), without the per-token interpreted md5 chain
    and the (id, bucket) shuffle: each doc's components are folded in
    the Python worker and only the (small) per-doc component set is
    exploded.  Pinned equal in tests/test_embedding.py."""

    @F.pandas_udf(T.ArrayType(T.StructType([
        T.StructField("bucket", T.LongType()),
        T.StructField("val", T.DoubleType())])))
    def comp_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for texts in batches:
            yield pd.Series(_components_batch(texts.tolist(), dim))

    return (df.select(F.col(id_col), comp_udf(F.col(text_col)).alias("__c"))
              .select(F.col(id_col),
                      explode_attr(F.col("__c"),
                                   "struct<bucket:bigint,val:double>")
                      .alias("__e"))
              .select(F.col(id_col), F.col("__e.bucket").alias("bucket"),
                      F.col("__e.val").alias("val")))


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


# ===========================================================================
# M3 model-backed backend (reference document_processor.py:125-150)
# ===========================================================================

# per-process encoder singletons: one python worker process per executor
# core holds at most one loaded model per cache key, loaded lazily on
# the first Arrow batch it sees (the reference's EmbeddingGenerator
# .initialize() lazy-load, document_processor.py:130-135).  The key is
# (model_name, factory identity) — NOT model_name alone — so two
# model_embed calls with the same model_name but different factories
# (e.g. fake vs real in one long-lived worker) never reuse each other's
# encoder.  Factories advertise identity via a ``cache_key`` attribute.
_MODEL_CACHE: dict = {}

DEFAULT_MODEL = "sentence-transformers/all-MiniLM-L6-v2"  # settings.py:44
DEFAULT_BATCH = 32                                        # rag_config.yaml:26


def model_available() -> bool:
    """True when the sentence-transformers library is importable."""
    try:
        import sentence_transformers  # noqa: F401
        return True
    except ImportError:
        return False


def sentence_transformer_factory(model_name: str):
    """Factory returning an ``encode(texts, normalize) -> list[list
    [float]]`` closure over a real SentenceTransformer.  Import happens
    inside the returned loader, ON THE EXECUTOR, so the driver never
    needs the library to build the plan."""

    def load():
        from sentence_transformers import SentenceTransformer
        model = SentenceTransformer(model_name)

        def encode(texts: list[str], normalize: bool):
            out = model.encode(texts, convert_to_numpy=True,
                               show_progress_bar=False,
                               normalize_embeddings=normalize)
            return out.tolist()

        return encode

    load.cache_key = f"st:{model_name}"
    return load


def fake_model_factory(model_name: str, dim: int = 64):
    """Deterministic stand-in encoder for environments without the
    model library: SAME plumbing (iterator UDF, per-executor singleton,
    batch slicing), hash-math values — so the Spark side of the model
    path is fully exercised and reproducible."""

    def load():
        def encode(texts: list[str], normalize: bool):
            return [embed_text_py(t, dim, normalize) for t in texts]

        return encode

    load.cache_key = f"fake:{model_name}:{dim}"
    return load


def _default_factory(model_name: str, encoder_factory):
    """Resolve the encoder factory: explicit one wins; otherwise the
    real sentence-transformers loader (raising early when the library
    is absent so the failure happens driver-side, not mid-job)."""
    if encoder_factory is not None:
        return encoder_factory
    if not model_available():
        raise ImportError(
            "sentence-transformers is not installed; use "
            "embed(df, backend='auto') for the hash fallback or "
            "pass encoder_factory=fake_model_factory(...)")
    return sentence_transformer_factory(model_name)


def _factory_key(model_name: str, encoder_factory) -> tuple:
    return (model_name,
            getattr(encoder_factory, "cache_key",
                    getattr(encoder_factory, "__qualname__",
                            repr(encoder_factory))))


def encode_query(text: str, model_name: str = DEFAULT_MODEL,
                 normalize: bool = True, encoder_factory=None) -> list[float]:
    """Query-side twin of ``model_embed`` — encode ONE string
    driver-side with the SAME factory/cache machinery, so a model-built
    index can be searched end-to-end (the reference encodes queries
    with the same model as chunks, advanced_search.py:320-324).

    The driver process keeps its own ``_MODEL_CACHE`` singleton per
    (model_name, factory identity), exactly like each executor worker:
    the model loads once per driver lifetime, then every query is a
    single in-process ``encode`` call — no Spark job."""
    encoder_factory = _default_factory(model_name, encoder_factory)
    key = _factory_key(model_name, encoder_factory)
    enc = _MODEL_CACHE.get(key)
    if enc is None:
        enc = _MODEL_CACHE.setdefault(key, encoder_factory())
    return [float(x) for x in enc(["" if text is None else str(text)],
                                  normalize)[0]]


def model_embed(df: DataFrame, text_col: str = "content",
                model_name: str = DEFAULT_MODEL,
                batch_size: int = DEFAULT_BATCH, normalize: bool = True,
                out_col: str = "embedding",
                encoder_factory=None) -> DataFrame:
    """M3: model-backed embedding generation
    (document_processor.py:125-150; batch size rag_config.yaml:26).

    Iterator-form Arrow pandas UDF: the encoder loads ONCE per python
    worker (lazy singleton keyed by model_name) and then streams Arrow
    batches through ``encode`` in ``batch_size`` slices — the
    distributed twin of the reference's initialize-once-then-batch
    loop.  ``encoder_factory`` defaults to the real
    sentence-transformers loader; pass ``fake_model_factory(...)`` for
    a deterministic library-free run.

    100 TB notes: model load cost amortizes over a whole worker
    lifetime, Arrow transfers are zero-copy columnar, and nothing
    touches the driver; partitioning is inherited from the input (text
    rows are narrow — repartition upstream if the source was few large
    files).
    """
    encoder_factory = _default_factory(model_name, encoder_factory)
    # resolved driver-side, closed over by the UDF: custom factories
    # without a cache_key fall back to (model_name, qualname) which
    # still separates fake from real.
    cache_key = _factory_key(model_name, encoder_factory)

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def embed_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        enc = _MODEL_CACHE.get(cache_key)
        if enc is None:
            enc = _MODEL_CACHE.setdefault(cache_key, encoder_factory())
        for texts in batches:
            clean = ["" if t is None else str(t) for t in texts]
            vals: list[list[float]] = []
            for i in range(0, len(clean), batch_size):
                vals.extend([list(map(float, v)) for v in
                             enc(clean[i:i + batch_size], normalize)])
            yield pd.Series(vals)

    return (df.withColumn(out_col, embed_udf(F.col(text_col)))
              .withColumn("embedding_model", F.lit(model_name)))


def embed(df: DataFrame, backend: str = "auto", text_col: str = "content",
          id_col: str = "chunk_id", dim: int = 64, normalize: bool = True,
          out_col: str = "embedding", model_name: str = DEFAULT_MODEL,
          batch_size: int = DEFAULT_BATCH, encoder_factory=None) -> DataFrame:
    """Backend dispatch for M3:

    - ``"hash"``  : deterministic builtin-expression embedder.
    - ``"model"`` : sentence-transformers, or whatever
      ``encoder_factory`` supplies (raises if neither is available).
    - ``"auto"``  : model when the library is importable OR an explicit
      ``encoder_factory`` is given, else the documented hash fallback —
      the container-safe default.
    """
    if backend == "model" or (backend == "auto" and
                              (model_available()
                               or encoder_factory is not None)):
        return model_embed(df, text_col=text_col, model_name=model_name,
                           batch_size=batch_size, normalize=normalize,
                           out_col=out_col,
                           encoder_factory=encoder_factory)
    if backend in ("hash", "auto"):
        return hash_embed(df, text_col=text_col, id_col=id_col, dim=dim,
                          normalize=normalize, out_col=out_col)
    raise ValueError(f"unknown embedding backend {backend!r}")
