"""Query-time text relevance: Okapi BM25 + smoothed TF-IDF
(SURVEY §7.2 phase 4).

The reference's hybrid text branch is Atlas $search — Lucene BM25
(vector_search.py:141-160).  ``bm25_score`` is the faithful twin:

    score(d, Q) = sum_t idf_t * tf(t,d)*(k1+1)
                         / (tf(t,d) + k1*(1 - b + b*|d|/avgdl))
    idf_t       = ln(1 + (N - df_t + 0.5) / (df_t + 0.5))

with the classic Okapi defaults k1=1.2, b=0.75 — term-frequency
saturation (k1) and document-length normalization (b) included.  The
index-time corpus statistics BM25 needs (N, df_t, avgdl) are computed
on the fly as ONE tiny agg row and broadcast, so the per-row score
stays a pure column expression — JVM-side, whole-stage-codegen'd, and
exactly replayable as a DuckDB oracle.

``tfidf_score`` (sklearn-style smoothed idf, no saturation or length
norm) remains as the config fallback:

    score(d, Q) = sum_t  tf(t, d) * (ln((1 + N) / (1 + df_t)) + 1)

100 TB notes: corpus stats for a 6-term query are <10 numbers — no
inverted index materializes; avgdl is kept as (sum_dl, N) so the
average is one exact-integer-sum division, deterministic under any
partial-agg order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import english_tokens, std_tokens, stemmed_tokens
from .dedup import tokens


def _tokenizer(analyzer: str):
    """Analyzer dispatch: "whitespace" (the repo's F3 tokenizer),
    "standard" (the Lucene-standard twin the reference's $search index
    declares, index_manager.py:117-152 — strips punctuation, so
    "vector," matches query term "vector"), or "stemmed" (standard +
    the Porter-lite suffix chain, the lucene.english-shaped variant —
    "filtering"/"filtered"/"filters" all match query term "filter")."""
    if analyzer == "whitespace":
        return tokens
    if analyzer == "standard":
        return std_tokens
    if analyzer == "stemmed":
        return stemmed_tokens
    if analyzer == "english":
        return english_tokens
    raise ValueError(f"unknown analyzer {analyzer!r}")


def _count_term(toks: Column, term: str) -> Column:
    # closure factory, not a default-arg lambda: PySpark derives HOF
    # arity from the Python signature (build-notes pitfall).
    def eq(x):
        return x == F.lit(term)

    return F.size(F.filter(toks, eq))


def tfidf_score(docs: DataFrame, terms: list[str], text_col: str = "text",
                out_col: str = "text_score",
                analyzer: str = "whitespace") -> DataFrame:
    """Score every row against the query terms with smoothed TF-IDF.

    Plan: tokenize (expression) -> one global agg for (N, df_t) ->
    broadcast the 1-row stats -> per-row score expression.  Adds
    ``out_col``; preserves all input columns.
    """
    base = docs.withColumn(
        "__toks", _tokenizer(analyzer)(F.coalesce(F.col(text_col), F.lit(""))))
    aggs = [F.count("*").alias("__n_docs")]
    for i, t in enumerate(terms):
        aggs.append(F.sum((_count_term(F.col("__toks"), t) > 0)
                          .cast("long")).alias(f"__df_{i}"))
    stats = base.agg(*aggs)
    scored = base.crossJoin(F.broadcast(stats))
    expr = F.lit(0.0)
    for i, t in enumerate(terms):
        tf = _count_term(F.col("__toks"), t).cast("double")
        idf = F.log((F.lit(1.0) + F.col("__n_docs"))
                    / (F.lit(1.0) + F.col(f"__df_{i}"))) + F.lit(1.0)
        expr = expr + tf * idf
    drop = ["__toks", "__n_docs"] + [f"__df_{i}" for i in range(len(terms))]
    return scored.withColumn(out_col, expr).drop(*drop)


def bm25_score(docs: DataFrame, terms: list[str], text_col: str = "text",
               out_col: str = "text_score",
               k1: float = 1.2, b: float = 0.75,
               analyzer: str = "whitespace") -> DataFrame:
    """Score every row against the query terms with Okapi BM25
    (the reference's Lucene-$search scoring model,
    vector_search.py:141-160; k1/b are the Lucene defaults).

    Plan: tokenize (expression) -> one global agg for (N, df_t,
    sum_dl) -> broadcast the 1-row stats -> per-row score expression.
    avgdl enters the expression as sum_dl/N (exact integer sums) so
    the value is independent of partial-agg order.  Adds ``out_col``;
    preserves all input columns.
    """
    base = docs.withColumn(
        "__toks", _tokenizer(analyzer)(F.coalesce(F.col(text_col), F.lit(""))))
    aggs = [F.count("*").alias("__n_docs"),
            F.sum(F.size("__toks")).alias("__sumdl")]
    for i, t in enumerate(terms):
        aggs.append(F.sum((_count_term(F.col("__toks"), t) > 0)
                          .cast("long")).alias(f"__df_{i}"))
    stats = base.agg(*aggs)
    scored = base.crossJoin(F.broadcast(stats))
    avgdl = F.col("__sumdl").cast("double") / F.col("__n_docs").cast("double")
    dl = F.size("__toks").cast("double")
    # length norm shared by every term; fold order mirrors the oracle
    norm = F.lit(1.0) - F.lit(b) + F.lit(b) * dl / avgdl
    expr = F.lit(0.0)
    for i, t in enumerate(terms):
        tf = _count_term(F.col("__toks"), t).cast("double")
        idf = F.log(F.lit(1.0)
                    + (F.col("__n_docs") - F.col(f"__df_{i}") + F.lit(0.5))
                    / (F.col(f"__df_{i}") + F.lit(0.5)))
        expr = expr + idf * (tf * F.lit(k1 + 1.0)) / (tf + F.lit(k1) * norm)
    drop = (["__toks", "__n_docs", "__sumdl"]
            + [f"__df_{i}" for i in range(len(terms))])
    return scored.withColumn(out_col, expr).drop(*drop)


def prf_expansion_terms(docs: DataFrame, terms: list[str],
                        text_col: str = "text", n_top_docs: int = 5,
                        n_terms: int = 3) -> DataFrame:
    """Pseudo-relevance-feedback expansion mining (Rocchio 1971):
    TF-IDF-retrieve the ``n_top_docs`` best documents for ``terms``,
    then return the ``n_terms`` highest TF-IDF-mass terms across them
    (original terms excluded) as (term, w) with integer-scaled
    weights.  Deliberately model-independent (one fixed TF-IDF form
    with idf = ln((N+1)/(df+1)), contributions quantized to BIGINT
    before commutative sums) so the mining is value-oracle-able and
    identical wherever it is reused — the engine facade and the
    r11_prf_* catalog entries share this exact frame.

    Scale: tf/df are the usual inverted-index aggregates on flat
    token keys; the query term set broadcasts; top docs/terms are
    TakeOrdered."""
    id_col = "doc_id"
    tf = (docs.select(id_col, F.explode(tokens(F.col(text_col)))
                      .alias("tok"))
          .groupBy(id_col, "tok").agg(F.count("*").alias("tf")))
    nd = docs.agg(F.count("*").alias("n"))
    df = tf.groupBy("tok").agg(F.count("*").alias("df"))
    qs = docs.sparkSession.createDataFrame([(t,) for t in terms], ["tok"])
    contrib = F.round(
        F.col("tf").cast("double")
        * F.log((F.col("n") + 1.0) / (F.col("df") + 1.0))
        * 1000000).cast("long")
    s0 = (tf.join(F.broadcast(qs), "tok")
          .join(F.broadcast(df), "tok").crossJoin(F.broadcast(nd))
          .groupBy(id_col).agg(F.sum(contrib).cast("long")
                               .alias("score_s")))
    top = (s0.orderBy(F.desc("score_s"), id_col).limit(n_top_docs)
           .select(id_col))
    return (tf.join(F.broadcast(top), id_col)
            .filter(~F.col("tok").isin(list(terms)))
            .join(F.broadcast(df), "tok").crossJoin(F.broadcast(nd))
            .groupBy("tok").agg(F.sum(contrib).cast("long").alias("w"))
            .orderBy(F.desc("w"), "tok").limit(n_terms))
