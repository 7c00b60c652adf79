"""Query-time TF-IDF text relevance (SURVEY §7.2 phase 4).

The reference's hybrid text branch is Atlas $search — Lucene BM25
(vector_search.py:141-160).  BM25's length normalization and term
saturation depend on index-time corpus statistics Spark doesn't keep,
so the documented stand-in is query-term TF-IDF with sklearn-style
smoothed idf:

    score(d, Q) = sum_t  tf(t, d) * (ln((1 + N) / (1 + df_t)) + 1)

Deliberate deviation from BM25 (documented, not hidden): same
monotonicity in term frequency and term rarity, but no saturation or
length normalization.  In exchange the score is a pure column
expression — JVM-side, whole-stage-codegen'd, and exactly replayable
as a DuckDB oracle — and the 0.7/0.3 fusion weights stay unchanged.

100 TB notes: corpus stats (N, df per query term) are ONE tiny agg row
broadcast to every executor; the per-row score is expression-only.
df for a 6-term query is 7 numbers — no inverted index materializes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import tokens


def _count_term(toks: Column, term: str) -> Column:
    # closure factory, not a default-arg lambda: PySpark derives HOF
    # arity from the Python signature (build-notes pitfall).
    def eq(x):
        return x == F.lit(term)

    return F.size(F.filter(toks, eq))


def tfidf_score(docs: DataFrame, terms: list[str], text_col: str = "text",
                out_col: str = "text_score") -> DataFrame:
    """Score every row against the query terms with smoothed TF-IDF.

    Plan: tokenize (expression) -> one global agg for (N, df_t) ->
    broadcast the 1-row stats -> per-row score expression.  Adds
    ``out_col``; preserves all input columns.
    """
    base = docs.withColumn(
        "__toks", tokens(F.coalesce(F.col(text_col), F.lit(""))))
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
