"""Result fusion & dedup operators (SURVEY §2.4 A1-A4, §2.3 R7, §2.5 W5).

Reference behavior (re-expressed, not ported):
- R7/A1 hybrid union-join: vector branch $unionWith text branch, then
  $group by _id with $first payload / $max per-score
  (vector_search.py:124-180) -> unionByName + hash agg.
- A2 weighted fusion: 0.7*coalesce(vector,0) + 0.3*coalesce(text,0)
  (vector_search.py:181-192; weights rag_config.yaml:41-42).
- A3 multi-strategy fusion: running weighted mean over strategies ==
  grouped weighted mean when each strategy contributes once per id
  (advanced_search.py:228-265; the equivalence is asserted in tests).
- A4 source dedup: arg-max result per key (source_attribution.py:148-160).
- W5 greedy diversity (MMR-lite): sequential keep-if-Jaccard<=0.85 vs
  all kept (advanced_search.py:275-311).  Inherently sequential per
  query -> applyInPandas per query_id; each group is <= k rows (10), so
  the Python loop touches only top-k survivors, never the corpus.

100 TB notes: all fusions are single hash aggregations on the result-id
key (result sets are k-bounded per query, so the shuffle is tiny
regardless of corpus size).  W5 parallelizes across queries, never
within one.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# strategy weights: advanced_search.py:53-66 / rag_config.yaml:45-48
STRATEGY_WEIGHTS = {"similarity": 0.6, "parent_child": 0.4, "hybrid": 0.5}
# hybrid branch weights: rag_config.yaml:41-42 (validated to sum 1.0)
VECTOR_WEIGHT, TEXT_WEIGHT = 0.7, 0.3


def hybrid_union(vector_results: DataFrame, text_results: DataFrame,
                 id_col: str = "id",
                 payload_cols: Sequence[str] = ()) -> DataFrame:
    """R7 + A1: union the two branches, dedup by id keeping first payload
    and max of each branch score (vector_search.py:161-180).

    Branch frames carry ``vector_score`` / ``text_score`` respectively
    (the other column absent) — unionByName(allowMissingColumns) inserts
    the NULLs the $unionWith produces.
    """
    unioned = vector_results.unionByName(text_results, allowMissingColumns=True)
    aggs = [F.max("vector_score").alias("vector_score"),
            F.max("text_score").alias("text_score")]
    aggs += [F.first(c, ignorenulls=True).alias(c) for c in payload_cols]
    return unioned.groupBy(id_col).agg(*aggs)


def weighted_fusion(df: DataFrame,
                    vector_weight: float = VECTOR_WEIGHT,
                    text_weight: float = TEXT_WEIGHT) -> DataFrame:
    """A2: combined score = w_v*coalesce(vector,0) + w_t*coalesce(text,0)
    (vector_search.py:181-192)."""
    return df.withColumn(
        "score",
        vector_weight * F.coalesce(F.col("vector_score"), F.lit(0.0))
        + text_weight * F.coalesce(F.col("text_score"), F.lit(0.0)))


def multi_strategy_fusion(results: DataFrame, id_col: str = "id",
                          weights: dict[str, float] | None = None) -> DataFrame:
    """A3: fuse per-strategy results into one ranked set.

    Input: one row per (id, strategy) with ``score`` and ``strategy``
    columns.  The reference's sequential running weighted mean
    (advanced_search.py:236-253) equals the grouped weighted mean
    because each strategy contributes at most once per id — asserted in
    tests/test_fusion.py.
    """
    w = weights or STRATEGY_WEIGHTS
    weight = F.col("strategy")
    expr = None
    for name, val in w.items():
        expr = (F.when(weight == name, F.lit(val)) if expr is None
                else expr.when(weight == name, F.lit(val)))
    weight_col = expr.otherwise(F.lit(0.5))
    return (results
            .withColumn("__w", weight_col)
            .groupBy(id_col)
            .agg((F.sum(F.col("score") * F.col("__w")) / F.sum("__w"))
                 .alias("fused_score"),
                 F.sort_array(F.collect_set("strategy")).alias("strategies_used")))


def dedup_argmax(df: DataFrame, key_col: str, score_col: str = "score",
                 tiebreak_col: str | None = None) -> DataFrame:
    """A4: keep the best-scoring row per key (source_attribution.py:148-160).

    One shuffle on the key; max_by-style via row_number with a
    deterministic tiebreak.
    """
    from pyspark.sql import Window
    order = [F.desc(score_col)]
    if tiebreak_col:
        order.append(F.col(tiebreak_col))
    w = Window.partitionBy(key_col).orderBy(*order)
    return (df.withColumn("__rn", F.row_number().over(w))
              .filter(F.col("__rn") == 1).drop("__rn"))


def greedy_diversity(results: DataFrame, query_col: str = "query_id",
                     score_col: str = "score", text_col: str = "content",
                     threshold: float = 0.85, min_results: int = 3,
                     id_col: str | None = None) -> DataFrame:
    """W5: greedy Jaccard diversity filter per query
    (advanced_search.py:275-311).

    Semantics: results ranked by score desc; always keep the top result;
    keep each next result iff Jaccard(token set, every kept result) <=
    threshold.  Skip filtering entirely when a query has <= min_results
    rows.  Sequential by construction -> applyInPandas per query_id;
    group size is k-bounded (<=10 in the reference), so the Python loop
    is O(k^2) per query and the operator scales with #queries.

    ``id_col`` adds a final tiebreak to the greedy order: identical
    (score, content) pairs — exact-duplicate docs — otherwise fall
    back to unstable shuffle order, and WHICH duplicate survives would
    be nondeterministic.
    """
    schema = results.schema
    sort_cols = [score_col, text_col] + ([id_col] if id_col else [])
    ascending = [False, True] + ([True] if id_col else [])

    def _filter(pdf: pd.DataFrame) -> pd.DataFrame:
        # deterministic total order: score desc, then content (group
        # collection order from the shuffle is not stable)
        pdf = pdf.sort_values(sort_cols, ascending=ascending,
                              kind="mergesort")
        if len(pdf) <= min_results:
            return pdf
        kept_tokens: list[set[str]] = []
        keep_mask = []
        for text in pdf[text_col]:
            toks = set((text or "").lower().split())
            ok = all(_jaccard(toks, k) <= threshold for k in kept_tokens)
            keep_mask.append(ok)
            if ok:
                kept_tokens.append(toks)
        return pdf[pd.Series(keep_mask, index=pdf.index)]

    def _jaccard(a: set[str], b: set[str]) -> float:
        if not a and not b:
            return 1.0
        if not a or not b:
            return 0.0
        return len(a & b) / len(a | b)

    return results.groupBy(query_col).applyInPandas(_filter, schema=schema)


def confidence_score(results: DataFrame, query_col: str | None = None,
                     score_col: str = "score",
                     source_col: str = "source_type") -> DataFrame:
    """A7: 0.6*max(score) + 0.2*min(n/3,1) + 0.2*min(distinct_sources/2,1),
    capped at 1.0 (source_attribution.py:175-205).

    Grouped per query when query_col given, else one global row.  At
    scale swap countDistinct for approx_count_distinct (rel. error 5%)
    — exact kept here for oracle parity.
    """
    gb = results.groupBy(query_col) if query_col else results.groupBy()
    agg = gb.agg(F.max(score_col).alias("__max_score"),
                 F.count("*").alias("__n"),
                 F.countDistinct(source_col).alias("__n_sources"))
    conf = F.least(
        F.lit(1.0),
        0.6 * F.col("__max_score")
        + 0.2 * F.least(F.col("__n") / 3.0, F.lit(1.0))
        + 0.2 * F.least(F.col("__n_sources") / 2.0, F.lit(1.0)))
    return agg.withColumn("confidence", conf) \
              .drop("__max_score", "__n", "__n_sources")


def mmr_rerank(results: DataFrame, query_col: str = "query_id",
               score_col: str = "score", text_col: str = "content",
               lam: float = 0.7, k: int = 5,
               id_col: str | None = None) -> DataFrame:
    """Full Maximal-Marginal-Relevance reranking — the complete form of
    the reference's "MMR-lite" threshold filter (advanced_search.py:
    275-311 drops items above a Jaccard cutoff; true MMR re-SCORES
    every step: pick argmax of lam*relevance - (1-lam)*max_sim_to_
    selected, so diversity trades off against relevance continuously).

    Similarity is token-set Jaccard (same token definition as
    greedy_diversity, so both diversity operators share one notion of
    "near-duplicate result").  Sequential per query like W5 ->
    applyInPandas over k-bounded groups; deterministic total order
    (score desc, content, id) breaks all ties, including equal MMR
    scores (first-in-order wins).  Output: the selected rows plus
    mmr_rank (1-based pick order)."""
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(results.schema.fields
                          + [T.StructField("mmr_rank", T.IntegerType())])
    sort_cols = [score_col, text_col] + ([id_col] if id_col else [])
    ascending = [False, True] + ([True] if id_col else [])

    def _jac(a: set, b: set) -> float:
        if not a and not b:
            return 1.0
        if not a or not b:
            return 0.0
        return len(a & b) / len(a | b)

    def _rerank(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(sort_cols, ascending=ascending,
                              kind="mergesort").reset_index(drop=True)
        toks = [set((t or "").lower().split()) for t in pdf[text_col]]
        scores = list(pdf[score_col])
        n = len(pdf)
        selected: list[int] = []
        remaining = list(range(n))
        while remaining and len(selected) < k:
            best, best_val = None, None
            for i in remaining:
                pen = max((_jac(toks[i], toks[j]) for j in selected),
                          default=0.0)
                val = lam * scores[i] - (1 - lam) * pen
                # strict > : equal MMR resolves to the earlier row in
                # the deterministic order
                if best is None or val > best_val:
                    best, best_val = i, val
            selected.append(best)
            remaining.remove(best)
        out = pdf.iloc[selected].copy()
        out["mmr_rank"] = range(1, len(selected) + 1)
        return out

    return results.groupBy(query_col).applyInPandas(_rerank, schema=schema)
