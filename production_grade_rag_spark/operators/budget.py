"""Token-budget filtering (SURVEY §2.2 T7 / §2.5 W4).

Two forms of the reference's context-budget logic
(rag_engine.py:230-258, limits rag_engine.py:36-37):

- prefix-sum form (oracle-checked as t7_token_budget_prefix in the
  catalog): running sum over ranked results, truncate at first
  overflow.  Pure window function — the scale path.
- exact greedy form (here): the reference SKIPS a result that would
  overflow and KEEPS SCANNING lower-ranked results that still fit,
  and truncates any single result above ``max_result_tokens``.  The
  kept-set depends on every prior decision, so this is sequential per
  query — applyInPandas per query_id over k-bounded groups (<= 10
  rows in the reference, rag_config.yaml:34), exactly like W5.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

CHARS_PER_TOKEN = 4          # rag_engine.py:243 (len // 4)
MAX_TOTAL_TOKENS = 128_000   # rag_engine.py:36
MAX_RESULT_TOKENS = 10_000   # rag_engine.py:37


def greedy_budget_py(rows: list[dict], text_key: str = "content",
                     max_total_tokens: int = MAX_TOTAL_TOKENS,
                     max_result_tokens: int = MAX_RESULT_TOKENS) -> list[dict]:
    """Pure-Python greedy budget over rows already ranked best-first —
    the reference loop (rag_engine.py:239-257), also the test twin."""
    out = []
    total = 0
    for row in rows:
        text = row[text_key] or ""
        est = len(text) // CHARS_PER_TOKEN
        # check order matters: the reference tests the RAW estimate
        # against the total budget (skip) before per-result truncation,
        # so a huge doc that would fit only after truncation is skipped.
        if total + est > max_total_tokens:
            continue                      # skip, keep scanning
        if est > max_result_tokens:
            text = text[: max_result_tokens * CHARS_PER_TOKEN] + "..."
            est = max_result_tokens
        row = dict(row)
        row[text_key] = text
        row["est_tokens"] = est
        out.append(row)
        total += est
    return out


def greedy_token_budget(results: DataFrame, query_col: str = "query_id",
                        score_col: str = "score", text_col: str = "content",
                        id_col: str = "doc_id",
                        max_total_tokens: int = MAX_TOTAL_TOKENS,
                        max_result_tokens: int = MAX_RESULT_TOKENS) -> DataFrame:
    """T7 exact: per-query greedy token budget (applyInPandas; group
    size is k-bounded, so the Python loop never sees the corpus)."""
    schema = T.StructType(results.schema.fields
                          + [T.StructField("est_tokens", T.LongType())])

    def _apply(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([score_col, id_col],
                              ascending=[False, True], kind="mergesort")
        rows = greedy_budget_py(pdf.to_dict("records"), text_key=text_col,
                                max_total_tokens=max_total_tokens,
                                max_result_tokens=max_result_tokens)
        return pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return results.groupBy(query_col).applyInPandas(_apply, schema=schema)
