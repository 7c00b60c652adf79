"""Source attribution & stats (SURVEY §2.3 R1, §2.4 A6/A7/A8).

- R1 attribution join: the reference resolves each result's parent
  Document through an in-process dict cache + per-miss find_one
  (source_attribution.py:23-129).  That cache IS a broadcast hash
  table: in Spark the whole pattern is one broadcast left equi-join —
  no driver round-trips, no cache invalidation, works at any corpus
  size as long as the *dimension* side (documents metadata projection)
  is broadcastable; above that, a plain shuffled hash join on doc_id.
- A6 source stats: grouped conditional counts + explode of the
  strategies list (source_attribution.py:262-296).
- A8 rolling metrics: running means over a query-log ordered by time
  (rag_engine.py:415-459) — window prefix aggregates.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def attribution_join(results: DataFrame, documents: DataFrame,
                     doc_cols: Sequence[str] = ("source", "lang"),
                     doc_id_col: str = "doc_id",
                     broadcast: bool = True) -> DataFrame:
    """R1: attach document attribution fields to each search result via
    a left equi-join (source_attribution.py:23-129).

    ``broadcast=True`` for dimension-sized documents projections (the
    default; mirrors the reference's full in-memory cache assumption).
    """
    dims = documents.select(doc_id_col, *doc_cols)
    if broadcast:
        dims = F.broadcast(dims)
    return results.join(dims, doc_id_col, "left")


def source_stats(attributed: DataFrame,
                 source_col: str = "source_type",
                 strategies_col: str | None = "strategies_used") -> DataFrame:
    """A6: counts per source type; strategy counts need unnesting the
    strategies list first (source_attribution.py:262-296)."""
    by_source = attributed.groupBy(source_col).agg(F.count("*").alias("n_results"))
    if strategies_col is None:
        return by_source
    by_strategy = (attributed
                   .select(source_col, F.explode(strategies_col).alias("strategy"))
                   .groupBy(source_col, "strategy")
                   .agg(F.count("*").alias("n")))
    rolled = (by_strategy.groupBy(source_col)
              .agg(F.map_from_entries(
                  F.sort_array(F.collect_list(F.struct("strategy", "n"))))
                  .alias("strategy_counts")))
    return by_source.join(rolled, source_col, "left")


def rolling_metrics(query_log: DataFrame, ts_col: str = "ts",
                    value_cols: Sequence[str] = ("value",)) -> DataFrame:
    """A8: incremental running means == prefix window averages over the
    log (rag_engine.py:415-459).  Deterministic total order via
    (ts, event_id) tiebreak when present."""
    order = [F.col(ts_col)]
    if "event_id" in query_log.columns:
        order.append(F.col("event_id"))
    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding,
                                           Window.currentRow)
    out = query_log
    for c in value_cols:
        out = out.withColumn(f"running_avg_{c}", F.avg(c).over(w))
    out = out.withColumn("query_count", F.count("*").over(w))
    return out
