"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline on sf0.001;
``queries()``/``oracle_sql()`` re-export the engine's query catalog
(production_grade_rag_spark.plans.catalog) — one entry per implemented
operator from SURVEY.md §2, each paired with a DuckDB oracle when the
semantics are SQL-expressible.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from production_grade_rag_spark.plans import catalog  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the minimum end-to-end
    RAG slice (SURVEY §7.1) — ingest -> clean -> quality -> chunk ->
    embed -> top-k similarity search with source attribution."""
    from production_grade_rag_spark.plans.flagship import flagship_search
    return flagship_search(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return catalog.queries()


def oracle_sql() -> dict[str, str]:
    return catalog.oracle_sql()
