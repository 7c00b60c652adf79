"""Scalar functions as SPARK SQL UDFs (Spark 4 ``CREATE TEMPORARY
FUNCTION ... RETURN <expr>``): the engine's F3/F8/F9/F14/F17 surface
exposed to pure-SQL users, with bodies that are plain SQL expressions
— they inline into Catalyst exactly like the Column-builder forms in
functions/text.py (same codegen, no Python in the row path), so a SQL
notebook and the DataFrame API share one definition of "word count".

Reference scope: these are the scalar helpers the reference scatters
across document_processor.py / rag_engine.py (cited per function in
functions/text.py); here they are additionally first-class SQL
functions, which the reference (Mongo pipelines) cannot express.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# NOTE: inside Spark SQL string literals a regex backslash is escaped,
# so the SQL text must carry two backslashes per regex one.
_STRIP = r"'(^\\s+)|(\\s+$)'"

_DDL = [
    # F3: len(s.split()) — python-strip first, empty -> 0
    f"""CREATE OR REPLACE TEMPORARY FUNCTION pgrs_word_count(s STRING)
        RETURNS INT RETURN CASE
          WHEN s IS NULL THEN NULL
          WHEN regexp_replace(s, {_STRIP}, '') = '' THEN 0
          ELSE size(split(regexp_replace(s, {_STRIP}, ''), '\\\\s+'))
        END""",
    # F8: len(s) // 4 (rag_engine.py:243)
    """CREATE OR REPLACE TEMPORARY FUNCTION pgrs_token_estimate(s STRING)
       RETURNS BIGINT RETURN CAST(floor(length(s) / 4) AS BIGINT)""",
    # F9: truncate + ellipsis (rag_engine.py:252)
    """CREATE OR REPLACE TEMPORARY FUNCTION pgrs_truncate(s STRING, n INT)
       RETURNS STRING RETURN CASE WHEN length(s) > n
         THEN concat(substring(s, 1, n), '...') ELSE s END""",
    # F17: clamp [0,1] (document_processor.py:79)
    """CREATE OR REPLACE TEMPORARY FUNCTION pgrs_clamp01(x DOUBLE)
       RETURNS DOUBLE RETURN least(greatest(x, 0.0D), 1.0D)""",
    # F14: Jaccard over word sets (advanced_search.py:297-311).  The
    # reference's empty-set convention (:303-306): both empty -> 1.0
    # (identical), one empty -> 0.0 — shared with fusion._jac /
    # greedy_diversity so the codebase has ONE token-set Jaccard.
    """CREATE OR REPLACE TEMPORARY FUNCTION pgrs_jaccard(
         a ARRAY<STRING>, b ARRAY<STRING>)
       RETURNS DOUBLE RETURN CASE
         WHEN size(a) = 0 AND size(b) = 0 THEN 1.0D
         WHEN size(a) = 0 OR size(b) = 0 THEN 0.0D
         ELSE CAST(size(array_intersect(a, b)) AS DOUBLE)
              / size(array_union(a, b)) END""",
]


def register_sql_udfs(spark: SparkSession) -> None:
    """Install the pgrs_* temporary SQL functions into the session."""
    for ddl in _DDL:
        spark.sql(ddl)
