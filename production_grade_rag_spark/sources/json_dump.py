"""S1/S2: semi-structured JSON page-dump source (SURVEY §2.1).

The reference's Notion REST scans (notion_collector.py:56-144) page
through /search and /databases/{id}/query and accumulate raw page/entry
dicts; its crawler tolerates per-page failures without aborting the run
(web_crawler.py:72-184 try/except per URL).  The batch twin is a JSON
dump directory read with ``spark.read.json`` in PERMISSIVE mode:

- well-formed lines parse into typed columns;
- malformed lines land whole in ``_corrupt_record`` instead of failing
  the scan — the crawler's error tolerance, relationally.

100 TB notes: JSON line dumps split by newline, so a directory of
dumps parallelizes like any file source; pass an explicit ``schema``
at scale (schema inference is an extra full pass over the data) and
prune columns early — JSON scans can't push predicates, so the first
``select`` after the read is the column-pruning boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_json_dump(spark: SparkSession, path: str,
                   schema: T.StructType | str | None = None) -> DataFrame:
    """S1/S2 scan: line-delimited JSON with PERMISSIVE corrupt capture.

    Reads the dump as text and parses each line with ``from_json`` in
    PERMISSIVE mode; malformed lines land whole in ``_corrupt_record``.
    Parsing through from_json (rather than the json reader's internal
    corrupt column) keeps the corrupt channel a REGULAR column — Spark
    disallows plans that reference only the json scan's internal
    corrupt-record column, which breaks ``bad.count()``-style audits.

    ``schema``: StructType or DDL string; the corrupt-record field is
    appended automatically.  Without a schema one inference pass runs
    first (fine for tests; pass a schema at scale to stay one-pass).
    """
    if isinstance(schema, str):
        schema = T._parse_datatype_string(schema)
    if schema is None:
        inferred = spark.read.option("mode", "PERMISSIVE").json(path).schema
        schema = T.StructType(
            [f for f in inferred.fields if f.name != CORRUPT_COL])
    if CORRUPT_COL not in schema.fieldNames():
        schema = schema.add(CORRUPT_COL, T.StringType())
    lines = (spark.read.text(path)
             .filter(F.length(F.trim(F.col("value"))) > 0))
    parsed = lines.select(F.from_json(
        F.col("value"), schema,
        {"mode": "PERMISSIVE",
         "columnNameOfCorruptRecord": CORRUPT_COL}).alias("__row"))
    return parsed.select("__row.*")


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split a PERMISSIVE read into (parsed, corrupt) frames: parsed
    rows lose the corrupt column; corrupt rows carry the raw line in
    ``_corrupt_record``."""
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull())
    return good, bad


def write_json_dump(df: DataFrame, path: str,
                    corrupt_lines: list[str] | None = None) -> None:
    """Render rows as a JSON-lines dump (one object per line, the
    Notion collector's accumulated page list serialized).  Used by
    tests/catalog to build a dump from a DataFrame; ``corrupt_lines``
    appends malformed lines to exercise the PERMISSIVE path."""
    out = df.select(F.to_json(F.struct(*df.columns)).alias("value"))
    out.write.mode("overwrite").text(path)
    if corrupt_lines:
        import os
        with open(os.path.join(path, "corrupt-extra.json"), "w") as fh:
            for line in corrupt_lines:
                fh.write(line + "\n")
