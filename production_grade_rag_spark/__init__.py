"""PySpark-native analytics engine with the query and data-processing
capabilities of amoghd24/Production-Grade-RAG (reference, read-only at
/root/reference).

Spark-first re-expression, NOT a port: operators are ``DataFrame ->
DataFrame`` transforms built from pyspark.sql builtins so Catalyst can
push down filters, prune columns, broadcast small sides, and codegen the
hot path.  Python (Arrow-batched pandas UDFs) only where built-ins
genuinely can't express the semantics (recursive chunker, model
embedder).

Modules mirror SURVEY.md section 2:

- ``sources``    : parquet scans/sinks, anti-join delete, JSON decode  (S*)
- ``functions``  : scalar text/vector column expressions              (F*, T1, T2)
- ``operators``  : chunking, embedding, similarity, fusion, dedup,
                   stats, events, diversity, attribution              (M*, R*, A*, W*)
- ``plans``      : composed retrieval strategies + the query catalog  (section 2.9)
- ``streaming``  : Structured Streaming equivalents of the events ops
"""

__version__ = "0.1.0"
