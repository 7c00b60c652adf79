"""In-plan invariant gates for the recursive chunkers (SURVEY §2.8 M1/M2).

The recursive character splitter (reference document_processor.py:96-123)
and the parent/child hierarchy (parent_child_chunker.py:40-136) are not
SQL-expressible, so their raw chunk rows cannot be value-oracled in
DuckDB.  These gates make the *invariants* of those operators
driver-visible instead: each emits a one-row summary whose every value
is a constant (TRUE / 0) when the chunker is correct, verified INSIDE
the distributed Spark plan — the same constant-pinning pattern as the
ANN recall gates.  A boundary-logic regression now flips a value hash
in CORRECTNESS_r{N}.json, not just the local fuzz tests
(tests/test_chunking_fuzz.py).

Invariant selection is repetition-robust: offset-tiling checks
(gap-is-whitespace, overlap <= configured) are deliberately NOT pinned
because the splitter's best-effort offsets can legally match an earlier
duplicate occurrence when text repeats; what IS pinned holds for any
corpus:

- every recorded [start_char, end_char) span reproduces its content
  from the cleaned document text (modulo the strip the splitter applies)
- per-document spans are strictly monotonic in chunk_index
- no chunk exceeds chunk_size; no duplicate (doc, chunk_index)
- non-whitespace coverage: the chunks of a document jointly contain at
  least every non-whitespace character of it (overlap only duplicates)
- parent/child: sizes bounded, child content substring-of-parent,
  child_index contiguous per parent, every non-empty doc chunked
- parent-context join: total, null-free, and content-faithful
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import clean_text
from . import chunking

# Python str.isspace()'s exact character set as a Java regex class —
# NOT java \s (ASCII-only) and NOT (?U)\s (Unicode White_Space, which
# misses \x1c-\x1f).  The splitter strips with PYTHON semantics
# (RecursiveSplitter._join -> str.strip()), so a chunk can legally
# drop a U+00A0/U+2003/\x1c... at its boundary; coverage accounting
# that counted those as "content" would flip the constant-pinned gate
# red on a corpus containing them (found by tests/test_chunk_gates_
# fuzz.py before any driver run could).
_WS = (r"[\s\x1c-\x1f\x85\xa0\u1680\u2000-\u200a"
       r"\u2028\u2029\u202f\u205f\u3000]")


def _nonws_len(c: F.Column) -> F.Column:
    return F.length(F.regexp_replace(c, _WS, ""))


def m1_recursive_invariants(documents: DataFrame,
                            chunk_size: int = 1000) -> DataFrame:
    """One-row invariant summary for ``chunking.chunk_recursive``.

    All-constant when correct: ``(TRUE, 0, 0, 0, 0, 0)``.  Computed on
    the unfiltered (min_chars=0) chunk set so coverage accounting is
    exact; the production min-length filter is a separate, oracled
    entry (m1_chunk_fixed / t4).
    """
    ch = chunking.chunk_recursive(documents, min_chars=0)
    clean = documents.select(
        "doc_id", clean_text(F.col("text")).alias("__clean"))

    j = ch.join(clean, "doc_id")
    span = F.expr("substring(__clean, start_char + 1, end_char - start_char)")
    offset_ok = F.regexp_replace(span, chunking.PY_STRIP, "") == F.col("content")

    w = Window.partitionBy("doc_id").orderBy("chunk_index")
    prev_start = F.lag("start_char").over(w)
    per_chunk = j.select(
        (~offset_ok).cast("long").alias("ov"),
        (F.length("content") > chunk_size).cast("long").alias("sz"),
        (prev_start.isNotNull()
         & (F.col("start_char") <= prev_start)).cast("long").alias("mono"),
        "doc_id", "chunk_index", "content")

    dup = (per_chunk.groupBy("doc_id", "chunk_index").count()
           .filter(F.col("count") > 1))

    cov = (per_chunk.groupBy("doc_id")
           .agg(F.sum(_nonws_len(F.col("content"))).alias("got"))
           .join(clean, "doc_id", "right")
           .filter(F.coalesce("got", F.lit(0)) < _nonws_len(F.col("__clean"))))

    z = F.lit(0).cast("long")
    agg = per_chunk.agg(
        F.count("*").alias("__n"),
        F.coalesce(F.sum("ov"), z).alias("n_offset_viol"),
        F.coalesce(F.sum("sz"), z).alias("n_oversize"),
        F.coalesce(F.sum("mono"), z).alias("n_nonmono"))
    return agg.select(
        (F.col("__n") > 0).alias("has_chunks"),
        "n_offset_viol", "n_oversize", "n_nonmono",
        F.lit(int(dup.count())).cast("long").alias("n_dup_index"),
        F.lit(int(cov.count())).cast("long").alias("n_cov_viol"))


M1_RECURSIVE_ORACLE = """
SELECT TRUE AS has_chunks, 0::BIGINT AS n_offset_viol,
       0::BIGINT AS n_oversize, 0::BIGINT AS n_nonmono,
       0::BIGINT AS n_dup_index, 0::BIGINT AS n_cov_viol
"""


def m2_parent_child_invariants(documents: DataFrame,
                               parent_size: int = 2000,
                               child_size: int = 400) -> DataFrame:
    """One-row invariant summary for ``chunking.chunk_parent_child``:
    ``(TRUE, 0, 0, 0, 0, 0, 0)`` when the hierarchy is correct."""
    pc = chunking.chunk_parent_child(documents)
    parents = pc.filter(F.col("chunk_type") == "parent").select(
        F.col("chunk_id").alias("pid"),
        F.col("doc_id").alias("p_doc"),
        F.col("content").alias("p_content"))
    kids = pc.filter(F.col("chunk_type") == "child")

    kj = kids.join(parents, kids.parent_id == parents.pid, "left")
    z = F.lit(0).cast("long")
    kid_agg = kj.agg(
        F.count("*").alias("n_kids"),
        F.coalesce(F.sum(F.col("pid").isNull().cast("long")), z)
         .alias("n_orphans"),
        F.coalesce(F.sum((F.length("content") > child_size).cast("long")),
                   z).alias("n_child_oversize"),
        F.coalesce(F.sum((F.instr("p_content", F.col("content")) == 0)
                         .cast("long")), z).alias("n_not_sub"))

    # children jointly contain every non-ws char of their parent
    child_cov = (kj.groupBy("parent_id")
                 .agg(F.sum(_nonws_len(F.col("content"))).alias("got"),
                      F.first(_nonws_len(F.col("p_content"))).alias("want"))
                 .filter(F.col("got") < F.col("want")))

    # child_index is 0..n-1 (distinct, dense) per parent
    contig = (kids.groupBy("parent_id")
              .agg(F.count("*").alias("n"),
                   F.max("child_index").alias("mx"),
                   F.count_distinct("child_index").alias("nd"))
              .filter((F.col("mx") + 1 != F.col("n"))
                      | (F.col("nd") != F.col("n"))))

    # every non-empty doc produced >= 1 parent; no parent oversized
    clean = documents.select(
        "doc_id", clean_text(F.col("text")).alias("__clean"))
    # "non-empty" must mean python-strip-non-empty (_WS class): a doc
    # of pure unicode whitespace yields no parents and must not count
    uncov = (parents.groupBy("p_doc").count()
             .withColumnRenamed("p_doc", "doc_id")
             .join(clean, "doc_id", "right")
             .filter(F.col("count").isNull()
                     & (_nonws_len(F.col("__clean")) > 0)))
    p_agg = parents.agg(
        F.count("*").alias("n_parents"),
        F.coalesce(F.sum((F.length("p_content") > parent_size)
                         .cast("long")), z).alias("n_parent_oversize"))

    one = kid_agg.crossJoin(F.broadcast(p_agg))
    return one.select(
        ((F.col("n_kids") > 0) & (F.col("n_parents") > 0)).alias("has_chunks"),
        "n_parent_oversize", "n_child_oversize", "n_orphans", "n_not_sub",
        F.lit(int(child_cov.count())).cast("long").alias("n_child_cov_viol"),
        F.lit(int(contig.count())).cast("long").alias("n_contig_viol"),
        F.lit(int(uncov.count())).cast("long").alias("n_doc_uncovered"))


M2_PARENT_CHILD_ORACLE = """
SELECT TRUE AS has_chunks, 0::BIGINT AS n_parent_oversize,
       0::BIGINT AS n_child_oversize, 0::BIGINT AS n_orphans,
       0::BIGINT AS n_not_sub, 0::BIGINT AS n_child_cov_viol,
       0::BIGINT AS n_contig_viol, 0::BIGINT AS n_doc_uncovered
"""


def r2_parent_context_invariants(documents: DataFrame) -> DataFrame:
    """One-row invariant summary for the R2 parent-context join over the
    recursive hierarchy: every child row gets exactly its parent's
    content attached — total (row per child), null-free, faithful
    (attached text == the parent chunk's content) and containing the
    child.  ``(TRUE, 0, 0, 0, 0)`` when correct."""
    pc = chunking.chunk_parent_child(documents)
    ctx = chunking.parent_context(pc)

    n_children = pc.filter(F.col("chunk_type") == "child").count()
    parents = pc.filter(F.col("chunk_type") == "parent").select(
        F.col("chunk_id").alias("pid"), F.col("content").alias("want"))

    j = ctx.join(parents, ctx.parent_id == parents.pid, "left")
    z = F.lit(0).cast("long")
    agg = j.agg(
        F.count("*").alias("__n"),
        F.coalesce(F.sum(F.col("parent_content").isNull().cast("long")),
                   z).alias("n_null_ctx"),
        F.coalesce(F.sum((~(F.col("parent_content") == F.col("want")))
                         .cast("long")), z).alias("n_ctx_mismatch"),
        F.coalesce(F.sum((F.instr("parent_content", F.col("content")) == 0)
                         .cast("long")), z).alias("n_child_not_in_ctx"))
    return agg.select(
        (F.col("__n") > 0).alias("has_rows"),
        (F.col("__n") - F.lit(int(n_children))).cast("long")
         .alias("n_row_drift"),
        "n_null_ctx", "n_ctx_mismatch", "n_child_not_in_ctx")


R2_PARENT_CONTEXT_ORACLE = """
SELECT TRUE AS has_rows, 0::BIGINT AS n_row_drift,
       0::BIGINT AS n_null_ctx, 0::BIGINT AS n_ctx_mismatch,
       0::BIGINT AS n_child_not_in_ctx
"""
