"""Chunking operators (SURVEY §2.8 M1/M2, §2.5 W2, §2.2 T4).

Two implementations, same output schema (FIXTURES.md §B `chunks`):

- ``chunk_fixed``        : fixed-stride windowed substring — 100% built-in
  column expressions (sequence/explode/substr), hence oracle-checkable in
  DuckDB and fully codegen'd.  This is the scale path: no Python, no
  shuffle (chunks stay co-partitioned with their document).
- ``chunk_recursive`` / ``chunk_parent_child`` : exact
  RecursiveCharacterTextSplitter semantics (separator hierarchy
  ["\\n\\n","\\n"," ",""], merge-with-overlap), reimplemented from the
  public LangChain algorithm as a pure function, applied as an
  Arrow-batched pandas UDF + explode.  Reference behavior:
  document_processor.py:83-123, parent_child_chunker.py:40-136.

Chunk ids are deterministic (document_processor.py:105-107):
``md5(f"{doc_id}_{idx}_{chunk_text[:100]}")`` — never ObjectId-style
nondeterminism (breaks oracle comparison and retries).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.text import clean_text, word_count

PY_STRIP = r"^\s+|\s+$"   # Python str.strip() as a regex (trim() is space-only)


# ---------------------------------------------------------------------------
# M1-lite: fixed-stride chunking (oracle-checkable, scale path)
# ---------------------------------------------------------------------------

def chunk_fixed(documents: DataFrame,
                text_col: str = "text",
                id_col: str = "doc_id",
                chunk_size: int = 1000,
                overlap: int = 200,
                min_chars: int = 50,
                clean: bool = True) -> DataFrame:
    """Fixed-stride chunks over (optionally cleaned) text.

    Matches the reference pipeline shape: clean (T1) -> split -> drop
    stripped-length < 50 (T4) keeping the pre-filter index (the
    reference enumerates before filtering, document_processor.py:102-104)
    -> md5 id from the UNstripped text, content stored stripped.
    """
    stride = chunk_size - overlap
    src = F.col("__clean")
    df = documents.withColumn(
        "__clean", clean_text(F.col(text_col)) if clean else F.col(text_col)
    )
    n_chunks = F.when(F.length(src) == 0, F.lit(0)).otherwise(
        F.floor((F.length(src) - 1) / stride) + 1
    )
    # r15: explode a PROJECTED index array through the coalesce guard
    # (dedup.explode_attr) — exploding the inline sequence made
    # InferFiltersFromGenerate push an isnotnull(<whole clean_text
    # tree>) filter to the one-task scan, re-running the 8-regex clean
    # chain per document single-threaded (same disease/fix as the r15
    # shingle explode; same rows: the sequence array is unchanged,
    # only bound to an attribute first).
    from .dedup import explode_attr
    df = (df.withColumn("__seq",
                        F.sequence(F.lit(0), n_chunks.cast("int") - 1))
          .withColumn("chunk_index", explode_attr(F.col("__seq"), "int"))
          .drop("__seq"))
    start = (F.col("chunk_index") * stride).cast("int")
    raw = src.substr(start + 1, F.lit(chunk_size))
    # nd_pin: the min-length filter otherwise re-evaluates the strip
    # below this projection (pushdown substitutes the defining tree) —
    # pin it so every chunk strips once (values identical; see
    # functions.text.nd_pin)
    from ..functions.text import nd_pin
    df = (
        df.withColumn("__raw", raw)
        .withColumn("content",
                    nd_pin(F.regexp_replace(F.col("__raw"), PY_STRIP, "")))
        .filter(F.length("content") >= min_chars)
        .select(
            F.md5(F.concat_ws("_", F.col(id_col), F.col("chunk_index"),
                              F.substring(F.col("__raw"), 1, 100))).alias("chunk_id"),
            F.col(id_col).alias("doc_id"),
            F.col("content"),
            F.col("chunk_index").cast("int").alias("chunk_index"),
            start.alias("start_char"),
            (start + F.length("__raw")).cast("int").alias("end_char"),
            word_count(F.col("content")).alias("word_count"),
            F.lit("flat").alias("chunk_type"),
            F.lit(None).cast("string").alias("parent_id"),
            F.lit(None).cast("int").alias("child_count"),
        )
    )
    return df


# ---------------------------------------------------------------------------
# M1: recursive character splitting (LangChain-parity, pandas-UDF path)
# ---------------------------------------------------------------------------

class RecursiveSplitter:
    """Pure-Python reimplementation of the public LangChain
    RecursiveCharacterTextSplitter algorithm (MIT-licensed, public
    knowledge): try separators in order, split on the first present,
    recurse into over-long pieces, merge small pieces back up to
    chunk_size keeping ``overlap`` characters of trailing context.

    keep_separator=True semantics (the class default the reference gets
    via document_processor.py:86-91): the separator is re-attached to
    the START of the following piece and merge joins with "".
    """

    def __init__(self, chunk_size: int = 1000, chunk_overlap: int = 200,
                 separators: tuple[str, ...] = ("\n\n", "\n", " ", "")):
        if chunk_overlap >= chunk_size:
            raise ValueError("overlap must be < chunk_size")
        self.chunk_size = chunk_size
        self.chunk_overlap = chunk_overlap
        self.separators = list(separators)

    def split_text(self, text: str) -> list[str]:
        return self._split(text, self.separators)

    # -- internals ----------------------------------------------------------
    def _split_on(self, text: str, separator: str) -> list[str]:
        if separator:
            pieces = re.split(f"({re.escape(separator)})", text)
            splits = [pieces[i] + pieces[i + 1]
                      for i in range(1, len(pieces) - 1, 2)]
            if len(pieces) % 2 == 0:
                splits += pieces[-1:]
            splits = [pieces[0]] + splits
        else:
            splits = list(text)
        return [s for s in splits if s != ""]

    def _split(self, text: str, separators: list[str]) -> list[str]:
        final_chunks: list[str] = []
        separator = separators[-1]
        new_separators: list[str] = []
        for i, sep in enumerate(separators):
            if sep == "":
                separator = sep
                break
            if re.search(re.escape(sep), text):
                separator = sep
                new_separators = separators[i + 1:]
                break
        splits = self._split_on(text, separator)

        good: list[str] = []
        merge_sep = ""   # keep_separator=True -> join with ""
        for s in splits:
            if len(s) < self.chunk_size:
                good.append(s)
            else:
                if good:
                    final_chunks.extend(self._merge(good, merge_sep))
                    good = []
                if not new_separators:
                    final_chunks.append(s)
                else:
                    final_chunks.extend(self._split(s, new_separators))
        if good:
            final_chunks.extend(self._merge(good, merge_sep))
        return final_chunks

    def _merge(self, splits: list[str], separator: str) -> list[str]:
        sep_len = len(separator)
        docs: list[str] = []
        current: list[str] = []
        total = 0
        for d in splits:
            dlen = len(d)
            if total + dlen + (sep_len if current else 0) > self.chunk_size:
                if current:
                    doc = self._join(current, separator)
                    if doc is not None:
                        docs.append(doc)
                    while total > self.chunk_overlap or (
                        total + dlen + (sep_len if current else 0) > self.chunk_size
                        and total > 0
                    ):
                        total -= len(current[0]) + (sep_len if len(current) > 1 else 0)
                        current = current[1:]
            current.append(d)
            total += dlen + (sep_len if len(current) > 1 else 0)
        doc = self._join(current, separator)
        if doc is not None:
            docs.append(doc)
        return docs

    @staticmethod
    def _join(docs: list[str], separator: str) -> str | None:
        text = separator.join(docs).strip()
        return text if text else None


_CHUNK_STRUCT = T.ArrayType(T.StructType([
    T.StructField("content", T.StringType()),
    T.StructField("idx", T.IntegerType()),
    T.StructField("start_char", T.IntegerType()),
    T.StructField("end_char", T.IntegerType()),
]))


def _offsets(text: str, pieces: list[str]) -> list[tuple[int, int]]:
    """Best-effort deterministic offsets: scan forward, allowing overlap
    (pieces can share a suffix/prefix with the previous piece)."""
    out = []
    search_from = 0
    for p in pieces:
        pos = text.find(p, search_from)
        if pos < 0:
            pos = text.find(p)
        if pos < 0:
            pos = search_from
        out.append((pos, pos + len(p)))
        search_from = pos + 1
    return out


def chunk_recursive(documents: DataFrame,
                    text_col: str = "text",
                    id_col: str = "doc_id",
                    chunk_size: int = 1000,
                    overlap: int = 200,
                    min_chars: int = 50,
                    clean: bool = True) -> DataFrame:
    """M1: recursive splitter applied per document (Arrow-batched pandas
    UDF -> explode).  Same downstream schema as ``chunk_fixed``."""
    splitter = RecursiveSplitter(chunk_size, overlap)

    @F.pandas_udf(_CHUNK_STRUCT)
    def split_udf(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            t = t or ""
            pieces = splitter.split_text(t)
            offs = _offsets(t, pieces)
            out.append([
                {"content": p, "idx": i, "start_char": o[0], "end_char": o[1]}
                for i, (p, o) in enumerate(zip(pieces, offs))
            ])
        return pd.Series(out)

    src = clean_text(F.col(text_col)) if clean else F.col(text_col)
    df = (
        documents.withColumn("__clean", src)
        .withColumn("__c", F.explode(split_udf(F.col("__clean"))))
        .select(
            F.md5(F.concat_ws("_", F.col(id_col), F.col("__c.idx"),
                              F.substring(F.col("__c.content"), 1, 100))).alias("chunk_id"),
            F.col(id_col).alias("doc_id"),
            F.regexp_replace(F.col("__c.content"), PY_STRIP, "").alias("content"),
            F.col("__c.idx").alias("chunk_index"),
            F.col("__c.start_char").alias("start_char"),
            F.col("__c.end_char").alias("end_char"),
            word_count(F.col("__c.content")).alias("word_count"),
            F.lit("flat").alias("chunk_type"),
            F.lit(None).cast("string").alias("parent_id"),
            F.lit(None).cast("int").alias("child_count"),
        )
        .filter(F.length("content") >= min_chars)
    )
    return df


_PC_STRUCT = T.ArrayType(T.StructType([
    T.StructField("chunk_id", T.StringType()),
    T.StructField("content", T.StringType()),
    T.StructField("chunk_index", T.IntegerType()),
    T.StructField("chunk_type", T.StringType()),
    T.StructField("parent_id", T.StringType()),
    T.StructField("child_count", T.IntegerType()),
    T.StructField("child_index", T.IntegerType()),
]))


def chunk_parent_child(documents: DataFrame,
                       text_col: str = "text",
                       id_col: str = "doc_id",
                       parent_size: int = 2000, parent_overlap: int = 400,
                       child_size: int = 400, child_overlap: int = 100) -> DataFrame:
    """M2: parent/child hierarchy (parent_child_chunker.py:40-136).

    Parents split from the document, children split from each parent;
    ``chunk_index`` is global (parent, then its children — reference
    order); ids are ``{doc}_parent_{i}`` / ``{parent}_child_{j}``.
    The reference denormalizes parent_content into every child; we keep
    the normalized form and recover parent text via ``parent_context``
    (R2 self-join) instead.
    """
    psplit = RecursiveSplitter(parent_size, parent_overlap)
    csplit = RecursiveSplitter(child_size, child_overlap)

    @F.pandas_udf(_PC_STRUCT)
    def pc_udf(doc_ids: pd.Series, texts: pd.Series) -> pd.Series:
        out = []
        for doc_id, t in zip(doc_ids, texts):
            rows = []
            idx = 0
            for pi, ptext in enumerate(psplit.split_text(t or "")):
                parent_id = f"{doc_id}_parent_{pi}"
                children = csplit.split_text(ptext)
                rows.append({
                    "chunk_id": parent_id, "content": ptext, "chunk_index": idx,
                    "chunk_type": "parent", "parent_id": parent_id,
                    "child_count": len(children), "child_index": None,
                })
                idx += 1
                for ci, ctext in enumerate(children):
                    rows.append({
                        "chunk_id": f"{parent_id}_child_{ci}", "content": ctext,
                        "chunk_index": idx, "chunk_type": "child",
                        "parent_id": parent_id, "child_count": None,
                        "child_index": ci,
                    })
                    idx += 1
            out.append(rows)
        return pd.Series(out)

    return (
        documents
        .withColumn("__c", F.explode(pc_udf(F.col(id_col).cast("string"),
                                            F.col(text_col))))
        .select(
            F.col("__c.chunk_id").alias("chunk_id"),
            F.col(id_col).alias("doc_id"),
            F.col("__c.content").alias("content"),
            F.col("__c.chunk_index").alias("chunk_index"),
            word_count(F.col("__c.content")).alias("word_count"),
            F.col("__c.chunk_type").alias("chunk_type"),
            F.col("__c.parent_id").alias("parent_id"),
            F.col("__c.child_count").alias("child_count"),
            F.col("__c.child_index").alias("child_index"),
        )
    )


def chunk_parent_child_fixed(documents: DataFrame,
                             text_col: str = "text",
                             id_col: str = "doc_id",
                             parent_size: int = 2000, parent_overlap: int = 400,
                             child_size: int = 400,
                             child_overlap: int = 100) -> DataFrame:
    """M2 with the SQL-expressible fixed-stride splitter: same hierarchy,
    ids, and global interleaved chunk_index as ``chunk_parent_child``
    (parent, its children, next parent — parent_child_chunker.py:84,
    110,127), but built from pure column expressions so the whole
    operator is oracle-checkable in DuckDB (the recursive variant's
    rows-only twin).

    Global index arithmetic: parent i's index = i + sum of child counts
    of parents 0..i-1 (one prefix-sum window per document); child j of
    parent i follows at +1+j.  No Python, two explodes, one window.
    """
    pstride = parent_size - parent_overlap
    cstride = child_size - child_overlap
    src = F.col("__src")
    docs = documents.withColumn("__src", F.col(text_col))
    n_par = F.when(F.length(src) == 0, F.lit(0)).otherwise(
        F.floor((F.length(src) - 1) / pstride) + 1)
    parents = (docs
               .withColumn("p_idx",
                           F.explode(F.sequence(F.lit(0),
                                                n_par.cast("int") - 1)))
               .withColumn("p_content",
                           src.substr((F.col("p_idx") * pstride).cast("int") + 1,
                                      F.lit(parent_size)))
               .select(F.col(id_col).alias("doc_id"), "p_idx", "p_content"))
    n_child = F.when(F.length("p_content") == 0, F.lit(0)).otherwise(
        F.floor((F.length("p_content") - 1) / cstride) + 1).cast("int")
    parents = parents.withColumn("child_count", n_child)
    w = (Window.partitionBy("doc_id").orderBy("p_idx")
         .rowsBetween(Window.unboundedPreceding, -1))
    parents = parents.withColumn(
        "p_global",
        F.coalesce(F.sum(F.col("child_count") + 1).over(w), F.lit(0))
         .cast("int"))
    parent_id = F.concat_ws("_", F.col("doc_id"), F.lit("parent"), F.col("p_idx"))
    parent_rows = parents.select(
        parent_id.alias("chunk_id"),
        F.col("doc_id"),
        F.col("p_content").alias("content"),
        F.col("p_global").alias("chunk_index"),
        F.lit("parent").alias("chunk_type"),
        parent_id.alias("parent_id"),
        F.col("child_count"),
        F.lit(None).cast("int").alias("child_index"))
    children = (parents
                .withColumn("c_idx",
                            F.explode(F.sequence(F.lit(0),
                                                 F.col("child_count") - 1)))
                .withColumn("c_content",
                            F.col("p_content")
                             .substr((F.col("c_idx") * cstride).cast("int") + 1,
                                     F.lit(child_size))))
    child_rows = children.select(
        F.concat_ws("_", parent_id, F.lit("child"), F.col("c_idx"))
         .alias("chunk_id"),
        F.col("doc_id"),
        F.col("c_content").alias("content"),
        (F.col("p_global") + 1 + F.col("c_idx")).alias("chunk_index"),
        F.lit("child").alias("chunk_type"),
        parent_id.alias("parent_id"),
        F.lit(None).cast("int").alias("child_count"),
        F.col("c_idx").alias("child_index"))
    return parent_rows.unionByName(child_rows)


def parent_context(chunks: DataFrame) -> DataFrame:
    """R2: recover parent text for child chunks via self equi-join
    (replaces the reference's parent_content denormalization,
    parent_child_chunker.py:118-124,138-151)."""
    parents = chunks.filter(F.col("chunk_type") == "parent").select(
        F.col("chunk_id").alias("parent_id"),
        F.col("content").alias("parent_content"),
    )
    children = chunks.filter(F.col("chunk_type") == "child")
    return children.join(parents, "parent_id", "left")


def parent_child_map(chunks: DataFrame) -> DataFrame:
    """R3: child ids grouped under parent ids
    (parent_child_chunker.py:165-186)."""
    return (
        chunks.filter(F.col("chunk_type") == "child")
        .groupBy("parent_id")
        .agg(F.sort_array(F.collect_list("chunk_id")).alias("child_ids"),
             F.count("*").alias("child_count"))
    )
