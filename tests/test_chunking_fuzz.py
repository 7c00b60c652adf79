"""Adversarial property tests for the recursive splitter (M1/M2).

The recursive chunker is the engine's largest rows-only surface (no
DuckDB oracle can replay it), so its invariants are pinned by
hypothesis over pathological inputs instead: separator-only strings,
unbroken runs longer than chunk_size, unicode whitespace, CRLF.

Invariants (all follow from the public LangChain
RecursiveCharacterTextSplitter semantics the class reimplements —
reference behavior document_processor.py:96-123,
parent_child_chunker.py:40-136):

1. every chunk is a (stripped) contiguous substring of the input;
2. with the default separator ladder (which ends in "", the
   character-level fallback) no chunk exceeds chunk_size;
3. coverage: every non-whitespace character of the input appears in
   at least one chunk occurrence — the splitter never drops content;
4. bounded duplication: overlap retention duplicates at most
   chunk_overlap characters per chunk boundary, so
   sum(len(chunks)) <= len(text) + (n_chunks-1)*chunk_overlap;
5. chunks are non-empty post-strip, and splitting is deterministic;
6. parent/child: every child chunk is a substring of its parent's
   text (containment), for any geometry.

Pure-Python (no JVM) so hypothesis can run hundreds of examples; one
Spark round-trip at the bottom keeps the UDF wiring honest on the
same pathological corpus.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from production_grade_rag_spark.operators.chunking import RecursiveSplitter

from conftest import SF001  # noqa: F401  (spark fixture import side)

# pathological building blocks: separators alone, CRLF, unicode
# whitespace (NBSP, EM SPACE, ideographic space), unbroken runs well
# past any chunk_size drawn below, and ordinary words.
_BLOCKS = st.sampled_from([
    "a", "bb", "word ", "tail", "\n", "\n\n", "\n\n\n", " ", "  ",
    "\r\n", "\r\n\r\n", "\t", " ", " ", "　",
    "x" * 50, "y" * 173, "z" * 400, "é" * 37, "\n \n", " \n ",
])
_TEXTS = st.lists(_BLOCKS, min_size=0, max_size=25).map("".join)
_GEOM = st.tuples(st.integers(20, 150), st.floats(0.0, 0.9)).map(
    lambda t: (t[0], min(int(t[0] * t[1]), t[0] - 1)))


def _coverage_ok(text: str, chunks: list[str]) -> bool:
    """Every non-whitespace char index lies inside SOME occurrence of
    SOME chunk (occurrence-set form: immune to duplicate-substring
    position ambiguity)."""
    covered = [ch.isspace() for ch in text]
    for c in chunks:
        start = 0
        while True:
            pos = text.find(c, start)
            if pos < 0:
                break
            for i in range(pos, pos + len(c)):
                covered[i] = True
            start = pos + 1
    return all(covered)


@settings(max_examples=300, deadline=None)
@given(text=_TEXTS, geom=_GEOM)
def test_splitter_invariants(text, geom):
    chunk_size, overlap = geom
    sp = RecursiveSplitter(chunk_size, overlap)
    chunks = sp.split_text(text)
    # determinism
    assert sp.split_text(text) == chunks
    for c in chunks:
        assert c == c.strip() and c != ""        # stripped, non-empty
        assert c in text                          # contiguous substring
        assert len(c) <= chunk_size               # "" fallback bounds all
    assert _coverage_ok(text, chunks)             # nothing dropped
    if chunks:                                    # bounded duplication
        assert sum(len(c) for c in chunks) <= \
            len(text) + (len(chunks) - 1) * overlap


@settings(max_examples=150, deadline=None)
@given(text=_TEXTS)
def test_separator_only_and_empty_inputs(text):
    # all-whitespace inputs (any mix of separators) produce NO chunks
    # rather than empty/whitespace chunks.
    sp = RecursiveSplitter(60, 12)
    if text.strip() == "":
        assert sp.split_text(text) == []


@settings(max_examples=150, deadline=None)
@given(geom=_GEOM, run=st.integers(1, 900))
def test_unbroken_run_is_char_split(geom, run):
    # a single token longer than chunk_size has no separator to split
    # on except the "" fallback: chunks must still respect chunk_size
    # and reassemble to the exact run length accounting for overlap.
    chunk_size, overlap = geom
    sp = RecursiveSplitter(chunk_size, overlap)
    chunks = sp.split_text("q" * run)
    assert all(len(c) <= chunk_size for c in chunks)
    assert sum(len(c) for c in chunks) >= run     # full coverage
    assert _coverage_ok("q" * run, chunks)


@settings(max_examples=200, deadline=None)
@given(text=_TEXTS,
       pgeom=st.tuples(st.integers(80, 300), st.floats(0.0, 0.5)),
       cgeom=st.tuples(st.integers(20, 79), st.floats(0.0, 0.5)))
def test_parent_child_containment(text, pgeom, cgeom):
    # M2 invariant: children are split FROM parent text, so every
    # child is a substring of its parent (and inherits all parent
    # invariants vs the document).
    psize = pgeom[0]
    poverlap = min(int(psize * pgeom[1]), psize - 1)
    csize = cgeom[0]
    coverlap = min(int(csize * cgeom[1]), csize - 1)
    psplit = RecursiveSplitter(psize, poverlap)
    csplit = RecursiveSplitter(csize, coverlap)
    for ptext in psplit.split_text(text):
        children = csplit.split_text(ptext)
        for c in children:
            assert c in ptext
            assert len(c) <= csize
        assert _coverage_ok(ptext, children)


PATHOLOGICAL_DOCS = [
    (1, "\n\n\n\n\n"),                      # separator-only
    (2, "     　 "),          # unicode whitespace only
    (3, "w" * 1200),                         # unbroken > chunk_size
    (4, "line one\r\nline two\r\n\r\npara" * 20),   # CRLF + blank lines
    (5, ("k" * 220 + "\n\n") * 6),          # long pieces + separators
    (6, ""),                                 # empty
    (7, None),                               # null text
]


@pytest.mark.usefixtures("spark")
def test_spark_recursive_chunker_on_pathological_corpus(spark):
    # the Arrow-UDF wrapper must agree with the pure splitter on the
    # same adversarial corpus (post strip + min_chars filter), and the
    # parent/child operator must keep containment end-to-end.
    from production_grade_rag_spark.operators.chunking import (
        chunk_parent_child, chunk_recursive)

    df = spark.createDataFrame(PATHOLOGICAL_DOCS, ["doc_id", "text"])
    out = chunk_recursive(df, chunk_size=100, overlap=20, min_chars=5,
                          clean=False).collect()
    sp = RecursiveSplitter(100, 20)
    expect = {}
    for doc_id, t in PATHOLOGICAL_DOCS:
        kept = [c for c in sp.split_text(t or "") if len(c.strip()) >= 5]
        if kept:
            expect[doc_id] = kept
    got = {}
    for r in sorted(out, key=lambda r: (r["doc_id"], r["chunk_index"])):
        got.setdefault(r["doc_id"], []).append(r["content"])
    assert got == expect

    pc = chunk_parent_child(df, parent_size=300, parent_overlap=60,
                            child_size=80, child_overlap=16)
    rows = pc.collect()
    parents = {r["chunk_id"]: r["content"] for r in rows
               if r["chunk_type"] == "parent"}
    for r in rows:
        if r["chunk_type"] == "child":
            assert r["content"] in parents[r["parent_id"]]
