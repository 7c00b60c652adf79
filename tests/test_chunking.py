"""Property tests for the recursive splitter + parent-child hierarchy
(SURVEY §5 item 2: chunk reassembly covers the source text, size and
overlap bounds, parent⊇child containment)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from production_grade_rag_spark.operators.chunking import RecursiveSplitter

TEXTS = st.text(
    alphabet=st.sampled_from(list("ab c.\n#-!")), min_size=0, max_size=800)


@given(TEXTS)
@settings(max_examples=200, deadline=None)
def test_pieces_cover_all_nonspace_characters(text):
    sp = RecursiveSplitter(chunk_size=100, chunk_overlap=20)
    pieces = sp.split_text(text)
    # the splitter only ever drops whitespace (strip at chunk edges) and
    # only ever duplicates via overlap — so for every non-whitespace
    # character, the pieces contain at least as many copies as the input
    joined = "".join(pieces)
    for ch in set(text):
        if not ch.isspace():
            assert joined.count(ch) >= text.count(ch)


@given(TEXTS)
@settings(max_examples=200, deadline=None)
def test_every_piece_is_within_size_or_unsplittable(text):
    size = 100
    sp = RecursiveSplitter(chunk_size=size, chunk_overlap=20)
    for p in sp.split_text(text):
        # a piece may exceed chunk_size only if it contains no separator
        # (nothing left to split on except characters, which merge back)
        assert len(p) <= size or (" " not in p and "\n" not in p)


@given(TEXTS)
@settings(max_examples=200, deadline=None)
def test_pieces_are_substrings_in_order(text):
    sp = RecursiveSplitter(chunk_size=100, chunk_overlap=20)
    pieces = sp.split_text(text)
    pos = 0
    for p in pieces:
        found = text.find(p, pos)
        if found < 0:
            found = text.find(p)           # overlap can step backwards
        assert found >= 0, f"piece not a substring: {p!r}"
        pos = max(pos, found)              # order is non-decreasing


@given(TEXTS)
@settings(max_examples=100, deadline=None)
def test_parent_contains_child(text):
    psplit = RecursiveSplitter(chunk_size=200, chunk_overlap=40)
    csplit = RecursiveSplitter(chunk_size=50, chunk_overlap=10)
    for parent in psplit.split_text(text):
        for child in csplit.split_text(parent):
            assert child in parent


def test_known_example_sizes_and_overlap():
    text = ("para one is here.\n\npara two follows with more words than "
            "one.\n\n" + "word " * 100)
    sp = RecursiveSplitter(chunk_size=120, chunk_overlap=30)
    pieces = sp.split_text(text)
    assert len(pieces) >= 3
    assert all(len(p) <= 120 for p in pieces)
    # consecutive merged chunks share overlap context
    tail, head = pieces[-2], pieces[-1]
    assert any(head.startswith(tail[i:]) for i in range(len(tail)))


def test_spark_parent_child_invariants(spark):
    from conftest import SF001
    from production_grade_rag_spark.operators.chunking import chunk_parent_child
    from production_grade_rag_spark.sources import load_table
    docs = load_table(spark, SF001, "documents").limit(50)
    chunks = chunk_parent_child(docs).collect()
    parents = {c["chunk_id"]: c for c in chunks if c["chunk_type"] == "parent"}
    children = [c for c in chunks if c["chunk_type"] == "child"]
    assert parents and children
    for ch in children:
        p = parents[ch["parent_id"]]
        assert ch["content"] in p["content"]          # containment
        assert ch["doc_id"] == p["doc_id"]
    for p in parents.values():
        n = sum(1 for c in children if c["parent_id"] == p["chunk_id"])
        assert n == p["child_count"]
