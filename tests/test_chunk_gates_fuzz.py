"""Property fuzz for the driver-window chunker gates: the invariant
summaries in operators/chunk_gates.py are constant-pinned against the
oracle (TRUE / 0), so they must hold for ANY document corpus — a
testdata regeneration with new text shapes must not flip them.  This
fuzz feeds adversarial shapes (whitespace runs, unicode, repetition,
separator pile-ups, empty/huge docs) through all three gates and
asserts every violation counter stays zero."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from production_grade_rag_spark.operators import chunk_gates

# shapes chosen to stress splitter edge paths: separator runs, unicode
# whitespace (python-vs-java \s divergence candidates), long repeats
_CHUNKS = st.one_of(
    st.text(alphabet=" \t\n", max_size=8),
    # python-isspace-but-not-java-\s characters: the boundary class
    # that once flipped the m1 coverage gate (see chunk_gates._WS)
    st.text(alphabet="\u00a0\u2003\u2028\x1c\x85 a\n", max_size=12),
    st.text(alphabet="ab \n", max_size=40),
    st.sampled_from(["\n\n", "\n", " ", "", "x" * 500, "word " * 80,
                     "   ", "Ω≈ç√∫˜µ\n", "repeat me. "]),
    st.text(max_size=60),
)
_DOC = st.lists(_CHUNKS, min_size=0, max_size=30).map("".join)


def _assert_all_zero(row, skip=("has_chunks", "has_rows")):
    for k, v in row.asDict().items():
        if k in skip:
            continue
        assert v == 0, f"{k} = {v}"


@pytest.mark.parametrize("gate", [
    chunk_gates.m1_recursive_invariants,
    chunk_gates.m2_parent_child_invariants,
    chunk_gates.r2_parent_context_invariants,
])
@settings(max_examples=4, deadline=None)
@given(texts=st.lists(_DOC, min_size=3, max_size=12))
def test_gates_hold_on_arbitrary_corpora(spark, gate, texts):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])
    out = gate(docs).collect()
    assert len(out) == 1
    _assert_all_zero(out[0])


def test_gates_hold_on_pathological_fixed_corpus(spark):
    """Deterministic worst-case shapes (no hypothesis shrink noise):
    heavy repetition (duplicate-occurrence offsets), 6000-char runs
    without separators, pure whitespace, unicode whitespace, empty."""
    rows = [
        (0, ""),
        (1, "   \n\n\t  "),
        (2, ("para one words here.\n\n" * 120)),      # repeated paras
        (3, "z" * 6000),                               # no separators
        (4, ("  " + "tok " * 900)),          # unicode ws head
        (5, ("line\n" * 800)),
        (6, "short"),
        (7, ("alpha beta" + "\u00a0\n\n" + "word " * 300
             + "\u00a0 middle\u00a0nbsp " + "pad " * 300 + "tail.")),
        (8, "single chunk with nbsp tail, no overlap to mask it\u00a0"),
        (9, "\u00a0\u2003\u00a0"),           # pure unicode whitespace
        (10, "\x1c\x1d\x1e\x1f"),           # python-isspace controls
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    for gate in (chunk_gates.m1_recursive_invariants,
                 chunk_gates.m2_parent_child_invariants,
                 chunk_gates.r2_parent_context_invariants):
        _assert_all_zero(gate(docs).collect()[0])
