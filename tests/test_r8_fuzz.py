"""Hypothesis fuzz for the round-8 expression-level machinery: the
three-sentence span constructor and the BPE merge fold are the two
places where a column expression re-implements sequential Python
logic — fuzz them against plain-Python references (the same strategy
that caught the unicode-whitespace chunk-gate landmine in r7)."""

from __future__ import annotations

import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F


SENT_RE = r"[.!?]+"


def spans_py(text: str) -> list[str]:
    sents = [s for s in (x.strip(" ") for x in re.split(SENT_RE, text))
             if s != ""]
    if len(sents) >= 3:
        return [" ".join(sents[i:i + 3]) for i in range(len(sents) - 2)]
    if sents:
        return [" ".join(sents)]
    return []


def bpe_merge_py(word: str, a: str, b: str) -> list[str]:
    out: list[str] = []
    for ch in word:
        if out and out[-1] == a and ch == b:
            out[-1] = a + b
        else:
            out.append(ch)
    return out


TEXTS = st.text(
    alphabet=list("ab c.!?\nxyz") + ["é", "中"], min_size=0, max_size=60)


@settings(max_examples=30, deadline=None)
@given(st.lists(TEXTS, min_size=1, max_size=8))
def test_spans_col_matches_python(spark, texts):
    from production_grade_rag_spark.plans.catalog_r8 import _spans_col
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               ["doc_id", "text"])
    got = {r["doc_id"]: r["spans"] for r in
           df.select("doc_id", _spans_col().alias("spans")).collect()}
    for i, t in enumerate(texts):
        assert got[i] == spans_py(t), repr(t)


WORDS = st.text(alphabet=list("aabbc中"), min_size=0, max_size=12)


@settings(max_examples=20, deadline=None)
@given(st.lists(WORDS.filter(lambda w: len(w) >= 1),
                min_size=1, max_size=6),
       st.sampled_from(["a", "b", "c", "中"]),
       st.sampled_from(["a", "b", "c", "中"]))
def test_bpe_fold_matches_python(spark, words, a, b):
    df = spark.createDataFrame([(w,) for w in set(words)], ["tok"])
    syms = F.split(F.col("tok"), "")
    init = F.element_at(syms, 1)
    rest = F.slice(syms, 2, F.size(syms) - 1)
    folded = F.aggregate(
        rest, init,
        lambda acc, x:
        F.when(((acc == F.lit(a)) | acc.endswith(" " + a))
               & (x == F.lit(b)),
               F.concat(acc.substr(F.lit(1),
                                   F.length(acc) - F.lit(len(a))),
                        F.lit(a + b)))
         .otherwise(F.concat(acc, F.lit(" "), x)))
    got = {r["tok"]: r["m"] for r in
           df.select("tok", F.split(folded, " ").alias("m")).collect()}
    for w in set(words):
        assert got[w] == bpe_merge_py(w, a, b), (w, a, b)
