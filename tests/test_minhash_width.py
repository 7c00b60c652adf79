"""MinHash width sweep (round-3 verdict item 6): the demo default
16 hashes / 4 bands is deliberately coarse; this pins the S-curve —
candidate recall against the exact-Jaccard ground truth must improve
when the signature widens at fixed rows-per-band, and the wide config
recommended for corpus scale must catch essentially every pair at the
0.8 threshold.

Corpus construction: 24 (original, perturbed) pairs over disjoint
token vocabularies (no cross-pair shingle collisions), perturbation
size swept so exact 3-shingle Jaccard spans ~0.3..0.97 — points on
both sides of every band-collision knee.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from production_grade_rag_spark.operators.dedup import (
    HASH_A, HASH_B, MAX_MINHASH_WIDTH, minhash_dedup_pairs,
    ngram_jaccard_pairs)


def _skewed_pair_corpus(spark):
    docs = []
    base_len = 60
    for p in range(24):
        toks = [f"p{p}tok{i}" for i in range(base_len)]
        m = 1 + p          # replacements: 1..24 -> jaccard ~0.97..0.3
        pert = [f"p{p}alt{i}" if i < m else t for i, t in enumerate(toks)]
        docs.append((2 * p, " ".join(toks)))
        docs.append((2 * p + 1, " ".join(pert)))
    return spark.createDataFrame(docs, ["doc_id", "text"])


def test_hash_family_supports_scale_width():
    assert len(HASH_A) == len(HASH_B) == MAX_MINHASH_WIDTH == 128
    # no overflow headroom regression: A*base + B stays below 2^63
    assert all(0 < a < 2**31 for a in HASH_A)
    assert max(HASH_A) * (2**32 - 1) + max(HASH_B) < 2**63


def test_minhash_recall_s_curve_across_widths(spark):
    df = _skewed_pair_corpus(spark)
    threshold = 0.6
    exact = {(r["id_a"], r["id_b"])
             for r in ngram_jaccard_pairs(df, threshold=threshold).collect()}
    assert len(exact) >= 10, "corpus must span the threshold region"

    def recall(num_hashes, num_bands):
        got = {(r["id_a"], r["id_b"]) for r in
               minhash_dedup_pairs(df, threshold=threshold,
                                   num_hashes=num_hashes,
                                   num_bands=num_bands).collect()}
        # post-verify results are always a subset of the exact pairs
        # (precision 1 by construction) — recall is the only variable.
        assert got <= exact
        return len(got) / len(exact)

    r_demo = recall(16, 4)     # r=4, b=4   (demo default)
    r_wide = recall(64, 16)    # r=4, b=16  (same knee, 4x the bands)
    r_full = recall(128, 32)   # r=4, b=32  (recommended at scale)
    # more bands at fixed rows-per-band strictly raises collision
    # probability for every pair: 1-(1-j^4)^b is increasing in b.
    assert r_demo <= r_wide <= r_full
    assert r_full > r_demo, "width must actually buy recall on this corpus"
    assert r_full >= 0.9


def test_wide_minhash_catches_all_high_jaccard_pairs(spark):
    # at threshold 0.8 the scale config (128/16, r=8: 50% knee at
    # j~0.71) must catch every true pair — these are the pairs a
    # 100 TB dedup run cannot afford to miss.
    df = _skewed_pair_corpus(spark)
    exact = {(r["id_a"], r["id_b"])
             for r in ngram_jaccard_pairs(df, threshold=0.8).collect()}
    got = {(r["id_a"], r["id_b"]) for r in
           minhash_dedup_pairs(df, threshold=0.8, num_hashes=128,
                               num_bands=16).collect()}
    assert len(exact) >= 5
    assert got == exact


def test_bucket_cap_drops_megacluster_keeps_genuine_pairs(spark):
    # adversarial skew: one boilerplate template shared by 40 docs (an
    # LSH megacluster — every band bucket holds all 40) next to two
    # genuine near-dup pairs on disjoint vocabularies.  The cap must
    # drop the megacluster's quadratic pair set while the small
    # buckets pair normally.
    template = " ".join(f"boiler{i}" for i in range(60))
    rows = [(i, template) for i in range(40)]
    for p in range(2):
        toks = [f"g{p}tok{i}" for i in range(60)]
        pert = list(toks)
        pert[0] = f"g{p}alt0"
        rows.append((100 + 2 * p, " ".join(toks)))
        rows.append((101 + 2 * p, " ".join(pert)))
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    capped = {(r["id_a"], r["id_b"]) for r in minhash_dedup_pairs(
        df, threshold=0.8, num_hashes=32, num_bands=8,
        max_bucket=10).collect()}
    assert capped == {(100, 101), (102, 103)}, \
        "cap must drop megacluster pairs and keep genuine ones"

    uncapped = {(r["id_a"], r["id_b"]) for r in minhash_dedup_pairs(
        df, threshold=0.8, num_hashes=32, num_bands=8,
        max_bucket=None).collect()}
    assert {(a, b) for a in range(40) for b in range(40) if a < b} <= uncapped

    from production_grade_rag_spark.operators.dedup import minhash_cap_report
    rep = minhash_cap_report(df, num_hashes=32, num_bands=8,
                             max_bucket=10).collect()[0]
    assert rep["n_buckets_capped"] == 8          # one megabucket per band
    assert rep["n_rows_capped"] == 8 * 40
    assert rep["n_pairs_avoided"] == 8 * (40 * 39 // 2)
