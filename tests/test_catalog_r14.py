"""Round-14 pins: VERDICT r13 #1 (derived audit stratum modulus +
inverted-index exact verify) and the round's other additions.
"""
from __future__ import annotations

import pytest

from tests.conftest import SF01  # noqa: F401

SF001 = "/root/testdata/sf0.001"


def _docs(spark, d=SF001):
    from production_grade_rag_spark.sources import load_table
    return load_table(spark, d, "documents").select("doc_id", "text")


# ---------------------------------------------------------------------------
# VERDICT r13 #1: the inverted-index exact Jaccard join is a plan
# change, not a semantics change — it must equal the nested-loop form
# pair for pair, jaccard for jaccard.
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("threshold", [0.3, 0.5, 0.8])
def test_ngram_index_equals_nested_loop(spark, threshold):
    from production_grade_rag_spark.operators.dedup import (
        ngram_jaccard_pairs, ngram_jaccard_pairs_index)
    docs = _docs(spark)
    want = sorted((r["id_a"], r["id_b"], r["jaccard"]) for r in
                  ngram_jaccard_pairs(docs, threshold=threshold).collect())
    got = sorted((r["id_a"], r["id_b"], r["jaccard"]) for r in
                 ngram_jaccard_pairs_index(docs,
                                           threshold=threshold).collect())
    assert got == want
    assert len(want) > 0   # non-vacuous on this corpus


def test_ngram_index_rejects_threshold_zero(spark):
    from production_grade_rag_spark.operators.dedup import \
        ngram_jaccard_pairs_index
    with pytest.raises(ValueError, match="threshold > 0"):
        ngram_jaccard_pairs_index(_docs(spark), threshold=0.0)


# ---------------------------------------------------------------------------
# VERDICT r13 #1: the stratum modulus derives from the corpus count —
# bounded stratum at any scale, the r13 operating point preserved at
# sf0.1, whole-corpus (exact P/R) below the target.
# ---------------------------------------------------------------------------

def test_audit_stratum_mod_derivation():
    from production_grade_rag_spark.plans.catalog_r11 import (
        _AUDIT_MH_TARGET, audit_stratum_mod)
    assert audit_stratum_mod(500) == 1      # sf0.01: whole corpus
    assert audit_stratum_mod(2048) == 1
    assert audit_stratum_mod(2049) == 2
    assert audit_stratum_mod(5000) == 4     # sf0.1: the r13 point
    assert audit_stratum_mod(50_000) == 32  # 10x stress tier
    assert audit_stratum_mod(10**9) == 1 << 19
    # the invariant the derivation exists for: stratum size bounded by
    # the target (and above half of it, so variance never collapses)
    for n in (1, 100, 2048, 4097, 123_457, 10**7, 10**9):
        m = audit_stratum_mod(n)
        assert n / m <= _AUDIT_MH_TARGET
        if m > 1:
            assert n / m > _AUDIT_MH_TARGET / 2


# ---------------------------------------------------------------------------
# VERDICT r13 #2: the IVF probe default consumes the measured corpus
# geometry — isotropic readings keep the certified half-the-cells
# point, clustered readings drop to the certified 1/32, and the map
# floors (never fewer probes than the two-anchor line).
# ---------------------------------------------------------------------------

def test_probe_bits_anchors_and_clamps():
    from production_grade_rag_spark.operators.knn_graph import (
        derived_n_probe, probe_bits)
    assert probe_bits(0.004) == 1     # isotropic anchor -> 1/2
    assert probe_bits(0.290) == 5     # clustered anchor -> 1/32
    assert probe_bits(-0.2) == 1      # clamp low
    assert probe_bits(0.9) == 5       # clamp high
    # floor = conservative: between anchors, never fewer probes than
    # the interpolation line implies
    for a in (0.05, 0.1, 0.15, 0.2, 0.25):
        t = (a - 0.004) / (0.290 - 0.004)
        assert probe_bits(a) <= 1 + t * 4
    # geometry-unknown default stays the isotropic worst case
    assert derived_n_probe(128) == 64
    assert derived_n_probe(128, 0.004) == 64
    assert derived_n_probe(128, 0.290) == 4
    assert derived_n_probe(16, 0.290) == 4   # floor at 4


def test_measured_anisotropy_isotropic_corpus(spark):
    """The hash corpus reads near-zero anisotropy, so the default IVF
    operating point is UNCHANGED from the r12/r13 certified (16, 8)."""
    from production_grade_rag_spark.operators.knn_graph import (
        _resolve_ivf, measured_anisotropy)
    from production_grade_rag_spark.sources import load_table
    emb = load_table(spark, SF01, "embeddings")
    a = measured_anisotropy(emb, emb.count())
    assert abs(a) < 0.05
    assert _resolve_ivf(spark, SF01, "ivf", None, None) == (16, 8)


# ---------------------------------------------------------------------------
# VERDICT r13 #4: OPQ rotation — orthogonality, monotone error
# improvement on correlated geometry, and the rotated store's
# end-to-end recall gate.
# ---------------------------------------------------------------------------

def test_opq_rotation_is_orthogonal_and_helps_on_correlated(spark):
    import numpy as np
    from production_grade_rag_spark.operators import pq
    from production_grade_rag_spark.sources import load_table
    emb = load_table(spark, SF01, "embeddings")
    R, books = pq.opq_train(emb, m=8, k_codes=16, sample=512,
                            opq_iters=4, km_iters=3)
    assert np.allclose(R @ R.T, np.eye(R.shape[0]), atol=1e-8)
    # on correlated-spectrum geometry the rotation must strictly
    # reduce sample quantization error vs the unrotated fit
    rng_free = np.asarray(
        [[(int(__import__("hashlib").md5(f"t:{i}:{j}".encode())
               .hexdigest()[:8], 16) / 0xFFFFFFFF * 2 - 1)
          for j in range(16)] for i in range(512)])
    scale = np.power(np.arange(1, 17, dtype=float), -0.75)
    M = np.asarray(
        [[(int(__import__("hashlib").md5(f"q:{i}:{j}".encode())
               .hexdigest()[:8], 16) / 0xFFFFFFFF * 2 - 1)
          for j in range(16)] for i in range(16)])
    Q, _ = np.linalg.qr(M)
    X = (rng_free * scale) @ Q
    books0 = pq._lloyd_books(X, 4, 8, iters=4)
    e0 = ((X - pq._pq_reconstruct(X, books0)) ** 2).sum()
    R2 = np.eye(16)
    for _ in range(6):
        Xr = X @ R2
        b = pq._lloyd_books(Xr, 4, 8, iters=4)
        Y = pq._pq_reconstruct(Xr, b)
        U, _s, Vt = np.linalg.svd(X.T @ Y)
        R2 = U @ Vt
    b = pq._lloyd_books(X @ R2, 4, 8, iters=4)
    Xr = X @ R2
    e1 = ((Xr - pq._pq_reconstruct(Xr, b)) ** 2).sum()
    assert e1 < e0


def test_ivfpq_opq_gate_green(spark):
    from production_grade_rag_spark.plans.catalog import CATALOG
    row = CATALOG["r4_ivfpq_opq_recall"].build(spark, SF01).collect()[0]
    assert row["floor_met"]


# ---------------------------------------------------------------------------
# VERDICT r13 #3: the streaming release audit drains to EXACTLY the
# batch card (same monitors, same policy flags), and the stratum
# registry's nested-modulus prune is sound.
# ---------------------------------------------------------------------------

def test_st_release_audit_equals_batch(spark):
    from production_grade_rag_spark.plans.catalog import CATALOG
    st = CATALOG["st_release_audit"].build(spark, SF01).collect()
    bt = CATALOG["cc_release_audit"].build(spark, SF01).collect()
    assert [tuple(r) for r in st] == [tuple(r) for r in bt]
    assert len(st) == 7


def test_stratum_nesting_prune_is_sound(spark):
    """Power-of-two md5 strata NEST (m | 2m => stratum(2m) subset of
    stratum(m)), so the streaming registry's re-filter-at-larger-mod
    prune keeps exactly the docs a fresh filter at the final modulus
    would — the invariant st_release_audit's bounded state rests on."""
    from pyspark.sql import functions as F
    from production_grade_rag_spark.operators.dedup import md5_int32
    ids = spark.range(0, 4000).select(F.col("id").alias("doc_id"))
    key = md5_int32(F.concat(F.lit("pr:"), F.col("doc_id").cast("string")))
    s2 = ids.filter(F.pmod(key, F.lit(2)) == 0)
    pruned = s2.filter(F.pmod(key, F.lit(8)) == 0)
    direct = ids.filter(F.pmod(key, F.lit(8)) == 0)
    a = sorted(r["doc_id"] for r in pruned.collect())
    b = sorted(r["doc_id"] for r in direct.collect())
    assert a == b and len(a) > 0


def test_pr_stratum_counts_shared_by_card_and_standalone(spark):
    """The standalone entry is EXACTLY the shared helper plus derived
    ratios (one implementation — VERDICT r13 #6)."""
    from production_grade_rag_spark.plans.catalog import CATALOG
    from production_grade_rag_spark.plans.catalog_r11 import \
        pr_stratum_counts
    row = CATALOG["dd_minhash_pr_sampled"].build(spark, SF01).collect()[0]
    helper = pr_stratum_counts(spark, SF01).collect()[0]
    for c in ("n_stratum", "n_candidates", "n_true_pos", "n_exact"):
        assert row[c] == helper[c]
