"""Behavior tests for the round-8 entries (oracle parity itself is
auto-covered by test_oracle_parity.py; these pin the SEMANTICS the
hash can't express — the lift gate actually lifting, buckets actually
tertiling, the resample actually being ∝ exp(log_ratio))."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF01

from production_grade_rag_spark.plans.catalog import CATALOG


def test_dsir_mix_lift_holds(spark):
    # resampling toward the 'en' target LM must raise (or keep) the
    # en share — the gate column must be True, not merely hash-stable
    row = CATALOG["t17_dsir_mix"].build(spark, SF01).collect()[0]
    assert row["lift_ok"] is True
    assert row["n_resampled"] > 0
    assert row["resampled_en_share"] >= row["source_en_share"]


def test_dsir_resample_probability_shape(spark):
    res = CATALOG["t17_dsir_resample"].build(spark, SF01).collect()
    assert res, "resample accepted nothing"
    ps = [r["p_accept"] for r in res]
    assert all(0.0 < p <= 1.0 for p in ps)
    # the arg-max log_ratio doc has p = 1.0 and is always accepted
    assert max(ps) == 1.0
    lr = CATALOG["t16_dsir_weight"].build(spark, SF01)
    best = lr.orderBy(F.desc("log_ratio"), "doc_id").first()
    assert best["doc_id"] in {r["doc_id"] for r in res}


def test_perplexity_buckets_are_ordered_tertiles(spark):
    rows = CATALOG["ta_perplexity"].build(spark, SF01).collect()
    assert len(rows) == 500
    by = {}
    for r in rows:
        by.setdefault(r["ppl_bucket"], []).append(r["log_ppl"])
    assert set(by) == {"head", "middle", "tail"}
    assert max(by["head"]) <= min(by["middle"])
    assert max(by["middle"]) <= min(by["tail"])
    # tertiles: each bucket holds roughly a third of the corpus
    for b in by.values():
        assert 100 <= len(b) <= 250
    # BOS makes one bigram per token
    r0 = rows[0]
    assert r0["n_bigrams"] > 0 and r0["ppl"] > 0


def test_curate_modern_ppl_is_tail_dropped_subset(spark):
    modern = {r["doc_id"] for r in
              CATALOG["cc_curate_modern"].build(spark, SF01).collect()}
    gated = CATALOG["cc_curate_modern_ppl"].build(spark, SF01).collect()
    assert gated and {r["doc_id"] for r in gated} <= modern
    assert all(r["ppl_bucket"] in ("head", "middle") for r in gated)


def test_adaptive_probe_cells_shape(spark):
    from production_grade_rag_spark.operators.similarity import (
        adaptive_probe_cells)
    cent = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 0.0]),
         (2, [10.0, 0.0]), (3, [10.0, 10.0])],
        ["cell_id", "centroid"])
    q = [0.1, 0.0]
    near = adaptive_probe_cells(cent, q, floor=1, mass_target=0.5)
    assert near[0] == 0, "nearest cell probed first"
    wide = adaptive_probe_cells(cent, q, floor=1, mass_target=0.999)
    assert len(wide) >= len(near), "higher target never probes fewer"
    assert wide == sorted(wide, key=lambda c: [0, 1, 2, 3].index(c))
    assert len(adaptive_probe_cells(cent, q, floor=3,
                                    mass_target=0.01)) == 3
    assert len(adaptive_probe_cells(cent, q, floor=1,
                                    mass_target=0.999, cap=2)) <= 2
    # deterministic across calls
    assert wide == adaptive_probe_cells(cent, q, floor=1,
                                        mass_target=0.999)


def test_span_dedup_semantics(spark):
    rows = CATALOG["dd_span_dedup"].build(spark, SF01).collect()
    assert rows
    import hashlib
    empty_md5 = hashlib.md5(b"").hexdigest()
    total = sum(r["n_spans"] for r in rows)
    kept = sum(r["n_kept"] for r in rows)
    assert 0 < kept <= total
    for r in rows:
        assert 0 <= r["n_kept"] <= r["n_spans"]
        if r["n_kept"] == 0:
            assert r["dedup_md5"] == empty_md5


def test_seq_packing_offsets_contiguous(spark):
    rows = CATALOG["t18_seq_packing"].build(spark, SF01).collect()
    assert len(rows) == 500
    by_shard = {}
    for r in sorted(rows, key=lambda r: (r["shard"], r["doc_id"])):
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, docs in by_shard.items():
        expect = 0
        for r in docs:
            assert r["tok_offset"] == expect, "packing must be gapless"
            assert r["est_tokens"] >= 1
            assert r["seq_start"] == r["tok_offset"] // 2048
            expect += r["est_tokens"]
    stats = {r["shard"]: r for r in
             CATALOG["t18_packing_stats"].build(spark, SF01).collect()}
    for shard, docs in by_shard.items():
        s = stats[shard]
        total = sum(r["est_tokens"] for r in docs)
        assert s["total_tokens"] == total
        assert 0 <= s["tail_waste"] < 2048
        assert s["n_seqs"] == -(-total // 2048)


def test_domain_mix_is_deterministic_rebalance(spark):
    rep = CATALOG["t19_domain_mix_report"].build(spark, SF01).collect()
    assert len(rep) == 20
    tot = sum(r["n_kept"] for r in rep)
    assert tot > 0
    assert abs(sum(r["achieved_share"] for r in rep) - 1.0) < 1e-4
    for r in rep:
        assert r["n_kept"] <= r["n_s"]
        assert 0 < r["thresh"] <= 1_000_000
        # the rarest source keeps everything (thresh == 1e6)
    assert max(r["thresh"] for r in rep) == 1_000_000
    # deterministic across builds
    again = CATALOG["t19_domain_mix"].build(spark, SF01).collect()
    assert {r["doc_id"] for r in again} == {
        r["doc_id"] for r in CATALOG["t19_domain_mix"]
        .build(spark, SF01).collect()}


def test_bitext_pairs_are_mutual(spark):
    rows = CATALOG["r9_bitext_pairs"].build(spark, SF01).collect()
    assert rows
    a_ids = [r["a_id"] for r in rows]
    b_ids = [r["b_id"] for r in rows]
    assert len(a_ids) == len(set(a_ids)), "one best pair per a"
    assert len(b_ids) == len(set(b_ids)), "one best pair per b"
    for r in rows:
        assert r["margin"] > 0


def test_bpe_merges_are_valid_and_monotone(spark):
    rows = CATALOG["t20_bpe_merges"].build(spark, SF01).collect()
    assert [r["merge_rank"] for r in rows] == [1, 2, 3, 4]
    counts = [r["pair_count"] for r in rows]
    # each merge reduces or preserves the achievable max pair count
    assert counts == sorted(counts, reverse=True)
    for r in rows:
        assert r["merged"] == r["lhs"] + r["rhs"]
        assert r["pair_count"] > 0
        assert " " not in r["merged"]
    # deterministic across builds
    again = CATALOG["t20_bpe_merges"].build(spark, SF01).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]


def test_matryoshka_overlap_bounds(spark):
    row = CATALOG["r10_matryoshka_overlap"].build(spark, SF01).collect()[0]
    assert 0 <= row["n_overlap"] <= row["k"] == 10
    topk = CATALOG["r10_matryoshka_topk"].build(spark, SF01).collect()
    assert len(topk) == 10
    scores = [r["score"] for r in topk]
    assert scores == sorted(scores, reverse=True)


def test_bpe_apply_compression(spark):
    rows = CATALOG["t20_bpe_apply"].build(spark, SF01).collect()
    assert len(rows) == 500
    for r in rows:
        # merges only ever shrink the per-word symbol count, floor 1
        assert r["n_words"] <= r["n_bpe_tokens"]
        assert r["symbols_per_word"] >= 1.0


def test_sketch_gates_hold(spark):
    hll = CATALOG["a10_hll_cardinality"].build(spark, SF01).collect()
    assert len(hll) == 20 and all(r["within_bound"] for r in hll)
    q = CATALOG["a11_quantile_sketch"].build(spark, SF01).collect()
    assert len(q) == 5 and all(r["within_bound"] for r in q)
    assert all(r["p50_exact"] > 0 for r in q)


def test_dupgram_profile_bounds(spark):
    rows = CATALOG["dd_dupgram_profile"].build(spark, SF01).collect()
    assert len(rows) == 500
    for r in rows:
        assert 0 <= r["n_dup_grams"] <= r["n_grams"]
        assert 0.0 <= r["dup_frac"] <= 1.0
    # the synthetic corpus contains exact duplicates -> some docs are
    # fully duplicated, most are not
    fracs = [r["dup_frac"] for r in rows]
    assert max(fracs) > 0.0 and min(fracs) == 0.0
