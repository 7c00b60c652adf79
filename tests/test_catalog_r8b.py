"""Behavior tests for the round-8 session-3 entries (oracle parity is
auto-covered by test_oracle_parity.py; these pin the semantics the
hash can't express — the temperature actually flattening the mix, the
ablation agreeing with the release funnel, the per-domain cut
actually being per-domain, the CMS bound holding, the cluster cap
actually balancing)."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF01

from production_grade_rag_spark.plans.catalog import CATALOG


def test_temp_mix_flattens_toward_sqrt(spark):
    rep = {r["source"]: r for r in
           CATALOG["t24_temp_mix_report"].build(spark, SF01).collect()}
    assert rep
    smallest = min(rep.values(), key=lambda r: r["n_s"])
    largest = max(rep.values(), key=lambda r: r["n_s"])
    # smallest source keeps everything (threshold saturates at 1e6)
    assert smallest["thresh"] == 1_000_000
    assert smallest["n_kept"] == smallest["n_s"]
    if largest["n_s"] > smallest["n_s"]:
        assert largest["thresh"] < 1_000_000
        # flattening: the largest source's share of the KEPT corpus
        # is below its raw share; the smallest source's is above
        n_raw = sum(r["n_s"] for r in rep.values())
        n_kept = sum(r["n_kept"] for r in rep.values())
        assert (largest["n_kept"] / n_kept) < (largest["n_s"] / n_raw)
        assert (smallest["n_kept"] / n_kept) > (smallest["n_s"] / n_raw)
    # achieved share tracks the sqrt target within sampling noise
    for r in rep.values():
        assert abs(r["achieved_share"] - r["target_share"]) < 0.05
    # and the target shares are a distribution
    assert abs(sum(r["target_share"] for r in rep.values()) - 1.0) < 1e-3


def test_temp_mix_is_between_raw_and_uniform(spark):
    # t19 equalizes (alpha=0), raw is alpha=1; t24 (alpha=.5) sits
    # strictly between for the dominant source
    t19 = {r["source"]: r["n_kept"] for r in
           CATALOG["t19_domain_mix_report"].build(spark, SF01).collect()}
    rep = {r["source"]: r for r in
           CATALOG["t24_temp_mix_report"].build(spark, SF01).collect()}
    tot24 = sum(r["n_kept"] for r in rep.values())
    tot19 = sum(t19.values())
    raw = sum(r["n_s"] for r in rep.values())
    largest = max(rep.values(), key=lambda r: r["n_s"])
    s = largest["source"]
    share_raw = largest["n_s"] / raw
    share_19 = t19[s] / tot19
    share_24 = largest["n_kept"] / tot24
    if largest["n_s"] > min(r["n_s"] for r in rep.values()):
        assert share_19 - 0.02 <= share_24 <= share_raw + 0.02


def test_temp_mix_flattens_on_skewed_corpus(spark, tmp_path):
    # sf0.01 sources are uniform (every threshold saturates), so the
    # temperature path proper is exercised on a synthetic skewed
    # corpus: 400/90/10 docs across three sources.  alpha=0.5 keep
    # rate is sqrt(10/n_s) -> thresholds 158113/333333/1000000.
    rows = []
    sizes = {"web": 400, "wiki": 90, "code": 10}
    i = 0
    for src, n in sizes.items():
        for _ in range(n):
            rows.append((i, src))
            i += 1
    (spark.createDataFrame(rows, ["doc_id", "source"])
     .write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet"))
    rep = {r["source"]: r for r in
           CATALOG["t24_temp_mix_report"].build(spark, str(tmp_path))
           .collect()}
    assert rep["code"]["thresh"] == 1_000_000
    assert rep["wiki"]["thresh"] == 333_333
    assert rep["web"]["thresh"] == 158_113
    assert rep["code"]["n_kept"] == 10
    n_kept = sum(r["n_kept"] for r in rep.values())
    # raw web share 0.8 -> sqrt target 0.613; kept share must land
    # well below raw and above the t19-equalized 1/3
    web_share = rep["web"]["n_kept"] / n_kept
    assert 0.45 <= web_share <= 0.78
    assert abs(rep["web"]["target_share"]
               - (20.0 / (20.0 + 9.486833 + 3.162278))) < 1e-3


def test_rule_ablation_consistent_with_funnel(spark):
    ab = {r["rule"]: r for r in
          CATALOG["t25_rule_ablation"].build(spark, SF01).collect()}
    assert set(ab) == {"gopher", "c4_page", "lang_en", "perplexity"}
    fun = {r["stage"]: r for r in
           CATALOG["cc_release_funnel"].build(spark, SF01).collect()}
    n_docs = fun["raw"]["docs"]
    # the funnel's gopher stage and the ablation's gopher fail count
    # partition the same scan
    assert fun["gopher"]["docs"] == n_docs - ab["gopher"]["n_fail"]
    for r in ab.values():
        assert 0 <= r["n_fail_only"] <= r["n_fail"] <= n_docs
        assert abs(r["share_fail"] - r["n_fail"] / n_docs) < 1e-5
    # survivors pass every rule: pass_all <= n_docs - max fail
    worst = max(r["n_fail"] for r in ab.values())
    n_pass = ab["gopher"]["n_pass_all"]
    assert all(r["n_pass_all"] == n_pass for r in ab.values())
    assert n_pass <= n_docs - worst


def test_quality_pernorm_is_per_domain_quartile(spark):
    kept = CATALOG["w10_quality_pernorm"].build(spark, SF01).collect()
    assert kept
    by_src = {}
    for r in kept:
        assert r["q_score"] >= r["p75"]
        by_src.setdefault(r["source"], []).append(r)
    docs = spark.read.parquet(f"{SF01}/documents.parquet")
    totals = {r["source"]: r["n"] for r in
              docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    fracs = {src: len(rows) / totals[src] for src, rows in by_src.items()}
    for src, frac in fracs.items():
        # at least the top quartile survives by construction; heavy
        # score ties can push a source's kept fraction up to 1.0
        assert frac >= 0.2, (src, frac)
    # ...but the cut must actually bite somewhere
    assert min(fracs.values()) <= 0.6
    # every source with >= 4 docs contributes survivors
    assert set(by_src) == {s for s, n in totals.items() if n >= 4}


def test_heavy_hitters_bound_and_order(spark):
    rows = CATALOG["a20_heavy_hitters"].build(spark, SF01).collect()
    assert len(rows) == 10
    assert all(r["within_bound"] for r in rows)
    counts = [r["n_exact"] for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_cluster_balanced_sample_caps_clusters(spark):
    kept = CATALOG["g3_cluster_balanced_sample"].build(spark, SF01)
    per = {r["cluster"]: r["n"] for r in
           kept.groupBy("cluster").agg(F.count("*").alias("n")).collect()}
    asg = CATALOG["g2_kmeans_assign"].build(spark, SF01)
    sizes = {r["cluster"]: r["n"] for r in
             asg.groupBy("cluster").agg(F.count("*").alias("n")).collect()}
    min_n = min(sizes.values())
    assert set(per) <= set(sizes)
    for c, n in per.items():
        assert n <= sizes[c]
        # hash-threshold sampling keeps ~min_n per cluster
        assert abs(n - min_n) <= max(10, int(0.2 * min_n)), (c, n, min_n)
    # the smallest cluster keeps everything
    smallest = min(sizes, key=sizes.get)
    assert per[smallest] == sizes[smallest]


def test_pca_explained_near_numpy_top_eigenshare(spark):
    import numpy as np
    row = CATALOG["g4_pca_explained"].build(spark, SF01).collect()[0]
    emb = (spark.read.parquet(f"{SF01}/embeddings.parquet")
           .orderBy("vec_id").select("embedding").collect())
    X = np.array([list(r["embedding"][:16]) for r in emb], dtype=float)
    Xq = np.floor(X * 10000 + 0.5)
    mu = np.trunc(Xq.sum(axis=0) / len(Xq))
    C = Xq - mu
    w = np.linalg.eigvalsh(C.T @ C)
    top_share = w[-1] / w.sum()
    # the iterated direction captures nearly the max variance even
    # on this near-isotropic corpus, and never more than the max
    assert row["explained_ratio"] <= top_share + 1e-6
    assert row["explained_ratio"] >= 0.9 * top_share
    assert row["vv_q"] > 0 and row["tot_q"] > 0 and row["num_q"] > 0


def test_pca_power_converges_on_anisotropic_corpus(spark, tmp_path):
    import numpy as np
    # one direction (dim 4, 0-indexed 3) with 20x the variance of the
    # rest: the eigengap is huge, so 6 iterations must pin it
    rng = np.random.RandomState(7)
    X = rng.normal(0, 0.01, size=(400, 16))
    X[:, 3] += rng.normal(0, 0.2, size=400)
    rows = [(int(i), [float(x) for x in X[i]]) for i in range(400)]
    (spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")
     .write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet"))
    out = CATALOG["g4_pca_power"].build(spark, str(tmp_path)).collect()
    v = np.array([r["v_q"] for r in sorted(out, key=lambda r: r["dim"])],
                 dtype=float)
    cos = abs(v[3]) / np.linalg.norm(v)
    assert cos > 0.99, cos


def test_power_iters_gram_equals_inplan_loop(spark):
    # r15 optimization pin: the one-pass Gram collapse of _power_iters
    # must reproduce the distributed in-plan loop's trajectory
    # BIT-IDENTICALLY (integer-sum rearrangement is exact; every
    # division truncates toward zero in both forms).  This is the old
    # r14 implementation inlined as the reference.
    from production_grade_rag_spark.plans.catalog_r8b import (
        _PCA_D, _PCA_ITERS, _PCA_VS, _pca_frames, _power_iters)
    c, v_fast = _pca_frames(spark, SF01)
    D, VS = _PCA_D, _PCA_VS
    v = spark.range(1).select(F.array(
        F.lit(VS).cast("long"),
        *[F.lit(0).cast("long") for _ in range(D - 1)]).alias("v"))
    for _ in range(_PCA_ITERS):
        s = (c.crossJoin(F.broadcast(v))
             .select("cv",
                     F.aggregate(F.zip_with("cv", "v", lambda a, b: a * b),
                                 F.lit(0).cast("long"),
                                 lambda acc, x: acc + x).alias("s")))
        w = s.agg(*[F.sum(F.element_at("cv", i + 1) * F.col("s"))
                    .cast("long").alias(f"w{i}") for i in range(D)])
        m_expr = F.expr(
            f"greatest({', '.join(f'abs(w{i})' for i in range(D))}) div {VS}")
        w = w.withColumn("m", F.greatest(m_expr, F.lit(1).cast("long")))
        v = w.select(F.array(
            *[F.expr(f"w{i} div m") for i in range(D)]).alias("v"))
    assert list(v_fast.first()["v"]) == list(v.first()["v"])
    # and the same for a non-e1 start over a derived frame (the
    # g4_pca_power2 deflated-loop call shape)
    u_fast = _power_iters(c, [0, VS] + [0] * (D - 2))
    u = spark.range(1).select(F.array(
        F.lit(0).cast("long"), F.lit(VS).cast("long"),
        *[F.lit(0).cast("long") for _ in range(D - 2)]).alias("v"))
    for _ in range(_PCA_ITERS):
        s = (c.crossJoin(F.broadcast(u))
             .select("cv",
                     F.aggregate(F.zip_with("cv", "v", lambda a, b: a * b),
                                 F.lit(0).cast("long"),
                                 lambda acc, x: acc + x).alias("s")))
        w = s.agg(*[F.sum(F.element_at("cv", i + 1) * F.col("s"))
                    .cast("long").alias(f"w{i}") for i in range(D)])
        m_expr = F.expr(
            f"greatest({', '.join(f'abs(w{i})' for i in range(D))}) div {VS}")
        w = w.withColumn("m", F.greatest(m_expr, F.lit(1).cast("long")))
        u = w.select(F.array(
            *[F.expr(f"w{i} div m") for i in range(D)]).alias("v"))
    assert list(u_fast.first()["v"]) == list(u.first()["v"])


def test_bloom_prefilter_contract(spark):
    row = CATALOG["a21_bloom_prefilter"].build(spark, SF01).collect()[0]
    # Bloom guarantee: no false negatives, ever
    assert row["no_false_negatives"] is True
    assert row["n_bloom_hits"] >= row["n_true_members"]
    assert row["n_false_pos"] == row["n_bloom_hits"] - row["n_true_members"]
    # measured FP rate lands near the (1-e^(-kn/m))^k ~ 0.005 theory
    assert row["fp_rate"] <= 0.05
    assert row["n_batch"] > 0 and row["n_store"] > 0


def test_eval_split_is_stable_partition(spark):
    rows = CATALOG["t26_eval_split"].build(spark, SF01).collect()
    assert len(rows) == 500
    by = {}
    for r in rows:
        by.setdefault(r["split"], set()).add(r["doc_id"])
    assert set(by) == {"train", "val", "test"}
    # global shares near 80/10/10
    assert abs(len(by["test"]) / 500 - 0.10) < 0.05
    assert abs(len(by["val"]) / 500 - 0.10) < 0.05
    # determinism: a rerun yields the identical membership
    again = {r["doc_id"]: r["split"]
             for r in CATALOG["t26_eval_split"].build(spark, SF01).collect()}
    for split, ids in by.items():
        assert all(again[i] == split for i in ids)
    rep = CATALOG["t26_eval_split_report"].build(spark, SF01).collect()
    for r in rep:
        if r["split"] == "train":
            # no source sheared: every source keeps a training majority
            assert r["share_of_source"] >= 0.5, (r["source"], r)


def test_backoff_heldout_scores_odd_half(spark):
    rows = CATALOG["ta_backoff_heldout"].build(spark, SF01).collect()
    assert rows
    assert all(r["doc_id"] % 2 == 1 for r in rows)
    assert all(r["bo_logscore"] < 0 for r in rows)
    assert all(0 <= r["n_backoff"] <= r["n_bigrams"] for r in rows)
    # held-out scoring must actually exercise the backoff branch
    assert sum(r["n_backoff"] for r in rows) > 0
    # and seen bigrams must dominate unseen on a same-distribution
    # held-out half (sanity that the LM learned something)
    tot_b = sum(r["n_bigrams"] for r in rows)
    tot_u = sum(r["n_backoff"] for r in rows)
    assert tot_u < 0.8 * tot_b


def test_weighted_sample_biases_toward_quality(spark):
    from pyspark.sql import functions as SF
    sample = CATALOG["t27_weighted_sample"].build(spark, SF01)
    rows = sample.collect()
    assert len(rows) == 100
    # keys are sorted descending with doc_id tiebreak
    keys = [(r["key_s"], -r["doc_id"]) for r in rows]
    assert keys == sorted(keys, reverse=True)
    mean_sample = sum(r["w"] for r in rows) / len(rows)
    docs = spark.read.parquet(f"{SF01}/documents.parquet")
    from production_grade_rag_spark.functions import text as X
    mean_corpus = (docs.select(
        (SF.round(X.quality_components(SF.col("text"))["quality_score"], 6)
         + SF.lit(0.001)).alias("w")).agg(SF.avg("w")).first()[0])
    # weighted-without-replacement must overrepresent quality
    assert mean_sample > mean_corpus * 1.05, (mean_sample, mean_corpus)


def test_label_prop_chance_on_uncorrelated_labels(spark):
    # sf0.01 labels are independent of embedding geometry, so the
    # honest expectation is full coverage at ~chance accuracy (10
    # labels): the operator must not fabricate signal
    row = CATALOG["g5_label_prop_report"].build(spark, SF01).collect()[0]
    assert row["coverage"] == 1.0
    assert 0.02 <= row["accuracy"] <= 0.25


def test_label_prop_recovers_clustered_labels(spark, tmp_path):
    import numpy as np
    # two well-separated clusters with label == cluster: propagation
    # from the even-id seeds must label the odd half near-perfectly
    rng = np.random.RandomState(11)
    rows = []
    for i in range(200):
        c = (i // 2) % 2   # both parities appear in both clusters
        base = np.zeros(8)
        base[c * 4] = 1.0  # clusters live on orthogonal axes
        v = base + rng.normal(0, 0.05, 8)
        rows.append((i, [float(x) for x in v], int(c)))
    (spark.createDataFrame(
        rows, "vec_id: long, embedding: array<float>, label: int")
     .write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet"))
    rep = CATALOG["g5_label_prop_report"].build(spark, str(tmp_path)) \
        .collect()[0]
    assert rep["coverage"] == 1.0
    assert rep["accuracy"] >= 0.98, rep
    preds = CATALOG["g5_label_prop"].build(spark, str(tmp_path)).collect()
    assert all(p["label_pred"] in (0, 1) for p in preds)


def test_icp_pack_adjacency_beats_hash_baseline(spark):
    rows = {r["packing"]: r for r in
            CATALOG["t28_icp_adjacency"].build(spark, SF01).collect()}
    assert set(rows) == {"icp", "hash"}
    # ICP co-packs same-cluster docs by construction
    assert rows["icp"]["same_cluster_rate"] == 1.0
    # hash sharding lands near sum_c share_c^2 (~0.25 for 4 balanced
    # clusters) — far below the ICP order
    assert 0.1 <= rows["hash"]["same_cluster_rate"] <= 0.5
    # pack manifest covers the corpus exactly once with sane intervals
    pack = CATALOG["t28_icp_pack"].build(spark, SF01).collect()
    assert len(pack) == 500
    assert len({r["doc_id"] for r in pack}) == 500
    assert all(0 <= r["seq_start"] <= r["seq_end"] for r in pack)


def test_pca_rank2_near_orthogonal(spark):
    import numpy as np
    rows = CATALOG["g4_pca_power2"].build(spark, SF01).collect()
    v1 = np.array([r["v1_q"] for r in rows], dtype=float)
    v2 = np.array([r["v2_q"] for r in rows], dtype=float)
    cos = abs(v1 @ v2) / (np.linalg.norm(v1) * np.linalg.norm(v2))
    # exact orthogonality is impossible on the integer grid; the
    # deflation residual is < 1 grid unit per coordinate
    assert cos < 0.1, cos


def test_pca_rank2_recovers_two_planted_directions(spark, tmp_path):
    import numpy as np
    rng = np.random.RandomState(5)
    X = rng.normal(0, 0.01, size=(400, 16))
    X[:, 3] += rng.normal(0, 0.2, size=400)   # dominant direction
    X[:, 7] += rng.normal(0, 0.1, size=400)   # second direction
    rows = [(int(i), [float(x) for x in X[i]]) for i in range(400)]
    (spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")
     .write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet"))
    out = CATALOG["g4_pca_power2"].build(spark, str(tmp_path)).collect()
    v1 = np.array([r["v1_q"] for r in out], dtype=float)
    v2 = np.array([r["v2_q"] for r in out], dtype=float)
    assert abs(v1[3]) / np.linalg.norm(v1) > 0.99
    assert abs(v2[7]) / np.linalg.norm(v2) > 0.99


def test_split_leakage_counts_exact_content_dups(spark):
    row = CATALOG["t26_split_leakage"].build(spark, SF01).collect()[0]
    assert row["n_test"] > 0
    assert 0 <= row["n_leaked"] <= row["n_test"]
    assert abs(row["leak_rate"] - row["n_leaked"] / row["n_test"]) < 1e-5
    # cross-check against dd_exact: leakage requires duplicate content
    dups = CATALOG["dd_exact"].build(spark, SF01) \
        .filter(F.col("is_duplicate")).count()
    if dups == 0:
        assert row["n_leaked"] == 0


def test_alpha_dcg_bounds_and_subtopics(spark):
    import math
    rows = CATALOG["ir4_diversity_eval"].build(spark, SF01).collect()
    assert len(rows) == 10
    W = [round(1_000_000 / math.log2(r + 1)) for r in range(1, 11)]
    upper = sum(1024 * w for w in W)              # all-novel run
    lower = sum(2 ** (10 - min(r, 10)) * W[r] for r in range(10))
    for r in rows:
        assert 1 <= r["n_subtopics_10"] <= 10
        assert lower <= r["alpha_dcg_s"] <= upper
    # at least one query's run is not fully homogeneous
    assert any(r["n_subtopics_10"] > 1 for r in rows)


def test_growth_accounting_explains_actives_delta(spark):
    rows = {r["week"]: r for r in
            CATALOG["ev_growth_accounting"].build(spark, SF01).collect()}
    ev = spark.read.parquet(f"{SF01}/events.parquet")
    actives = {r["wk"]: r["n"] for r in ev.select(
        F.expr("CAST(unix_timestamp(ts) AS BIGINT) div 604800").alias("wk"),
        "user_id").distinct().groupBy("wk")
        .agg(F.count("*").alias("n")).collect()}
    weeks = sorted(actives)
    for w0, w1 in zip(weeks, weeks[1:]):
        if w1 != w0 + 1:
            continue
        r = rows[w1]
        delta = actives[w1] - actives[w0]
        assert delta == (r["n_new"] + r["n_resurrected"]
                         - r["n_churned"]), (w1, delta, r)
        # retained + new + resurrected = this week's actives
        assert (r["n_new"] + r["n_retained"]
                + r["n_resurrected"]) == actives[w1]


def test_facility_location_monotone_submodular(spark):
    rows = CATALOG["w11_facility_location"].build(spark, SF01).collect()
    assert [r["step"] for r in rows] == [1, 2, 3, 4]
    assert len({r["doc_id"] for r in rows}) == 4
    obj = [r["objective"] for r in rows]
    # coverage objective is monotone nondecreasing...
    assert all(b >= a for a, b in zip(obj, obj[1:]))
    # ...and marginal gains shrink (submodularity of coverage);
    # the empty-set objective is the 20-member pool at the -2e6 floor
    gains = [obj[0] - 20 * -2_000_000] + \
        [b - a for a, b in zip(obj, obj[1:])]
    assert all(g2 <= g1 for g1, g2 in zip(gains, gains[1:])), gains


def test_heaps_curve_monotone_concave_vocab(spark):
    rows = CATALOG["ta_heaps_curve"].build(spark, SF01).collect()
    assert [r["n_docs"] for r in rows] == [50, 100, 200, 300, 400, 500]
    vs = [r["vocab_size"] for r in rows]
    ts = [r["n_tokens"] for r in rows]
    assert all(b >= a for a, b in zip(vs, vs[1:]))
    assert all(b > a for a, b in zip(ts, ts[1:]))
    # sub-linear growth: vocab per token falls as the corpus grows
    assert vs[-1] / ts[-1] < vs[0] / ts[0]


def test_mix_tuning_sweep_shape(spark, tmp_path):
    rows = CATALOG["t29_mix_tuning"].build(spark, SF01).collect()
    assert [r["alpha"] for r in rows] == [0.0, 0.25, 0.5, 0.75, 1.0]
    assert sum(r["is_best"] for r in rows) == 1
    # alpha=1 keeps everything; lower alphas keep monotonically less
    kept = [r["n_kept"] for r in rows]
    assert all(a <= b for a, b in zip(kept, kept[1:]))
    # on the skewed 400/90/10 corpus, equalizing (alpha=0) must be
    # closest to the uniform target and raw (alpha=1) farthest
    sizes = {"web": 400, "wiki": 90, "code": 10}
    data = []
    i = 0
    for src, n in sizes.items():
        for _ in range(n):
            data.append((i, src))
            i += 1
    (spark.createDataFrame(data, ["doc_id", "source"])
     .write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet"))
    sk = {r["alpha"]: r for r in
          CATALOG["t29_mix_tuning"].build(spark, str(tmp_path)).collect()}
    assert sk[0.0]["l1_to_uniform"] <= sk[0.5]["l1_to_uniform"]
    assert sk[0.5]["l1_to_uniform"] <= sk[1.0]["l1_to_uniform"]
    assert sk[0.0]["is_best"]


def test_power_iters_gram_expr_parse(spark):
    # r16: the Gram cells are handed to the SQL parser as one string
    # each (plan-construction cost — guide §1.2 step 2 applied to the
    # driver); this pins the parsed expression equal, cell by cell, to
    # the chained-Column form it replaced.
    from production_grade_rag_spark.plans.catalog_r8b import (
        _PCA_D, _pca_centered)
    c = _pca_centered(spark, SF01)
    D = _PCA_D
    cells = [(i, j) for i in range(D) for j in range(i, D)]
    parsed = c.agg(*[
        F.expr(f"cast(sum(element_at(cv, {i + 1}) * element_at(cv, "
               f"{j + 1})) as long) as g_{i}_{j}")
        for i, j in cells]).first()
    chained = c.agg(*[
        F.sum(F.element_at("cv", i + 1) * F.element_at("cv", j + 1))
        .cast("long").alias(f"g_{i}_{j}")
        for i, j in cells]).first()
    assert all(parsed[f"g_{i}_{j}"] == chained[f"g_{i}_{j}"]
               for i, j in cells)
