"""Round-14 catalog additions (appended LAST — the first-50
registration window is load-bearing, see plans/catalog.py).

- ``dd_band_plan``: the MinHash-LSH operating-point planner (VERDICT
  r13 #7) — the standard S-curve 1-(1-j^r)^b evaluated over every
  divisor banding of the repo's two documented signature widths, with
  the minimum-band point meeting the recall policy flagged.  The
  analytic prior beside dd_minhash_pr's measured posterior.
- ``st_release_audit``: the streaming twin of cc_release_audit
  (VERDICT r13 #3) — every monitor on the 7-row card has a mergeable
  state (addition semilattices for the grouped sums / drift moments /
  day rates, set union for the stratum band index), so the card a
  never-ending crawl publishes drains from incrementally-maintained
  stores; drained card == batch card through the batch entry's own
  oracle.

Reference parity: the reference has neither operator (its dedup is
Mongo-side exact-id upserts; it publishes no audit surface) — both
are SURVEY §2.12-style beyond-reference curation surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import _t, register

# ===========================================================================
# MinHash-LSH band planner: the S-curve as a value-oracled card
# (Leskovec-Rajaraman-Ullman, Mining of Massive Datasets ch. 3 —
# public; collision probability of OR-banding at b bands of r rows is
# 1 - (1 - j^r)^b).
# ===========================================================================

# the two documented signature widths (operators/dedup.py: 16/4 is the
# catalog default, 128/32 the production width) and the policy the
# recommendation gates on (the release-audit recall floor)
_BP_WIDTHS = (16, 128)
_BP_THR = 0.8          # the verify threshold the operator runs at
_BP_FP_J = 0.5         # "clearly below threshold" point for the FP read
_BP_RECALL_MIN = 0.9   # _AUDIT_MH_RECALL_MIN, shared literal


def _bp_grid() -> list[tuple[int, int, int]]:
    """(num_hashes, num_bands, rows_per_band) for every divisor
    banding of each documented width — deterministic integer math,
    computed identically on both engines (the Spark side ships the
    grid as literals; the oracle re-derives it with a range filter)."""
    out = []
    for h in _BP_WIDTHS:
        for b in range(1, h + 1):
            if h % b == 0:
                out.append((h, b, h // b))
    return out


def _bp_oracle() -> str:
    rows = " UNION ALL ".join(
        f"SELECT {h}::BIGINT AS num_hashes, {b}::BIGINT AS num_bands, "
        f"{r}::BIGINT AS rows_per_band"
        for h, b, r in _bp_grid())
    curve = ("round(1.0 - power(1.0 - power({j}, rows_per_band::DOUBLE), "
             "num_bands::DOUBLE), 6)")
    return f"""
WITH grid AS ({rows}),
curved AS (
  SELECT num_hashes, num_bands, rows_per_band,
         {curve.format(j=_BP_THR)} AS recall_at_thr,
         {curve.format(j=_BP_FP_J)} AS fp_at_low
  FROM grid
), rec AS (
  SELECT num_hashes,
         min(CASE WHEN recall_at_thr >= {_BP_RECALL_MIN}
                  THEN num_bands END) AS rec_b
  FROM curved GROUP BY num_hashes
)
SELECT c.num_hashes, c.num_bands, c.rows_per_band, c.recall_at_thr,
       c.fp_at_low, c.num_bands = r.rec_b AS recommended
FROM curved c JOIN rec r USING (num_hashes)
ORDER BY c.num_hashes, c.num_bands
"""


@register("dd_band_plan", oracle=_bp_oracle())
def dd_band_plan(spark: SparkSession, d: str) -> DataFrame:
    """MinHash-LSH operating-point planner (VERDICT r13 #7): the
    standard OR-banding S-curve P(candidate | jaccard=j) =
    1 - (1 - j^r)^b (Leskovec-Rajaraman-Ullman ch. 3, public)
    evaluated at the operator's verify threshold (0.8) and at a
    clearly-below-threshold point (0.5, the false-positive read), for
    EVERY divisor banding of the repo's two documented signature
    widths (16 = the catalog default, 128 = the production width).
    ``recommended`` flags the MINIMUM band count whose analytic
    recall clears the release-audit floor (0.9) — fewest bands =
    fewest candidate pairs, so the flagged row is the cheapest
    operating point the policy admits.  Pure deterministic
    double-precision math on both engines — fully value-oracled.

    What the card says about the shipped defaults: the catalog's
    16/4 point (r=4) has analytic recall 0.8785 at j=0.8 — BELOW the
    0.9 policy line (its measured recall on this corpus is 1.0;
    dd_minhash_pr / dd_minhash_pr_sampled publish the measured
    posterior beside this prior, and their docstrings cite this
    card), while 16/8 (r=2) clears at 0.9997 at ~3.9x the analytic
    FP rate; the production 128/32 point (r=4) reads recall
    1.000000 (1-(1-0.8^4)^32 ~= 1-4.8e-8) — comfortably above
    policy — at fp_at_low 0.873211, i.e. at j=0.5 most pairs still
    become candidates and the exact-Jaccard verify is what buys
    precision at that width (VERDICT r14 #1: this card's own output
    row, restated).  Since round 15 the recommendation is CONSUMED:
    operators.dedup.recommended_bands replays this S-curve and
    minhash_dedup_pairs(num_bands=None) resolves to the flagged
    minimum-band point (dd_minhash_planned value-oracles that
    path).

    Scale shape: corpus-free integer/double arithmetic over a ~20-row
    literal grid — the planning read costs nothing at any scale; the
    expensive number (measured recall) is the bounded-stratum
    estimator's job."""
    _ = (spark, d)   # corpus-free planning card (driver signature)
    grid = spark.createDataFrame(
        _bp_grid(), "num_hashes long, num_bands long, rows_per_band long")

    def curve(j: float):
        return F.round(
            F.lit(1.0) - F.pow(
                F.lit(1.0) - F.pow(F.lit(j),
                                   F.col("rows_per_band").cast("double")),
                F.col("num_bands").cast("double")), 6)

    curved = grid.select(
        "num_hashes", "num_bands", "rows_per_band",
        curve(_BP_THR).alias("recall_at_thr"),
        curve(_BP_FP_J).alias("fp_at_low"))
    rec = (curved.filter(F.col("recall_at_thr") >= _BP_RECALL_MIN)
           .groupBy("num_hashes")
           .agg(F.min("num_bands").alias("rec_b")))
    return (curved.join(F.broadcast(rec), "num_hashes")
            .select("num_hashes", "num_bands", "rows_per_band",
                    "recall_at_thr", "fp_at_low",
                    (F.col("num_bands") == F.col("rec_b"))
                    .alias("recommended"))
            .orderBy("num_hashes", "num_bands"))


# ===========================================================================
# OPQ-rotated IVFPQ recall gate (VERDICT r13 #4): the rotation is a
# store OPTION (pq.ivfpq_build_store(rotate=True)); this entry
# certifies the rotated store end to end at the catalog operating
# point, beside the unrotated r4_ivfpq_recall gate.
# ===========================================================================

@register("r4_ivfpq_opq_recall", oracle="""
SELECT 10::BIGINT AS n_exact, TRUE AS floor_met
""")
def r4_ivfpq_opq_recall(spark: SparkSession, d: str) -> DataFrame:
    """Recall gate for the OPQ-ROTATED composed IVFPQ store (VERDICT
    r13 #4, Ge et al. 2013): build with rotate=True (residuals
    encoded in the learned orthogonal frame, rotation persisted
    beside the codebooks, query lut rotated at search), search at the
    same (8 lists, probe 4) operating point as r4_ivfpq_recall, gate
    recall vs exact top-k at the same 0.5 floor (probing is the
    binding miss source on this corpus; MEASURED 0.9 at sf0.01 —
    equal to the unrotated gate, as expected where the per-dim-
    independent geometry leaves no covariance for the rotation to
    reclaim; the 2.1x ADC-error win on correlated-spectrum geometry
    is ledgered in STRESS_r14).  Proves the rotation path end to end:
    train, persist, encode, rotated-lut search, exact rescore."""
    from ..operators import pq, similarity
    from .catalog_more import _recall_summary, _scratch
    from .catalog_r6 import QUERY_VEC
    emb = _t(spark, d, "embeddings")
    path = _scratch("ivfpq_opq_recall")
    pq.ivfpq_build_store(emb, path, n_lists=8, m=8, k_codes=32,
                         rotate=True)
    exact = similarity.knn_topk(emb, QUERY_VEC, k=10)
    approx = pq.ivfpq_search_store(spark, path, QUERY_VEC, k=10,
                                   n_probe=4)
    return _recall_summary(exact, approx, ["vec_id"], floor=0.5)


# ===========================================================================
# Engine-level derived-ANN gate: the facade consumes the measured
# geometry too (VERDICT r13 #2 extended past the graph store).
# ===========================================================================

@register("eng_ann_derived_recall", oracle="""
SELECT 10::BIGINT AS n_exact, TRUE AS floor_met
""")
def eng_ann_derived_recall(spark: SparkSession, d: str) -> DataFrame:
    """Engine-level gate for the DERIVED ANN operating point:
    EngineConfig(ann_backend='ivf', ann_n_lists=None,
    ann_n_probe=None) makes the facade derive both knobs from the
    indexed corpus at dispatch — ~sqrt(n) lists, probe fraction from
    the MEASURED anisotropy (the knn_graph derivation the graph-store
    builds already certify) — and the same search call must keep
    recall >= 0.5 vs the exact backend (eng_ann_recall's floor at its
    explicit (8, 4) point; on this corpus the derivation resolves to
    (16, 8), measured recall 1.0 at sf0.01).  Proves a user can say
    'ivf, figure out the knobs' and get a certified default."""
    from ..config import EngineConfig
    from ..engine import SparkRagEngine
    from .catalog_more import _recall_summary
    emb = _t(spark, d, "embeddings")
    exact = SparkRagEngine(spark).search(
        emb, query_vector=_qv(), limit=10, id_col="vec_id")
    approx = SparkRagEngine(spark, EngineConfig(
        ann_backend="ivf", ann_n_lists=None, ann_n_probe=None)).search(
        emb, query_vector=_qv(), limit=10, id_col="vec_id")
    return _recall_summary(exact, approx, ["vec_id"], floor=0.5)


def _qv() -> list:
    from .oracle_vec import QUERY_VEC
    return QUERY_VEC


# ===========================================================================
# Streaming release audit (VERDICT r13 #3): the 7-row card maintained
# through checkpointed out-of-order tranches — the release card a
# never-ending crawl actually publishes.
# ===========================================================================

def _sra_oracle() -> str:
    from .catalog_r11 import _audit_oracle
    return _audit_oracle()


# ---------------------------------------------------------------------------
# Epoch-idempotent versioned store writes (ADVICE r14): the snapshot
# version IS epoch_id + 1, so a micro-batch replayed after a crash
# between the store writes and the checkpoint commit cannot fold its
# delta twice — module-level so tests/test_catalog_r15.py can exercise
# the replay semantics directly.
# ---------------------------------------------------------------------------

def epoch_write(df: DataFrame, store: str, epoch_id: int) -> None:
    """Write ``df`` as the store snapshot for this epoch — version
    epoch_id + 1.  A snapshot that already COMMITTED (_SUCCESS
    present) is skipped: the fold is deterministic per epoch (the
    checkpointed source replays the same batch), so the existing
    snapshot IS this write.  A torn directory (no _SUCCESS) is
    rewritten in place."""
    import os

    from ..sources.tables import write_version
    ver = int(epoch_id) + 1
    if os.path.exists(f"{store}/v={ver}/_SUCCESS"):
        return
    write_version(df, store, ver)


def epoch_prior(sp: SparkSession, store: str,
                epoch_id: int) -> DataFrame | None:
    """The store snapshot AS-OF the previous epoch (version <=
    epoch_id), or None before the first fold — so a partially-applied
    replay merges every store against the RIGHT base independently of
    which sibling stores already committed this epoch."""
    import os

    from ..sources.tables import list_versions, read_version
    if not (os.path.exists(store) and list_versions(sp, store)):
        return None
    try:
        return read_version(sp, store, as_of=int(epoch_id))
    except ValueError:   # no snapshot at or before this epoch
        return None


@register("st_release_audit", oracle=_sra_oracle)
def st_release_audit(spark: SparkSession, d: str) -> DataFrame:
    """STREAMING release audit (VERDICT r13 #3): every monitor on the
    7-row cc_release_audit card has a mergeable state, so the card
    drains from incrementally-maintained stores instead of ever
    re-scanning the resident corpus.  Documents, vectors and events
    arrive MULTIPLEXED through one paged-dump stream (one ingest
    pipeline, one checkpoint — the production shape) in two
    checkpointed out-of-order tranches (even ids, then odd), and each
    micro-batch folds its delta into six stores:

    - qi store (dq8 risk + t44 correlation): per-(source, lang,
      len_bucket) integer sums — PURE ADDITION (audit_doc_groups is
      distributive; the nonlinear k-anonymity cutoff runs at drain on
      the fully-merged groups, audit_risk_corr).
    - manifest store (t43): (doc_id, bucket, source) — SET UNION; the
      curriculum position is a pure function of the drained set (the
      w12 formula, value-oracled against the two-phase rank), so the
      adjacency read runs the batch tail (t43_clump_base) at drain.
    - dq9 store: per-(side, dim) moment sums — ADDITION (the
      st_drift_monitor state, identical arithmetic).
    - day store (dq10): per-day (n_events, n_errors) — ADDITION; the
      EWMA closed form (dq10_chart_from_days) runs off the drained
      day table exactly as the batch entry's 100 TB paragraph says.
    - m5 pair state: the anisotropy chain pair (i, i+1) completes
      when its SECOND endpoint arrives — per batch, new pairs join
      the batch against the open FRONTIER (vectors with an unseen
      neighbor), their 1e-6-quantized cosines fold into a 1-row
      (n_pairs, s_cos) sum by addition, and the frontier prunes every
      vector both of whose neighbors are now seen.  Under id-ordered
      arrival the frontier is O(1); the even/odd tranche split is the
      adversarial order (every pair spans the tranches) and the state
      peaks at half the corpus — a property of the test ordering, not
      the design.  Vectors travel as JSON float arrays (bit-exact
      roundtrip, asserted by stream==batch equality through the
      oracle).
    - stratum registry (minhash recall): (doc_id, text) for docs in
      the md5 stratum at the CURRENT derived modulus, plus a 1-row
      corpus count.  Power-of-two strata are NESTED (m | 2m), so when
      the count crosses a power-of-two boundary the registry PRUNES
      by re-filtering at the larger modulus — bounded ~2k docs
      forever; at drain the P/R tail (pr_counts_from) runs over the
      registry at the final modulus.

    The drained card is assembled by the SAME audit_card_assemble /
    policy constants the batch card compiles, and this entry's oracle
    IS cc_release_audit's — drained == batch, value-oracled row for
    row (and pinned against the batch entry in
    tests/test_catalog_r14.py).  Checkpoint resume: the second
    tranche drains against the same checkpoint directory.

    Scale shape: per-batch work is batch-sized (quality scoring +
    grouped partial sums + bounded joins against narrow stores);
    steady state is QI-groups + manifest ids + 2d moments + calendar
    days + the chain frontier + a ~2k-doc stratum — none corpus-sized
    except the narrow manifest id table the batch t43 also keeps."""
    import shutil
    from pathlib import Path

    from ..functions import text as X
    from ..functions.vector import to_double_array
    from ..operators.dedup import md5_int32
    from ..sources.paged_source import PagedDumpDataSource
    from ..sources.tables import read_version
    from ..streaming import pipeline as SP
    from .catalog import _t
    from .catalog_more import _scratch
    from .catalog_r10 import t43_clump_base
    from .catalog_r11 import (audit_card_assemble, audit_risk_corr,
                              audit_stratum_mod, pr_counts_from)
    from .catalog_r11 import audit_doc_groups
    from .catalog_r12 import _dq9_card, _dq9_moments, dq10_chart_from_days

    docs = _t(spark, d, "documents")
    emb = _t(spark, d, "embeddings")
    ev = _t(spark, d, "events")

    dump = _scratch("st_audit_dump")
    ckpt = _scratch("st_audit_ckpt")
    S = {k: _scratch(f"st_audit_{k}") for k in
         ("qi", "man", "dq9", "day", "m5pair", "m5front", "m5seen",
          "mhreg", "mhcnt")}
    for p in (dump, ckpt, *S.values()):
        shutil.rmtree(p, ignore_errors=True)

    def page_rows(parity: int) -> DataFrame:
        pd_ = docs.filter(F.col("doc_id") % 2 == parity).select(
            F.to_json(F.struct(
                F.col("doc_id").cast("string").alias("page_id"),
                F.to_json(F.struct(
                    "text", "source",
                    F.col("lang").alias("doc_lang"), "n_chars"))
                .alias("title"),
                F.lit("doc").alias("lang"),
                F.col("n_chars").cast("long").alias("n_chars")))
            .alias("value"))
        pv = emb.filter(F.col("vec_id") % 2 == parity).select(
            F.to_json(F.struct(
                F.col("vec_id").cast("string").alias("page_id"),
                F.to_json(F.col("embedding")).alias("title"),
                F.lit("vec").alias("lang"),
                F.lit(0).cast("long").alias("n_chars"))).alias("value"))
        pe = ev.filter(F.col("event_id") % 2 == parity).select(
            F.to_json(F.struct(
                F.col("event_id").cast("string").alias("page_id"),
                F.to_json(F.struct(
                    F.expr("CAST(unix_timestamp(ts) AS BIGINT) div 86400")
                    .alias("dd"),
                    (F.col("event_type") == "error").alias("err")))
                .alias("title"),
                F.lit("ev").alias("lang"),
                F.lit(0).cast("long").alias("n_chars"))).alias("value"))
        return pd_.unionByName(pv).unionByName(pe)

    page_rows(0).repartition(2).write.text(dump)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(PagedDumpDataSource)

    def merge(batch_df: DataFrame, epoch_id: int) -> None:
        sp = batch_df.sparkSession
        good = batch_df.filter(~F.col("malformed")).localCheckpoint()
        # IDEMPOTENT versioned writes (ADVICE r14): see epoch_write /
        # epoch_prior above — replays skip committed snapshots, priors
        # read as-of the previous epoch.
        def write(df, store):
            epoch_write(df, store, epoch_id)

        def prior(store):
            return epoch_prior(sp, store, epoch_id)

        # ---- documents ----
        bd = (good.filter(F.col("lang") == "doc")
              .select(F.col("page_id").cast("long").alias("doc_id"),
                      F.from_json("title", "text string, source string,"
                                  " doc_lang string, n_chars bigint")
                      .alias("r"))
              .select("doc_id", F.col("r.text").alias("text"),
                      F.col("r.source").alias("source"),
                      F.col("r.doc_lang").alias("lang"),
                      F.col("r.n_chars").alias("n_chars"))
              .localCheckpoint())
        inc = audit_doc_groups(bd)
        p = prior(S["qi"])
        cols = ("n", "sx", "sy", "sxy", "sxx", "syy")
        merged = inc if p is None else (
            p.unionByName(inc).groupBy("source", "lang", "len_bucket")
            .agg(*[F.sum(c).cast("long").alias(c) for c in cols]))
        write(merged, S["qi"])
        minc = (X.with_quality(bd.select("doc_id", "text"))
                .select("doc_id",
                        F.least(F.lit(9),
                                F.floor(F.round(F.col("quality_score"), 6)
                                        * 10).cast("long")).alias("bucket"))
                .join(bd.select("doc_id", "source"), "doc_id"))
        p = prior(S["man"])
        man = minc if p is None else \
            p.unionByName(minc).dropDuplicates(["doc_id"])
        write(man, S["man"])
        p = prior(S["mhcnt"])
        n_prev = p.collect()[0]["n_total"] if p is not None else 0
        n_total = n_prev + bd.count()
        write(sp.createDataFrame([(n_total,)], "n_total long"),
              S["mhcnt"])
        mod = audit_stratum_mod(n_total)
        in_strat = (F.pmod(
            md5_int32(F.concat(F.lit("pr:"),
                               F.col("doc_id").cast("string"))),
            F.lit(mod)) == 0)
        reg_inc = bd.select("doc_id", "text").filter(in_strat)
        p = prior(S["mhreg"])
        reg = reg_inc if p is None else (
            p.unionByName(reg_inc).dropDuplicates(["doc_id"])
            .filter(in_strat))   # nested strata: prune as mod grows
        write(reg, S["mhreg"])

        # ---- vectors ----
        bv = (good.filter(F.col("lang") == "vec")
              .select(F.col("page_id").cast("long").alias("vec_id"),
                      F.from_json("title", "array<float>")
                      .alias("embedding"))
              .localCheckpoint())
        dinc = _dq9_moments(bv)
        p = prior(S["dq9"])
        dmer = dinc if p is None else (
            p.unionByName(dinc).groupBy("side", "dim")
            .agg(F.sum("n").cast("long").alias("n"),
                 F.sum("s1").cast("long").alias("s1"),
                 F.sum("s2").cast("long").alias("s2")))
        write(dmer, S["dq9"])
        front = prior(S["m5front"])
        avail = bv if front is None else \
            front.unionByName(bv).dropDuplicates(["vec_id"])
        avail = avail.localCheckpoint()
        bids = bv.select("vec_id")
        a = avail.select(F.col("vec_id").alias("ia"),
                         to_double_array(F.col("embedding")).alias("va"))
        b = avail.select((F.col("vec_id") - 1).alias("ia"),
                         to_double_array(F.col("embedding")).alias("vb"))
        dot = F.aggregate(F.zip_with("va", "vb", lambda x, y: x * y),
                          F.lit(0.0), lambda acc, x: acc + x)
        na = F.sqrt(F.aggregate("va", F.lit(0.0),
                                lambda acc, x: acc + x * x))
        nb = F.sqrt(F.aggregate("vb", F.lit(0.0),
                                lambda acc, x: acc + x * x))
        pairs = (a.join(b, "ia")
                 .join(bids.select(F.col("vec_id").alias("ia"))
                       .withColumn("__na", F.lit(True)), "ia", "left")
                 .join(bids.select((F.col("vec_id") - 1).alias("ia"))
                       .withColumn("__nb", F.lit(True)), "ia", "left")
                 .filter(F.coalesce("__na", F.lit(False))
                         | F.coalesce("__nb", F.lit(False)))
                 .select(F.round(dot / na / nb * 1000000).cast("long")
                         .alias("cos_q")))
        pinc = pairs.agg(F.count("*").cast("long").alias("n_pairs"),
                         F.coalesce(F.sum("cos_q"), F.lit(0))
                         .cast("long").alias("s_cos"))
        p = prior(S["m5pair"])
        pmer = pinc if p is None else (
            p.unionByName(pinc)
            .agg(F.sum("n_pairs").cast("long").alias("n_pairs"),
                 F.sum("s_cos").cast("long").alias("s_cos")))
        write(pmer, S["m5pair"])
        p = prior(S["m5seen"])
        seen = bids if p is None else \
            p.unionByName(bids).distinct()
        seen = seen.localCheckpoint()
        write(seen, S["m5seen"])
        ls = seen.select((F.col("vec_id") + 1).alias("vec_id"),
                         F.lit(True).alias("__ls"))
        rs = seen.select((F.col("vec_id") - 1).alias("vec_id"),
                         F.lit(True).alias("__rs"))
        fnew = (avail.join(ls, "vec_id", "left")
                .join(rs, "vec_id", "left")
                .filter(~(F.coalesce("__ls", F.lit(False))
                          & F.coalesce("__rs", F.lit(False))))
                .select("vec_id", "embedding"))
        write(fnew, S["m5front"])

        # ---- events ----
        be = (good.filter(F.col("lang") == "ev")
              .select(F.from_json("title", "dd bigint, err boolean")
                      .alias("r"))
              .select(F.col("r.dd").alias("d"), F.col("r.err").alias("err")))
        einc = be.groupBy("d").agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(F.col("err").cast("int")).cast("long")
            .alias("n_errors"))
        p = prior(S["day"])
        emer = einc if p is None else (
            p.unionByName(einc).groupBy("d")
            .agg(F.sum("n_events").cast("long").alias("n_events"),
                 F.sum("n_errors").cast("long").alias("n_errors")))
        write(emer, S["day"])

    def drain() -> None:
        stream = (spark.readStream.format("paged_dump")
                  .option("path", dump).load())
        SP._run_foreach(stream, merge, 240, ckpt)

    drain()
    tmp2 = dump + "_t2"
    shutil.rmtree(tmp2, ignore_errors=True)
    page_rows(1).repartition(2).write.text(tmp2)
    for i, f in enumerate(sorted(Path(tmp2).glob("part-*"))):
        f.rename(Path(dump) / f"part-zz-{i:05d}.txt")
    drain()

    # ---- drained card: the batch tails over the stores ----
    from pyspark.sql import Window as W
    both = audit_risk_corr(read_version(spark, S["qi"]))
    pr = read_version(spark, S["m5pair"])
    m5f = pr.select(F.round(F.col("s_cos").cast("double")
                            / F.col("n_pairs").cast("double")
                            / 1000000, 6).alias("anisotropy"))
    man = read_version(spark, S["man"])
    pos = ((F.row_number().over(W.partitionBy("bucket")
                                .orderBy("doc_id")) - 1) * 10
           + F.col("bucket"))
    rates = (t43_clump_base(man.withColumn("curriculum_pos", pos))
             .agg(F.max(F.when(F.col("ordering") == "curriculum",
                               F.col("same_bucket_rate")))
                  .alias("cur_rate"),
                  F.max(F.when(F.col("ordering") == "doc_id",
                               F.col("same_bucket_rate")))
                  .alias("nat_rate")))
    drift = (_dq9_card(read_version(spark, S["dq9"]))
             .select(F.col("centroid_l2").alias("drift_l2"),
                     F.col("var_ratio").alias("drift_vr")))
    ew = (dq10_chart_from_days(spark, read_version(spark, S["day"]))
          .agg(F.max_by("ewma", "day").alias("ewma_last"),
               F.bool_or("ooc").alias("any_ooc")))
    n_total = read_version(spark, S["mhcnt"]).collect()[0]["n_total"]
    mod = audit_stratum_mod(n_total)
    strat = (read_version(spark, S["mhreg"])
             .filter(F.pmod(
                 md5_int32(F.concat(F.lit("pr:"),
                                    F.col("doc_id").cast("string"))),
                 F.lit(mod)) == 0)
             .select("doc_id", "text").localCheckpoint())
    mh = (pr_counts_from(strat)
          .select(F.round(F.col("n_true_pos").cast("double")
                          / F.greatest("n_exact", F.lit(1))
                          .cast("double"), 6).alias("mh_recall"),
                  F.col("n_exact").alias("mh_nex")))
    return audit_card_assemble(both, m5f, rates, drift, ew, mh)
