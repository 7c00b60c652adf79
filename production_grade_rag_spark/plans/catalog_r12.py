"""Round-12 catalog entries.

VERDICT r11 task list: the precision/recall scoreboard for the
incremental dedup's shared-bucket filter (dd_minhash_delta_pr,
VERDICT #1 — the lever that cuts the verify bill, measured not
argued), the streaming MinHash band-index ingest (st_minhash_ingest,
VERDICT #3 — the last stored index without a checkpointed streaming
twin), the composed ingest capstone (cc_ingest_delta, VERDICT #4 —
gates + bloom + exact anti-join + near-dup-vs-index + versioned
commit as ONE ledger), the gated approx equi-depth histogram
(a29_equidepth_approx, VERDICT #5 — the one remaining docstring-only
approx knob compiled), and scene-granular multimodal dedup
(mm_scene_dedup, VERDICT #7).  VERDICT #2 (IVF build linearity
sweep), #6 (bench noise calibration) and #8 (theta state ledger) are
scripts/stress_bench.py / bench.py work.

Registered after catalog_r11 so the driver's existing correctness
window is unchanged (REGISTRATION ORDER IS LOAD-BEARING — see
plans/catalog.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import _t, register


# ===========================================================================
# MinHash delta P/R scoreboard — the shared-bucket (min_band_overlap)
# precision lever measured against the exact pair set (VERDICT r11
# #1): at m=1 the candidate set is classic OR-banding; at m=2 the
# collision curve steepens and the verify volume drops.  Recall cost
# is a MEASURED number per operating point, not an S-curve argument.
# ===========================================================================

_DPR_THR = 0.8


def _ddpr_oracle() -> str:
    from . import oracle_vec as OV
    odd = "id_a % 2 = 1 OR id_b % 2 = 1"
    c1 = OV.minhash_pairs_sql(threshold=0.0, min_band_overlap=1)
    c2 = OV.minhash_pairs_sql(threshold=0.0, min_band_overlap=2)
    ex = OV.ngram_pairs_sql(threshold=_DPR_THR)
    return f"""
WITH ex AS (
  SELECT * FROM ({ex}) WHERE {odd}
), c1 AS (
  SELECT * FROM ({c1}) WHERE {odd}
), c2 AS (
  SELECT * FROM ({c2}) WHERE {odd}
), s AS (
  SELECT 1::BIGINT AS min_band_overlap,
         (SELECT count(*) FROM c1)::BIGINT AS n_candidates,
         (SELECT count(*) FROM c1 WHERE jaccard >= {_DPR_THR})::BIGINT
           AS n_true_pos,
         (SELECT count(*) FROM ex)::BIGINT AS n_exact
  UNION ALL
  SELECT 2::BIGINT,
         (SELECT count(*) FROM c2)::BIGINT,
         (SELECT count(*) FROM c2 WHERE jaccard >= {_DPR_THR})::BIGINT,
         (SELECT count(*) FROM ex)::BIGINT
)
SELECT min_band_overlap, n_candidates, n_true_pos, n_exact,
       round(n_true_pos::DOUBLE
             / greatest(n_candidates, 1)::DOUBLE, 6) AS precision,
       round(n_true_pos::DOUBLE / greatest(n_exact, 1)::DOUBLE, 6)
         AS recall
FROM s ORDER BY min_band_overlap
"""


@register("dd_minhash_delta_pr", oracle=_ddpr_oracle())
def dd_minhash_delta_pr(spark: SparkSession, d: str) -> DataFrame:
    """Precision/recall scoreboard for the incremental MinHash path's
    shared-bucket filter (VERDICT r11 #1): the dd_minhash_delta split
    (odd ids arrive as the new batch against the even-id index), run
    at BOTH min_band_overlap operating points — m=1 (any shared band
    bucket is a candidate, classic OR-banding) and m=2 (a pair must
    collide in >= 2 of the 4 bands before the exact-Jaccard verify
    runs).  Per point: candidate count (the verify bill), true
    positives at Jaccard >= 0.8, the exact pair count (the
    dd_minhash_pr audit twin restricted to >= 1 delta member), and
    the derived precision/recall.  Both engines band identically, so
    every number is value-oracled — the m=2 recall loss is a measured
    semantic outcome, exactly the dd_minhash_pr honesty applied to
    the ingest path's knob.

    Why it matters at 100 TB: on near-clique corpora the candidate
    verify dominates the delta ingest (the r11 adversarial tier spent
    ~12 s of 19 verifying a 1.7M-pair clique); the m>=2 filter costs
    one comparison on the ALREADY-aggregated candidate pairs and cuts
    candidates superlinearly where buckets disagree — this scoreboard
    is the evidence for where the knob is safe (at production width
    128/32, r=4 rows per band, a j=0.8 pair expects ~13 of 32 band
    collisions, so m=2 costs ~nothing; at the demo 16/4 width the
    curve is sharper — which is exactly what the measured recall
    column shows).  The stress ledger (minhash_delta_* rows,
    scripts/stress_bench.py) carries the wall-clock side."""
    from ..operators.dedup import minhash_delta_pairs, ngram_jaccard_pairs
    docs = _t(spark, d, "documents")
    base = docs.filter(F.col("doc_id") % 2 == 0)
    delta = docs.filter(F.col("doc_id") % 2 == 1)
    odd = (F.col("id_a") % 2 == 1) | (F.col("id_b") % 2 == 1)
    ex_n = (ngram_jaccard_pairs(docs, threshold=_DPR_THR).filter(odd)
            .agg(F.count("*").alias("n_exact")))
    rows = None
    for m in (1, 2):
        allc = minhash_delta_pairs(base, delta, threshold=0.0,
                                   min_band_overlap=m)
        r = (allc.agg(F.count("*").alias("n_candidates"),
                      F.coalesce(
                          F.sum((F.col("jaccard") >= _DPR_THR)
                                .cast("int")), F.lit(0))
                      .cast("long").alias("n_true_pos"))
             .select(F.lit(m).cast("long").alias("min_band_overlap"),
                     "n_candidates", "n_true_pos"))
        rows = r if rows is None else rows.unionByName(r)
    return (rows.crossJoin(F.broadcast(ex_n))
            .select("min_band_overlap", "n_candidates", "n_true_pos",
                    "n_exact",
                    F.round(F.col("n_true_pos").cast("double")
                            / F.greatest("n_candidates", F.lit(1))
                            .cast("double"), 6).alias("precision"),
                    F.round(F.col("n_true_pos").cast("double")
                            / F.greatest("n_exact", F.lit(1))
                            .cast("double"), 6).alias("recall"))
            .orderBy("min_band_overlap"))


# ===========================================================================
# Equi-depth histogram, approx twin (VERDICT r11 #5): GK-sketch
# boundaries (percentile_approx) gated per bucket against the exact
# depths — the s32_analyze_stats_approx pattern applied to the one
# remaining docstring-only approx knob.
# ===========================================================================

_A29A_ACC = 10000          # GK accuracy: rank error <= n / accuracy
_A29A_TOL = 0.25           # per-bucket depth agreement: |Δ| <= 25% of N/B


def _a29_hist_r12(spark: SparkSession, d: str,
                  mode: str = "both") -> DataFrame:
    """Equi-depth histogram with exact and/or GK-approx boundaries.

    mode="both": exact interpolated-percentile boundaries and depths
    (value-oracled — the a29 plan verbatim) PLUS approx boundaries
    from percentile_approx (Greenwald-Khanna, rank error <= n/accuracy)
    computed in the SAME single aggregate, with a per-bucket agreement
    gate: the approx bucket's depth must sit within _A29A_TOL of the
    exact bucket's target depth N/B.

    mode="approx": the pure 100 TB form — NO exact percentile
    compiles anywhere in the plan (pinned in
    tests/test_catalog_r12.py); boundaries and depths are the GK ones.
    Exact percentile is a global sort barrier (every value through
    one ordered path per column); GK carries a bounded-size quantile
    summary that partial-aggregates map-side, so the histogram costs
    one ordinary two-phase scan at any corpus size."""
    from .catalog_r9 import _HIST_BUCKETS as B
    orders = _t(spark, d, "orders")
    v = orders.select(F.round(F.col("o_totalprice") * 100).cast("long")
                      .alias("cents"))
    qs = [i / B for i in range(1, B + 1)]
    aggs = [F.min("cents").alias("mn"),
            F.count("*").cast("long").alias("n_total")]
    if mode == "both":
        aggs += [F.round(F.percentile("cents", F.lit(q))).cast("long")
                 .alias(f"h{i}") for i, q in enumerate(qs, 1)]
    aggs += [F.percentile_approx("cents", F.lit(q), F.lit(_A29A_ACC))
             .cast("long").alias(f"a{i}") for i, q in enumerate(qs, 1)]
    cuts = v.agg(*aggs)
    rows = None
    for i in range(1, B + 1):
        lo = (F.col("mn") - 1) if i == 1 else F.col(f"h{i - 1}")
        alo = (F.col("mn") - 1) if i == 1 else F.col(f"a{i - 1}")
        cols = [F.lit(i).cast("long").alias("bucket"),
                alo.cast("long").alias("alo_cents"),
                F.col(f"a{i}").alias("ahi_cents"),
                F.col("n_total")]
        if mode == "both":
            cols += [lo.cast("long").alias("lo_cents"),
                     F.col(f"h{i}").alias("hi_cents")]
        r = cuts.select(*cols)
        rows = r if rows is None else rows.unionByName(r)
    joined = v.crossJoin(F.broadcast(rows))
    if mode == "approx":
        cnt = (joined
               .filter((F.col("cents") > F.col("alo_cents"))
                       & (F.col("cents") <= F.col("ahi_cents")))
               .groupBy("bucket").agg(F.count("*").alias("n_approx")))
        return (rows.join(cnt, "bucket", "left")
                .select("bucket",
                        F.col("alo_cents").alias("lo_cents"),
                        F.col("ahi_cents").alias("hi_cents"),
                        F.coalesce(F.col("n_approx"), F.lit(0))
                        .cast("long").alias("n_rows"))
                .orderBy("bucket"))
    cnt = (joined
           .groupBy("bucket")
           .agg(F.coalesce(F.sum(
               ((F.col("cents") > F.col("lo_cents"))
                & (F.col("cents") <= F.col("hi_cents"))).cast("int")),
               F.lit(0)).cast("long").alias("n_exact"),
                F.coalesce(F.sum(
                    ((F.col("cents") > F.col("alo_cents"))
                     & (F.col("cents") <= F.col("ahi_cents")))
                    .cast("int")), F.lit(0)).cast("long")
                .alias("n_approx")))
    tol = F.col("n_total").cast("double") / B * _A29A_TOL
    return (rows.join(cnt, "bucket", "left")
            .select("bucket", "lo_cents", "hi_cents",
                    F.coalesce(F.col("n_exact"), F.lit(0)).cast("long")
                    .alias("n_rows"),
                    (F.abs(F.coalesce(F.col("n_approx"), F.lit(0))
                           - F.coalesce(F.col("n_exact"), F.lit(0)))
                     .cast("double") <= tol).alias("approx_ok"))
            .orderBy("bucket"))


def _a29_approx_oracle() -> str:
    from .catalog import CATALOG
    base = CATALOG["a29_equidepth_histogram"].oracle
    return (f"SELECT bucket, lo_cents, hi_cents, n_rows, "
            f"TRUE AS approx_ok FROM ({base})")


@register("a29_equidepth_approx", oracle=_a29_approx_oracle)
def a29_equidepth_approx(spark: SparkSession, d: str) -> DataFrame:
    """The GK-sketch knob for the equi-depth histogram, gated
    (VERDICT r11 #5 — a29's docstring promised percentile_approx as
    the 100 TB path; this entry compiles it): exact boundaries and
    depths are value-oracled (DuckDB recomputes the interpolated
    quantiles), and per bucket the approx histogram's depth — the
    count the GK boundaries actually capture — must agree with the
    exact depth within 25% of the target depth N/B.  approx_ok is the
    in-plan audit, per bucket (the s32_analyze_stats_approx pattern).

    Why it matters at 100 TB: exact percentile is a global sort
    barrier; Greenwald-Khanna (percentile_approx, accuracy 10000 →
    rank error <= 0.01% of rows) is a bounded-state mergeable summary
    that partial-aggregates map-side, so boundary computation costs
    one two-phase scan at any scale.  The selectivity consumer (a17's
    Selinger audit) tolerates far more than 25% depth error by
    design.

    The pure-approx form (_a29_hist_r12 mode='approx') compiles NO
    exact percentile anywhere — pinned by plan inspection in
    tests/test_catalog_r12.py."""
    return _a29_hist_r12(spark, d, mode="both")


# ===========================================================================
# Streaming MinHash band-index ingest (VERDICT r11 #3): the band
# index became the stored dedup state in r11 (dd_minhash_delta);
# this maintains it through checkpointed out-of-order tranches —
# the last stored index to get its streaming twin.
# ===========================================================================

def _st_minhash_oracle() -> str:
    from . import oracle_vec as OV
    return f"""
SELECT id_a, id_b, jaccard FROM ({OV.minhash_pairs_sql()})
ORDER BY id_a, id_b
"""


@register("st_minhash_ingest", oracle=_st_minhash_oracle)
def st_minhash_ingest(spark: SparkSession, d: str) -> DataFrame:
    """Streaming MinHash band-index ingest: documents arrive through
    the paged-dump stream in two checkpointed tranches (even ids,
    then odd), each micro-batch computes its own signatures + band
    rows map-side (the batch plan on batch-sized input) and appends
    (doc_id, band, band_hash) rows to the versioned registry.  Band
    rows are a pure function of content, so the merge is SET UNION —
    a semilattice, idempotent under micro-batch replays (the
    st_ahash_ingest argument with the (id, band) pair as the key).
    The final near-dup pair set computed FROM THE DRAINED REGISTRY
    (operators/dedup.minhash_pairs_from_index — the identical
    candidate + verify tail the batch operator compiles) must equal
    batch dd_minhash_lsh through its own oracle, which completes the
    streaming-ingest family: every stored index in the repo — exact
    hashes, lines, SemDeDup keepers, kNN edges, CMS, theta, KMV,
    aHash, IVF cells, and now the MinHash band index — has a
    checkpointed incremental twin.

    Scale shape: per-batch work is batch-sized (signatures + band
    projection, one shuffle on the batch's ids); registry state is
    num_bands rows x 32-byte hashes per document ever seen (the
    narrow-forever index dd_minhash_delta reads); pair generation
    over the registry is the bucketed join, never all-pairs.
    Checkpoint resume is pinned in tests/test_catalog_r12.py."""
    import shutil
    from pathlib import Path

    from ..operators.dedup import (minhash_band_table,
                                   minhash_pairs_from_index,
                                   minhash_signatures)
    from ..sources.paged_source import PagedDumpDataSource
    from ..sources.tables import list_versions, read_version, write_version
    from ..streaming import pipeline as SP
    from .catalog_more import _scratch

    docs = _t(spark, d, "documents")
    dump = _scratch("st_minhash_dump")
    store = _scratch("st_minhash_store")
    ckpt = _scratch("st_minhash_ckpt")
    for p in (dump, store, ckpt):
        shutil.rmtree(p, ignore_errors=True)

    def page_rows(part: DataFrame) -> DataFrame:
        return part.select(F.to_json(F.struct(
            F.col("doc_id").cast("string").alias("page_id"),
            F.col("text").alias("title"),
            "lang", "n_chars")).alias("value"))

    page_rows(docs.filter(F.col("doc_id") % 2 == 0)) \
        .repartition(2).write.text(dump)

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(PagedDumpDataSource)

    def drain() -> None:
        stream = (spark.readStream.format("paged_dump")
                  .option("path", dump).load())

        def merge(batch_df: DataFrame, epoch_id: int) -> None:
            import os
            batch_docs = (batch_df.filter(~F.col("malformed"))
                          .select(F.col("page_id").cast("long")
                                  .alias("doc_id"),
                                  F.col("title").alias("text")))
            inc = minhash_band_table(
                minhash_signatures(batch_docs))
            sp = batch_df.sparkSession
            versions = (list_versions(sp, store)
                        if os.path.exists(store) else [])
            if versions:
                prior = read_version(sp, store)
                merged = prior.unionByName(inc).distinct()
            else:
                merged = inc
            write_version(merged, store,
                          (versions[-1] + 1) if versions else 1)

        SP._run_foreach(stream, merge, 120, ckpt)

    drain()

    tmp2 = dump + "_t2"
    shutil.rmtree(tmp2, ignore_errors=True)
    page_rows(docs.filter(F.col("doc_id") % 2 == 1)) \
        .repartition(2).write.text(tmp2)
    for i, f in enumerate(sorted(Path(tmp2).glob("part-*"))):
        f.rename(Path(dump) / f"part-zz-{i:05d}.txt")
    drain()

    registry = read_version(spark, store)
    return (minhash_pairs_from_index(registry, docs)
            .orderBy("id_a", "id_b"))


# ===========================================================================
# Composed ingest capstone (VERDICT r11 #4): the production
# "new batch arrives" story — published gates, bloom pre-filter,
# exact-hash anti-join, near-dup vs the stored index, versioned
# commit — as ONE per-stage ledger.
# ===========================================================================

_ING_BF_BITS = 4096
_ING_BF_K = 3


def _ingest_oracle() -> str:
    from . import oracle_sql as O
    from . import oracle_vec as OV
    mp = OV.minhash_pairs_sql(threshold=0.8, source="uni")
    return f"""
WITH gat AS (
  SELECT doc_id,
         {O.clean_sql('text')} AS clean_text,
         {O.quality_sql('text')} AS q,
         {OV.detect_language_sql('text')} AS detected_lang
  FROM documents
), gk AS (
  SELECT doc_id, clean_text,
         md5(lower({O.pystrip_sql('clean_text')})) AS content_hash
  FROM gat
  WHERE (q IS NULL OR q >= 0.2) AND detected_lang = 'en'
), sg AS (SELECT * FROM gk WHERE doc_id % 2 = 0),
bg AS (SELECT * FROM gk WHERE doc_id % 2 = 1),
fresh AS (
  SELECT * FROM bg
  WHERE content_hash NOT IN (SELECT content_hash FROM sg)
), keep AS (
  SELECT content_hash, min(doc_id) AS keeper FROM fresh
  GROUP BY content_hash
), kd AS (
  SELECT f.doc_id, f.clean_text FROM fresh f
  JOIN keep k ON k.keeper = f.doc_id
             AND k.content_hash = f.content_hash
), uni AS (
  SELECT doc_id, clean_text AS text FROM sg
  UNION ALL
  SELECT doc_id, clean_text FROM kd
), mp AS (
  SELECT id_a, id_b FROM ({mp})
  WHERE id_a % 2 = 1 OR id_b % 2 = 1
), losers AS (
  SELECT DISTINCT CASE
    WHEN id_a % 2 = 1 AND id_b % 2 = 1 THEN greatest(id_a, id_b)
    WHEN id_a % 2 = 1 THEN id_a ELSE id_b END AS doc_id
  FROM mp
), surv AS (
  SELECT doc_id FROM kd
  WHERE doc_id NOT IN (SELECT doc_id FROM losers)
), nraw AS (
  SELECT count(*)::BIGINT AS n FROM documents WHERE doc_id % 2 = 1
), counts AS (
  SELECT 0 AS stage_no, 'raw' AS stage, (SELECT n FROM nraw) AS docs
  UNION ALL
  SELECT 1, 'gated', (SELECT count(*) FROM bg)::BIGINT
  UNION ALL
  SELECT 2, 'exact_new', (SELECT count(*) FROM fresh)::BIGINT
  UNION ALL
  SELECT 3, 'batch_keeper', (SELECT count(*) FROM kd)::BIGINT
  UNION ALL
  SELECT 4, 'neardup_new', (SELECT count(*) FROM surv)::BIGINT
  UNION ALL
  SELECT 5, 'committed', (SELECT count(*) FROM surv)::BIGINT
)
SELECT stage_no::BIGINT AS stage_no, stage, docs::BIGINT AS docs,
       round(docs::DOUBLE / (SELECT n FROM nraw)::DOUBLE, 6)
         AS share_of_raw
FROM counts ORDER BY stage_no
"""


@register("cc_ingest_delta", headline=True, oracle=_ingest_oracle)
def cc_ingest_delta(spark: SparkSession, d: str) -> DataFrame:
    """The composed ingest capstone (VERDICT r11 #4): one entry runs
    the whole "new batch arrives" story the repo previously shipped
    as parts, emitting the per-stage ledger a production ingest logs —
    raw -> gated (cc_gate_keyed: clean + quality + language, the
    cc_curate front-end) -> exact_new (content-hash anti-join against
    the resident store, with the a21 Bloom pre-filter PHYSICALLY
    scoping the anti-join: hashes that miss the 4096-bit bloom are
    definitely new and bypass the join entirely; only the bloom hits
    — true members plus the ~0.5% false positives — reach it; no
    false negatives is a bloom guarantee, so the stage count equals
    the plain anti-join's, pinned in tests/test_catalog_r12.py) ->
    batch_keeper (in-batch min-id election per hash, the s15 tail) ->
    neardup_new (MinHash delta vs the stored band index,
    dd_minhash_delta's operator: a keeper is dropped if it pairs at
    Jaccard >= 0.8 with any resident doc — the store always wins, it
    is already committed — or with a smaller-id keeper) ->
    committed (the survivors APPENDED to the versioned store,
    sources/tables.write_version, and the ledger row read back from
    the store — the count that survived the actual commit).

    Even doc_ids play the resident store, odd the incoming batch;
    near-dup runs on the CLEANED text both sides (the pipeline
    dedups what it stores, not what it crawled).  Every stage count
    is value-oracled end to end — gates, hashes, banding, verify and
    the loser election are all deterministic md5/column arithmetic
    DuckDB replays exactly.

    Scale shape per stage: gates are one fused map-side projection;
    the bloom is 128 bit_or'd words broadcast back (a21); the
    anti-join shuffles only bloom hits on the uniform crypto hash;
    banding + verify are the dd_minhash_delta shape (delta-sized
    signatures, two bucket equi-joins, candidate-scoped verify); the
    commit appends narrow keeper rows.  Nothing rescans the corpus
    and nothing is quadratic.  Wall-clock at catalog scale is a JOB-
    COUNT floor, not a data cost (the m6/g4 power-loop argument): six
    stage materializations + the versioned write are ~12 scheduled
    jobs, so the headline number (~5 s at sf0.1, ~4.5 s at sf0.01 —
    near-identical because it is scheduling, not data) amortizes to
    noise on real batch sizes."""
    import shutil

    from ..operators.dedup import md5_int32, minhash_delta_pairs
    from ..sources.tables import read_version, write_version
    from .catalog_more import _scratch
    from .catalog_r6 import cc_gate_keyed

    docs = _t(spark, d, "documents")
    batch_raw = docs.filter(F.col("doc_id") % 2 == 1)
    # stage frames are each read by several downstream stages (the
    # ledger, the bloom, the anti-join, the near-dup delta) —
    # materialize once per stage, exactly what a production ingest
    # does when it logs the funnel: stage outputs are tables, not
    # re-derivations of the whole upstream per read
    g_store = cc_gate_keyed(docs.filter(F.col("doc_id") % 2 == 0)) \
        .localCheckpoint()
    g_batch = cc_gate_keyed(batch_raw).localCheckpoint()

    # --- bloom pre-filter over the store's content hashes (a21) ----
    jcol = F.explode(F.array(*[F.lit(j) for j in range(_ING_BF_K)])) \
        .alias("j")

    def positions(df: DataFrame) -> DataFrame:
        return (df.select("content_hash", jcol)
                .withColumn("p", F.pmod(
                    md5_int32(F.concat(F.col("content_hash"),
                                       F.lit(":bf"),
                                       F.col("j").cast("string"))),
                    F.lit(_ING_BF_BITS)))
                .withColumn("bitval", F.expr(
                    "shiftleft(cast(1 as bigint), cast(p % 32 as int))")))

    store_hashes = g_store.select("content_hash").distinct()
    words = (positions(store_hashes)
             .groupBy(F.expr("p div 32").alias("word"))
             .agg(F.expr("bit_or(bitval)").alias("wbits")))
    batch_hashes = g_batch.select("content_hash").distinct()
    probe = (positions(batch_hashes).withColumn("word", F.expr("p div 32"))
             .join(F.broadcast(words), "word", "left")
             .withColumn("hit", F.coalesce(
                 (F.col("wbits").bitwiseAND(F.col("bitval")) != 0),
                 F.lit(False)))
             .groupBy("content_hash")
             .agg(F.expr("bool_and(hit)").alias("bloom_hit")))

    gb = g_batch.join(probe, "content_hash")
    # bloom misses are DEFINITELY new (no false negatives); only hits
    # pay the store-sized anti-join
    definite = gb.filter(~F.col("bloom_hit"))
    verified = (gb.filter(F.col("bloom_hit"))
                .join(store_hashes, "content_hash", "left_anti"))
    fresh = definite.unionByName(verified).drop("bloom_hit") \
        .localCheckpoint()

    from pyspark.sql import Window
    w = Window.partitionBy("content_hash")
    keepers = (fresh.withColumn("__keeper", F.min("doc_id").over(w))
               .filter(F.col("doc_id") == F.col("__keeper"))
               .drop("__keeper").localCheckpoint())

    # --- near-dup vs the resident store (dd_minhash_delta shape) ---
    base = g_store.select("doc_id", F.col("clean_text").alias("text"))
    delta = keepers.select("doc_id", F.col("clean_text").alias("text"))
    pairs = minhash_delta_pairs(base, delta, threshold=0.8,
                                max_bucket=None)
    # loser election: the store always wins (it is committed); among
    # keepers the min id wins.  Sides are recoverable by parity (base
    # even, delta odd) after the operator's canonicalization.
    both_delta = (F.col("id_a") % 2 == 1) & (F.col("id_b") % 2 == 1)
    losers = (pairs.select(
        F.when(both_delta, F.greatest("id_a", "id_b"))
         .when(F.col("id_a") % 2 == 1, F.col("id_a"))
         .otherwise(F.col("id_b")).alias("doc_id"))
        .distinct())
    survivors = keepers.join(losers, "doc_id", "left_anti")

    # --- the actual commit: versioned append, ledger reads it back --
    store_path = _scratch("cc_ingest_store")
    shutil.rmtree(store_path, ignore_errors=True)
    write_version(survivors.select("doc_id", "content_hash"),
                  store_path, 1)
    committed = read_version(spark, store_path)

    def stage(no: int, name: str, frame: DataFrame) -> DataFrame:
        return frame.agg(F.count("*").cast("long").alias("docs")) \
            .select(F.lit(no).cast("long").alias("stage_no"),
                    F.lit(name).alias("stage"), "docs")

    stages = (stage(0, "raw", batch_raw)
              .unionByName(stage(1, "gated", g_batch))
              .unionByName(stage(2, "exact_new", fresh))
              .unionByName(stage(3, "batch_keeper", keepers))
              .unionByName(stage(4, "neardup_new", survivors))
              .unionByName(stage(5, "committed", committed)))
    nraw = batch_raw.agg(F.count("*").cast("long").alias("__nraw"))
    return (stages.crossJoin(F.broadcast(nraw))
            .select("stage_no", "stage", "docs",
                    F.round(F.col("docs").cast("double")
                            / F.col("__nraw").cast("double"), 6)
                    .alias("share_of_raw"))
            .orderBy("stage_no"))


# ===========================================================================
# Scene-granular multimodal dedup (VERDICT r11 #7): the two
# value-oracled multimodal surfaces composed — per-scene
# representative keyframes (mm_scene_table's election) deduped via
# the aHash band machinery (mm_ahash_neardup) at scene granularity.
# ===========================================================================

def _scene_dedup_oracle() -> str:
    from .catalog_r8 import _mm_keyframes_oracle
    bs = [f"('0x' || substr(h, {2 * i + 1}, 2))::BIGINT"
          for i in range(8)]
    sumb = " + ".join(bs)
    bits = " + ".join(
        f"(CASE WHEN ({b}) * 8 >= sumb"
        f" THEN {1 << (8 - 1 - i)} ELSE 0 END)"
        for i, b in enumerate(bs))
    return f"""
WITH kf AS ({_mm_keyframes_oracle()}),
sc AS (
  SELECT doc_id, frame_index,
         CAST(sum(is_keyframe::INT) OVER (
           PARTITION BY doc_id ORDER BY frame_index
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS scene_id,
         is_keyframe
  FROM kf
), rep AS (
  SELECT doc_id, frame_index, scene_id FROM sc WHERE is_keyframe
), pay AS (
  SELECT r.doc_id, r.scene_id,
         md5(substr(d.text, 1 + r.frame_index * 7, 64)
             || ':' || r.frame_index::VARCHAR) AS h
  FROM rep r JOIN documents d USING (doc_id)
), raw AS (
  SELECT doc_id, scene_id, h, ({sumb})::BIGINT AS sumb FROM pay
), hsh AS (
  SELECT doc_id, scene_id, ({bits})::BIGINT AS ahash FROM raw
), bands AS (
  SELECT doc_id, scene_id, ahash,
         0 AS band, (ahash & 15)::BIGINT AS bval FROM hsh
  UNION ALL
  SELECT doc_id, scene_id, ahash,
         1, ((ahash >> 4) & 15)::BIGINT FROM hsh
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, a.scene_id AS scene_a,
         b.doc_id AS doc_b, b.scene_id AS scene_b,
         a.ahash AS ha, b.ahash AS hb
  FROM bands a JOIN bands b
    ON b.band = a.band AND b.bval = a.bval AND a.doc_id < b.doc_id
)
SELECT doc_a, scene_a, doc_b, scene_b,
       bit_count(xor(ha, hb))::BIGINT AS hamming
FROM cand WHERE bit_count(xor(ha, hb)) <= 1
ORDER BY doc_a, scene_a, doc_b, scene_b
"""


@register("mm_scene_dedup", oracle=_scene_dedup_oracle)
def mm_scene_dedup(spark: SparkSession, d: str) -> DataFrame:
    """Scene-granular cross-video dedup (VERDICT r11 #7): the read
    the scene manifest exists for — "this scene was re-uploaded in
    another video".  Composition of the two value-oracled multimodal
    surfaces: mm_keyframes' shot-boundary election picks each scene's
    REPRESENTATIVE frame (the keyframe that opens it — the
    mm_scene_table scene_id arithmetic), the representative's payload
    goes through the SAME mapInPandas Arrow decode the image path
    uses, an 8-bit average hash is folded from the decoded feature
    bytes (bit i set iff cell i >= the frame mean, cross-multiplied
    so it stays BIGINT-exact), and near-dup scene pairs across
    DIFFERENT videos come from SimHash-style band blocking (2 bands x
    4 bits — pigeonhole: every Hamming<=1 pair shares an exact band)
    with the exact Hamming verify on candidates.  Within-video
    near-dup scenes are the keyframe election's own job (a repeated
    scene inside one video never opens a new scene unless the shot
    boundary fired), so the join is doc_a < doc_b by construction.

    Exactness: features come off the Arrow path as exact byte
    ratios (b/255); multiplying back by 255 and rounding recovers
    the bytes, and everything after is BIGINT band/bit_count
    arithmetic both engines replay — the fake decode backend
    exercises the identical plumbing a real decoder would (the
    mm_ahash_neardup caveat verbatim).

    Scale shape: decode is Arrow-batched map-side work bounded by
    scenes (<= 5/video); the only shuffle is the band-bucket
    self-join — the dd_minhash_lsh shape; the production 64-bit grid
    hash bands 4x16 and caps buckets exactly as minhash does
    (mm_ahash_neardup's width ledger applies verbatim)."""
    from pyspark.sql import Window
    from ..operators import multimodal
    from .catalog_r8 import _MM_KEY_TAU

    docs = _t(spark, d, "documents")
    fr = multimodal.frame_sample(
        docs.select("doc_id", (F.col("n_chars") / 100.0)
                    .alias("duration_s")))
    pay = (fr.join(docs.select("doc_id", "text"), "doc_id")
           .withColumn(
               "payload_str",
               F.concat(F.col("text").substr(
                   (F.col("frame_index") * 7 + 1).cast("int"), F.lit(64)),
                   F.lit(":"), F.col("frame_index").cast("string")))
           .withColumn("fid", F.col("doc_id") * 100 + F.col("frame_index")))
    bin_df = pay.select(F.col("fid").alias("doc_id"),
                        F.encode(F.col("payload_str"), "utf-8")
                        .alias("content_bytes"))
    feats = (multimodal.decode_features(bin_df)
             .select(F.col("doc_id").alias("fid"), "features"))
    joined = pay.select("doc_id", "frame_index", "fid").join(feats, "fid")
    w = Window.partitionBy("doc_id").orderBy("frame_index")
    lagd = joined.withColumn("pf", F.lag("features").over(w))
    dist = F.round(F.aggregate(
        F.zip_with(F.col("features"), F.col("pf"),
                   lambda a, b: (a - b) * (a - b)),
        F.lit(0.0), lambda acc, x: acc + x), 6)
    flagged = lagd.withColumn(
        "is_keyframe",
        F.col("pf").isNull() | (dist > F.lit(_MM_KEY_TAU)))
    wcum = (Window.partitionBy("doc_id").orderBy("frame_index")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    reps = (flagged
            .withColumn("scene_id",
                        F.sum(F.col("is_keyframe").cast("int")).over(wcum)
                        .cast("long"))
            .filter(F.col("is_keyframe")))
    # decoded features are byte/255 — recover the exact bytes, fold
    # the 8-bit average hash (bit i set iff b_i * 8 >= sum of bytes)
    bts = F.transform(F.col("features"),
                      lambda x: F.round(x * 255).cast("long"))
    sumb = F.aggregate(bts, F.lit(0).cast("long"), lambda a, x: a + x)
    hashed = reps.select("doc_id", "scene_id", bts.alias("b"),
                         sumb.alias("sumb"))
    ahash = None
    for i in range(8):
        bit = F.when(F.element_at(F.col("b"), i + 1) * 8
                     >= F.col("sumb"),
                     F.lit(1 << (8 - 1 - i)).cast("long")) \
               .otherwise(F.lit(0).cast("long"))
        ahash = bit if ahash is None else ahash + bit
    hsh = hashed.select("doc_id", "scene_id", ahash.alias("ahash"))
    blocks = F.array(
        F.struct(F.lit(0).alias("band"),
                 (F.col("ahash") % 16).alias("bval")),
        F.struct(F.lit(1).alias("band"),
                 F.shiftright(F.col("ahash"), 4).alias("bval")))
    banded = (hsh.withColumn("__b", F.explode(blocks))
              .select("doc_id", "scene_id", "ahash",
                      F.col("__b.band").alias("band"),
                      F.col("__b.bval").alias("bval")))
    a = banded.select(F.col("doc_id").alias("doc_a"),
                      F.col("scene_id").alias("scene_a"),
                      F.col("ahash").alias("ha"), "band", "bval")
    b = banded.select(F.col("doc_id").alias("doc_b"),
                      F.col("scene_id").alias("scene_b"),
                      F.col("ahash").alias("hb"), "band", "bval")
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (a.join(b, ["band", "bval"])
            .filter(F.col("doc_a") < F.col("doc_b"))
            .withColumn("hamming", ham.cast("long"))
            .filter(F.col("hamming") <= 1)
            .select("doc_a", "scene_a", "doc_b", "scene_b", "hamming")
            .dropDuplicates(["doc_a", "scene_a", "doc_b", "scene_b"])
            .orderBy("doc_a", "scene_a", "doc_b", "scene_b"))
