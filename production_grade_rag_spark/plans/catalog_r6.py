"""Catalog extension 3+ (round 6): curation-pipeline composition,
sampling/mix/decontamination hygiene, TPC-H relational widening
(Q4/Q6/Q10/Q12/Q14/Q18 shapes), warehouse event ops (SCD2 islands,
grouping-sets rollup, cohort retention, pivot, heavy hitters),
compressed-ANN composition (PQ, IVFPQ + recall gates), streaming
extensions (stream-stream join, watermarked dedup, foreachBatch sink),
and storage-layout ops (compaction, partitioned+sorted ingest, the
custom paged-dump DataSource round trip).

Registered into the same CATALOG as catalog.py / catalog_ext.py /
catalog_more.py; entries carry DuckDB oracles unless approximate by
design (then a paired in-plan gate is oracle-backed).  Reference
scope: the training-data-pipeline operators the reference's feature
pipeline (src/pipelines/rag_pipeline.py:40-210) implies but runs
driver-side one document at a time — here each is a distributed plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as X
from ..operators import dedup, embedding, pq, textstats
from . import oracle_sql as O
from . import oracle_vec as OV
from . import flagship as FL
from .catalog import _t, register
from .oracle_vec import QUERY_VEC


# ===========================================================================
# End-to-end corpus curation (clean -> quality gate -> lang gate ->
# exact dedup -> token count), the composed form of t1/t3/ta/dd_exact
# ===========================================================================

def cc_gate_keyed(docs: DataFrame) -> DataFrame:
    """The scalar front-end of cc_curate (clean -> quality gate ->
    language gate -> content hash), shared with the incremental
    streaming twin st_cc_curate so batch and per-micro-batch curation
    are the SAME fused projection, not two drifting copies."""
    # r15: nd_pin the two gate columns — unpinned, predicate pushdown
    # substitutes their whole defining trees into the gate filter and
    # pushes it below the parallelizing exchange, so the full
    # quality+language expression pipeline ran TWICE per row, the
    # first time single-threaded in the one-task parquet scan (guide
    # §4.4's duplicated-evaluation disease, built-in expression form).
    scored = docs.select(
        "doc_id",
        X.clean_text(F.col("text")).alias("clean_text"),
        X.nd_pin(X.quality_components(F.col("text"))["quality_score"])
         .alias("q"),
        X.nd_pin(textstats.detect_language(F.col("text")))
         .alias("detected_lang"))
    gated = scored.filter(
        (F.col("q").isNull() | (F.col("q") >= 0.2))
        & (F.col("detected_lang") == "en"))
    return gated.withColumn(
        "content_hash", F.md5(F.lower(X.pystrip(F.col("clean_text")))))


@register("cc_curate", headline=True, oracle=f"""
WITH scored AS (
  SELECT doc_id,
         {O.clean_sql('text')} AS clean_text,
         {O.quality_sql('text')} AS q,
         {OV.detect_language_sql('text')} AS detected_lang
  FROM documents
), gated AS (
  SELECT * FROM scored
  WHERE (q IS NULL OR q >= 0.2) AND detected_lang = 'en'
), keyed AS (
  SELECT *, md5(lower({O.pystrip_sql('clean_text')})) AS content_hash
  FROM gated
), grouped AS (
  SELECT *, min(doc_id) OVER (PARTITION BY content_hash) AS keeper_id,
            count(*) OVER (PARTITION BY content_hash) AS group_size
  FROM keyed
)
SELECT doc_id, detected_lang, round(q, 6) AS quality_score,
       (length(clean_text) // 4)::BIGINT AS est_tokens, group_size
FROM grouped WHERE doc_id = keeper_id
""")
def cc_curate(spark: SparkSession, d: str) -> DataFrame:
    """End-to-end corpus curation as ONE declarative plan: clean (T1,
    document_processor.py:20-33) -> quality gate, NULL passes (T3,
    rag_pipeline.py:45-68; 0.2 here — the reference's 0.5/0.3 keep <=1
    synthetic doc, which would make the composition vacuous) -> language gate
    (stopword-profile argmax, keep 'en') -> exact near-identical dedup
    on the normalized cleaned text (min-id keeper) -> token estimate
    (F8, rag_engine.py:243).

    The reference runs these stages driver-side per document; composing
    them as columns lets Catalyst fuse every scalar stage into one
    codegen'd projection over the scan, so the whole curation front-end
    is ONE pass over the corpus plus ONE shuffle (on content_hash) for
    the dedup.  At 100 TB: the map side is embarrassingly parallel and
    the hash shuffle is uniform by construction (crypto hash keys, no
    skew); the filters cut volume BEFORE the shuffle, which is the
    right order — gate cheap, shuffle small."""
    docs = _t(spark, d, "documents")
    keyed = cc_gate_keyed(docs)
    w = Window.partitionBy("content_hash")
    grouped = (keyed
               .withColumn("keeper_id", F.min("doc_id").over(w))
               .withColumn("group_size", F.count("*").over(w)))
    return (grouped.filter(F.col("doc_id") == F.col("keeper_id"))
            .select("doc_id", "detected_lang",
                    F.round("q", 6).alias("quality_score"),
                    X.token_estimate(F.col("clean_text")).alias("est_tokens"),
                    "group_size"))


# ===========================================================================
# Stratified sampling: exact per-stratum quota, deterministic hash order
# ===========================================================================

@register("t10_stratified_sample", oracle="""
WITH ranked AS (
  SELECT doc_id, lang, source,
         row_number() OVER (PARTITION BY lang
             ORDER BY md5(doc_id::VARCHAR || ':strat'), doc_id) AS rk,
         count(*) OVER (PARTITION BY lang) AS n_stratum
  FROM documents
)
SELECT doc_id, lang, source, rk, n_stratum
FROM ranked WHERE rk <= ceil(n_stratum * 0.2)
""")
def t10_stratified_sample(spark: SparkSession, d: str) -> DataFrame:
    """Stratified sampling with an EXACT 20% quota per lang stratum
    (t9_hash_sample is Bernoulli — per-stratum counts drift; training
    mixes need exact ratios).  Deterministic: rank within stratum by
    md5(doc_id||salt) — same ~ordering every run/engine/partitioning —
    keep rank <= ceil(0.2 * |stratum|).

    Scale note: row_number per stratum sorts each stratum through one
    window task chain — fine while strata stay executor-sized.  At
    100 TB with few huge strata, swap the exact rank for a sampled
    hash-histogram cutoff (approxQuantile(0.2) of the hash per
    stratum, then a map-only filter hash <= cutoff): the hash is
    uniform so the quota error is O(1/sqrt(sample)), and no global
    per-stratum sort is needed.  The exact form here IS the oracle
    semantics; the cutoff form is the approximate twin."""
    docs = _t(spark, d, "documents").select("doc_id", "lang", "source")
    key = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":strat")))
    w = Window.partitionBy("lang").orderBy(key.asc(), F.col("doc_id").asc())
    wc = Window.partitionBy("lang")
    ranked = (docs
              .withColumn("rk", F.row_number().over(w))
              .withColumn("n_stratum", F.count("*").over(wc)))
    return ranked.filter(F.col("rk") <= F.ceil(F.col("n_stratum") * 0.2))


@register("t10_stratified_cutoff", oracle="""
WITH strata AS (
  SELECT lang, count(*) AS n_stratum FROM documents GROUP BY lang
)
SELECT lang, n_stratum, TRUE AS quota_ok FROM strata
""")
def t10_stratified_cutoff(spark: SparkSession, d: str) -> DataFrame:
    """The approximate twin t10_stratified_sample's docstring promises
    — the form that survives executor-dwarfing strata: instead of an
    exact per-stratum rank (a window sort through every stratum), take
    the ~20th percentile of a uniform per-doc hash PER STRATUM with
    approx_percentile (t-digest, mergeable, one partial-agged pass),
    then keep rows with hash <= cutoff — a MAP-ONLY filter, no
    per-stratum sort anywhere.

    Quota error is the sketch's percentile error on a uniform hash —
    small and bounded; the in-plan gate asserts each stratum's kept
    fraction lands within 5 points of the 20% target (quota_ok, value-
    pinned by the oracle).  Exact per-stratum counts are value-checked
    too.  At 100 TB this is the production form; the exact window form
    remains the oracle-semantics twin."""
    docs = _t(spark, d, "documents").select("doc_id", "lang")
    h = F.conv(F.substring(F.md5(F.concat(
        F.col("doc_id").cast("string"), F.lit(":strat"))), 1, 8), 16, 10) \
        .cast("double")
    hashed = docs.withColumn("__h", h)
    cuts = (hashed.groupBy("lang")
            .agg(F.expr("approx_percentile(__h, 0.2, 10000)")
                 .alias("__cut"),
                 F.count("*").alias("n_stratum")))
    kept = (hashed.join(F.broadcast(cuts), "lang")
            .filter(F.col("__h") <= F.col("__cut")))
    frac = (kept.groupBy("lang")
            .agg(F.count("*").alias("__kept"))
            .join(F.broadcast(cuts), "lang")
            .select("lang", "n_stratum",
                    ((F.col("__kept") / F.col("n_stratum") - 0.2)
                     .between(-0.05, 0.05)).alias("quota_ok")))
    return frac


# ===========================================================================
# Bounded-range event join (point-in-window), bucketed strategy
# ===========================================================================

@register("ev_window_join", oracle="""
WITH p AS (SELECT event_id, user_id, ts FROM events
           WHERE event_type = 'purchase'),
     v AS (SELECT user_id, ts, value FROM events WHERE event_type = 'view')
SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
       count(v.ts) AS n_prior_views,
       round(coalesce(sum(v.value), 0), 4) AS view_value_sum
FROM p LEFT JOIN v
  ON v.user_id = p.user_id
 AND v.ts < p.ts AND v.ts >= p.ts - INTERVAL 30 MINUTE
GROUP BY 1, 2, 3
""")
def ev_window_join(spark: SparkSession, d: str) -> DataFrame:
    """Bounded-range join: for every purchase, count/sum the same
    user's 'view' events in the preceding 30 minutes (the fixed-window
    companion of ev_asof_join's unbounded last-before).

    Naive SQL is an inequality join — Spark would fall back to
    broadcast-nested-loop.  The scale strategy is BUCKETING: floor
    timestamps into gap-sized epochs; a view at bucket b can only
    serve purchases in buckets b or b+1, so the purchase side explodes
    to its 2 candidate buckets and the join becomes an EQUI-join on
    (user_id, bucket) with the exact range check as a residual filter.
    One hash shuffle each side, probe fan-out exactly 2x — at 100 TB
    this stays a plain shuffled hash join however wide the data is
    (hot users are the only skew; salt like operators.skew if needed).
    LEFT join keeps zero-view purchases; count(v.ts) is null-safe."""
    gap_us = 1800 * 1_000_000
    ev = _t(spark, d, "events")
    p = (ev.filter(F.col("event_type") == "purchase")
         .select(F.col("event_id").alias("purchase_id"),
                 F.col("user_id"),
                 F.col("ts").alias("purchase_ts"),
                 F.unix_micros(F.col("ts").cast("timestamp")).alias("p_us")))
    p = p.withColumn(
        "bucket", F.explode(F.array(F.floor(F.col("p_us") / gap_us),
                                    F.floor(F.col("p_us") / gap_us) - 1)))
    v = (ev.filter(F.col("event_type") == "view")
         .select(F.col("user_id").alias("v_user"),
                 F.unix_micros(F.col("ts").cast("timestamp")).alias("v_us"),
                 F.col("value").alias("v_value")))
    v = v.withColumn("bucket", F.floor(F.col("v_us") / gap_us))
    joined = p.join(
        v,
        (p["user_id"] == v["v_user"]) & (p["bucket"] == v["bucket"])
        & (F.col("v_us") < F.col("p_us"))
        & (F.col("v_us") >= F.col("p_us") - gap_us),
        "left")
    return (joined
            .groupBy("purchase_id", "user_id", "purchase_ts")
            .agg(F.count("v_us").alias("n_prior_views"),
                 F.round(F.coalesce(F.sum("v_value"), F.lit(0.0)), 4)
                 .alias("view_value_sum")))


# ===========================================================================
# Product-quantization ANN (R4 compressed-index scale path)
# ===========================================================================

@register("r4_pq_topk")   # rows-only: PQ is approximate by design
def r4_pq_topk(spark: SparkSession, d: str) -> DataFrame:
    """R4 approximate, compressed-index form: PQ (8 subspaces x 32
    codewords over the 64-dim corpus) with ADC candidate scoring over
    the narrow code table and exact cosine rescoring of k*16
    candidates.  Deterministic end to end (hash-ordered training
    sample, seeded k-means, id tiebreaks); recall vs the exact
    r4_knn_topk is asserted in tests/test_pq.py and gated in-plan by
    r4_pq_recall — the driver records a rows-only check here because
    ANN misses are semantic, like r4_ivf_topk."""
    emb = _t(spark, d, "embeddings")
    books = pq.pq_train(emb, k_codes=32)
    encoded = pq.pq_encode(emb, books).select("vec_id", "pq_codes")
    return pq.pq_topk(encoded, emb, QUERY_VEC, books, k=10, rescore=16)


@register("r4_ivfpq_store")   # rows-only: approximate by design
def r4_ivfpq_store(spark: SparkSession, d: str) -> DataFrame:
    """IVF x PQ composed ANN over a cell-partitioned store: probes
    prune partition directories, residual PQ codes make the candidate
    scan column-narrow, full vectors are read only for the rescored
    candidates.  The production-shaped endpoint of the ANN family
    (exact < SQ < IVF | PQ < IVFPQ); recall gated by
    r4_ivfpq_recall and tests/test_pq.py."""
    from .catalog_more import _scratch
    emb = _t(spark, d, "embeddings")
    path = _scratch("ivfpq_store")
    pq.ivfpq_build_store(emb, path, n_lists=8, m=8, k_codes=32)
    return pq.ivfpq_search_store(spark, path, QUERY_VEC, k=10,
                                 n_probe=4)


@register("r4_ivfpq_recall", oracle="""
SELECT 10::BIGINT AS n_exact, TRUE AS floor_met
""")
def r4_ivfpq_recall(spark: SparkSession, d: str) -> DataFrame:
    """Recall gate for the composed IVFPQ store vs exact top-k,
    in-plan like the other ANN gates.  Floor 0.5 (IVF probing is the
    binding miss source — same floor as r4_ivf_recall; PQ's residual
    coding + 16x exact rescore loses little on top)."""
    from ..operators import similarity
    from .catalog_more import _recall_summary, _scratch
    emb = _t(spark, d, "embeddings")
    path = _scratch("ivfpq_recall")
    pq.ivfpq_build_store(emb, path, n_lists=8, m=8, k_codes=32)
    exact = similarity.knn_topk(emb, QUERY_VEC, k=10)
    approx = pq.ivfpq_search_store(spark, path, QUERY_VEC, k=10,
                                   n_probe=4)
    return _recall_summary(exact, approx, ["vec_id"], floor=0.5)


@register("eng_ann_recall", oracle="""
SELECT 10::BIGINT AS n_exact, TRUE AS floor_met
""")
def eng_ann_recall(spark: SparkSession, d: str) -> DataFrame:
    """Engine-LEVEL ANN gate: the same SparkRagEngine.search call with
    config.ann_backend='ivf' must keep recall >= 0.5 vs the exact
    backend — proving the backend dispatch (engine._vector_topk)
    drives the production path end to end, not just the operator in
    isolation.  Companion of tests/test_engine.py's dispatch test,
    made driver-visible."""
    from ..config import EngineConfig
    from ..engine import SparkRagEngine
    from .catalog_more import _recall_summary
    emb = _t(spark, d, "embeddings")
    exact = SparkRagEngine(spark).search(
        emb, query_vector=QUERY_VEC, limit=10, id_col="vec_id")
    approx = SparkRagEngine(spark, EngineConfig(
        ann_backend="ivf", ann_n_lists=8, ann_n_probe=4)).search(
        emb, query_vector=QUERY_VEC, limit=10, id_col="vec_id")
    return _recall_summary(exact, approx, ["vec_id"], floor=0.5)


@register("r4_ivf_join")   # rows-only: approximate by design
def r4_ivf_join(spark: SparkSession, d: str) -> DataFrame:
    """Batch ANN join: every query meets the corpus on an equi-join on
    IVF cell (similarity.ivf_knn_join) instead of knn_join's
    crossJoin — each query scores n_probe/n_lists of the corpus, the
    scalable form of r4_knn_join_batch.  Measured pair recall at this
    operating point (16 lists, probe 4): 0.80-0.84 across sf0.01/0.1;
    gated by r4_ivf_join_recall."""
    from ..operators import similarity
    emb = _t(spark, d, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    out = similarity.ivf_knn_join(queries, emb, k=5,
                                  n_lists=16, n_probe=4, q_id="vec_id")
    return out.select("query_id", "result_id",
                      F.round("score", 6).alias("score"), "rank")


@register("r4_ivf_join_recall", oracle="""
SELECT 25::BIGINT AS n_exact, TRUE AS floor_met
""")
def r4_ivf_join_recall(spark: SparkSession, d: str) -> DataFrame:
    """Recall gate for the batch ANN join vs the exact knn_join over
    the same 5-query set, on (query, result) PAIRS — floor 0.5, well
    under the measured 0.80-0.84, so only a real regression (broken
    cell assignment, probe ranking, or join key) trips it."""
    from ..operators import similarity
    from .catalog_more import _recall_summary
    emb = _t(spark, d, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = similarity.knn_join(queries, emb, k=5, q_id="vec_id")
    approx = similarity.ivf_knn_join(queries, emb, k=5,
                                     n_lists=16, n_probe=4,
                                     q_id="vec_id")
    return _recall_summary(exact, approx, ["query_id", "result_id"],
                           floor=0.5)


@register("r4_pq_recall", oracle="""
SELECT 10::BIGINT AS n_exact, TRUE AS floor_met
""")
def r4_pq_recall(spark: SparkSession, d: str) -> DataFrame:
    """Recall gate for r4_pq_topk (8x16 codebooks, ADC + 8x exact
    rescore) vs exact top-k, computed in-plan so the driver sees PQ
    quality, not just row counts — the compressed-index sibling of
    r4_ivf_recall / r4_sq_recall.  Floor 0.5 matches the pytest pin
    (tests/test_pq.py::test_pq_recall_and_exact_scores); measured
    recall at this operating point (32 codewords, 16x rescore) is 0.9
    on the sf0.01 corpus, so the gate has real margin."""
    from ..operators import similarity
    from .catalog_more import _recall_summary
    emb = _t(spark, d, "embeddings")
    books = pq.pq_train(emb, k_codes=32)
    encoded = pq.pq_encode(emb, books).select("vec_id", "pq_codes")
    exact = similarity.knn_topk(emb, QUERY_VEC, k=10)
    approx = pq.pq_topk(encoded, emb, QUERY_VEC, books, k=10, rescore=16)
    return _recall_summary(exact, approx, ["vec_id"], floor=0.5)


# ===========================================================================
# Streaming: stream-static dimension enrichment (§2.10 extension)
# ===========================================================================

@register("st_enrich_join", oracle="""
SELECT e.event_id, e.user_id, c.c_name, c.c_nationkey
FROM events e LEFT JOIN customer c ON c.c_custkey = e.user_id
""")
def st_enrich_join(spark: SparkSession, d: str) -> DataFrame:
    """Stream-static join drained with availableNow: the event stream
    broadcast-joins the static customer dim per micro-batch (map-side,
    stateless, append mode — no watermark needed for enrichment).  The
    result must equal the batch LEFT JOIN exactly, which is the oracle:
    this is the streaming counterpart of r1_attribution_join's
    dimension lookup."""
    from ..streaming import pipeline as SP
    ev = SP.read_event_stream(spark, d)
    cust = _t(spark, d, "customer")
    out = SP.run_available_now(
        SP.enrich_with_customer(ev, cust)
        .select("event_id", "user_id", "c_name", "c_nationkey"),
        "st_enrich_join", output_mode="append")
    return out


@register("st_dedup_watermarked", oracle="""
SELECT DISTINCT user_id, event_type FROM events
""")
def st_dedup_watermarked(spark: SparkSession, d: str) -> DataFrame:
    """Streaming dedup with BOUNDED state:
    dropDuplicatesWithinWatermark on (user_id, event_type) — the
    watermark expires seen-key state, which is what makes streaming
    dedup survivable on an unbounded feed (plain dropDuplicates holds
    every key forever; st_dedup_stream documents that trade-off).
    Which row survives is arrival-dependent; the KEY SET is the
    deterministic contract and equals the batch DISTINCT for a full
    availableNow drain — that equality is the oracle."""
    from ..streaming import pipeline as SP
    ev = SP.read_event_stream(spark, d)
    out = SP.run_available_now(
        SP.dedup_stream_watermarked(ev).select("user_id", "event_type"),
        "st_dedup_watermarked", output_mode="append")
    return out


@register("st_incremental_rollup", oracle="""
SELECT CAST(CAST(date_trunc('day', ts) AS DATE) AS VARCHAR) AS day,
       event_type, count(*) AS n_events,
       CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT)
         AS value_scaled
FROM events GROUP BY 1, 2
""")
def st_incremental_rollup(spark: SparkSession, d: str) -> DataFrame:
    """The STREAMING half of ev_incremental_rollup: micro-batches fold
    algebraic partials into the day x type rollup store via
    foreachBatch merge-and-swap (streaming/pipeline.run_rollup_merge)
    — the continuous-aggregate maintenance loop.  A full drain must
    equal the one-shot batch rollup (the oracle); multi-epoch folding
    is pinned in tests/test_streaming.py with a 3-file source."""
    import shutil
    from ..streaming import pipeline as SP
    from .catalog_more import _scratch
    store = _scratch("st_rollup_store")
    shutil.rmtree(store, ignore_errors=True)
    ev = SP.read_event_stream(spark, d)
    SP.run_rollup_merge(ev, store)
    return SP.rollup_store_read(spark, store)


@register("st_stream_join", oracle="""
SELECT p.event_id AS purchase_id, v.event_id AS view_id, p.user_id,
       p.ts AS purchase_ts, v.ts AS view_ts
FROM events p JOIN events v
  ON v.user_id = p.user_id
 AND v.ts < p.ts AND v.ts >= p.ts - INTERVAL 30 MINUTE
WHERE p.event_type = 'purchase' AND v.event_type = 'view'
""")
def st_stream_join(spark: SparkSession, d: str) -> DataFrame:
    """STREAM-STREAM interval join drained with availableNow: purchases
    joined to the same user's views within the preceding 30 minutes,
    with event-time watermarks on both sides bounding the join state.
    The drained result must equal the batch interval self-join exactly
    — that equality is the oracle.  Companion of st_enrich_join
    (stream-static) and ev_window_join (the batch aggregated form)."""
    from ..streaming import pipeline as SP
    views = SP.read_event_stream(spark, d).filter(
        F.col("event_type") == "view")
    purchases = SP.read_event_stream(spark, d).filter(
        F.col("event_type") == "purchase")
    return SP.run_available_now(
        SP.view_purchase_join(views, purchases),
        "st_stream_join", output_mode="append")


@register("st_foreach_sink", oracle="""
SELECT event_id, user_id, event_type FROM events
""")
def st_foreach_sink(spark: SparkSession, d: str) -> DataFrame:
    """Streaming -> parquet via foreachBatch, then read the sink back:
    the drained directory must contain exactly the batch table's rows
    (the oracle).  Exercises the production sink path (checkpointed
    epochs, append-per-batch) rather than the in-memory test sink the
    other st_* entries use."""
    import shutil
    from ..streaming import pipeline as SP
    from .catalog_more import _scratch
    out = _scratch("st_foreach_sink")
    shutil.rmtree(out, ignore_errors=True)
    ev = SP.read_event_stream(spark, d) \
        .select("event_id", "user_id", "event_type")
    SP.run_foreach_parquet(ev, out)
    return spark.read.parquet(out)


@register("s18_custom_source", oracle="""
SELECT CAST(doc_id AS VARCHAR) AS page_id,
       substr(text, 1, 32) AS title, lang,
       CAST(n_chars AS BIGINT) AS n_chars, FALSE AS malformed
FROM documents
UNION ALL
SELECT NULL, NULL, NULL, NULL, TRUE
""")
def s18_custom_source(spark: SparkSession, d: str) -> DataFrame:
    """S1/S2 through the CUSTOM Python DataSource (paged_source.py):
    build a page dump from documents (Spark-written JSON-lines parts =
    the page batches, plus one malformed line), register the source,
    and read it back with spark.read.format("paged_dump").  The oracle
    is the documents projection plus exactly one malformed-marker row
    — proving executor-side page reads, the fixed no-inference schema,
    and record-level error tolerance in one pass."""
    import os
    import shutil
    from ..sources.paged_source import PagedDumpDataSource
    from .catalog_more import _scratch
    docs = _t(spark, d, "documents")
    dump = _scratch("s18_page_dump")
    shutil.rmtree(dump, ignore_errors=True)
    (docs.select(F.to_json(F.struct(
            F.col("doc_id").alias("page_id"),
            F.substring("text", 1, 32).alias("title"),
            "lang", "n_chars")).alias("value"))
     .repartition(4).write.text(dump))
    with open(os.path.join(dump, "part-zz-corrupt.txt"), "w") as fh:
        fh.write('{"page_id": broken json\n')
    # runtime-settable; reader implements pushFilters, which Spark
    # refuses to plan while this conf is off (sessions built outside
    # session.get_spark — e.g. the driver's — default it to false)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(PagedDumpDataSource)
    return spark.read.format("paged_dump").option("path", dump).load()


@register("s19_sorted_ingest", oracle="""
SELECT count(*) AS n_in_day, TRUE AS pruned
FROM events
WHERE ts >= TIMESTAMP '2024-01-03' AND ts < TIMESTAMP '2024-01-04'
""")
def s19_sorted_ingest(spark: SparkSession, d: str) -> DataFrame:
    """Ingest LAYOUT for the event log — the choice that decides scan
    cost at 100 TB: write events PARTITIONED BY event date and SORTED
    WITHIN partitions by ts (partition pruning skips whole days;
    within a day, the ts sort tightens parquet row-group min/max so
    point/range reads skip pages).  The entry writes the layout, runs
    a one-day query against it, and value-checks (a) the day's row
    count against the flat table and (b) that the physical scan
    carried a PartitionFilters entry — i.e. pruning actually planned,
    not just hoped for."""
    import shutil
    from .catalog_more import _scratch
    ev = _t(spark, d, "events")
    path = _scratch("s19_events_bydate")
    shutil.rmtree(path, ignore_errors=True)
    (ev.withColumn("event_date",
                   F.date_trunc("DAY", F.col("ts").cast("timestamp"))
                   .cast("date"))
     .repartition("event_date")
     .sortWithinPartitions("ts")
     .write.partitionBy("event_date").parquet(path))
    day = (spark.read.parquet(path)
           .filter((F.col("event_date") >= F.lit("2024-01-03"))
                   & (F.col("event_date") < F.lit("2024-01-04"))))
    plan = day._jdf.queryExecution().executedPlan().toString()
    pruned = any("PartitionFilters" in ln and "event_date" in ln
                 for ln in plan.splitlines())
    return day.agg(F.count("*").alias("n_in_day")) \
              .select("n_in_day", F.lit(pruned).alias("pruned"))


@register("st_custom_source_stream", oracle="""
SELECT CAST(doc_id AS VARCHAR) AS page_id,
       substr(text, 1, 32) AS title, lang,
       CAST(n_chars AS BIGINT) AS n_chars, FALSE AS malformed
FROM documents
""")
def st_custom_source_stream(spark: SparkSession, d: str) -> DataFrame:
    """The custom DataSource's STREAMING reader: page-batch files are
    the feed, the sorted-file index is the checkpointable offset (the
    reference's has_more cursor as an exactly-once stream —
    paged_source.PagedDumpStreamReader; offset resume pinned in
    tests/test_sources.py).  A full availableNow drain must equal the
    batch projection — the oracle."""
    import shutil
    from ..sources.paged_source import PagedDumpDataSource
    from ..streaming import pipeline as SP
    from .catalog_more import _scratch
    docs = _t(spark, d, "documents")
    dump = _scratch("st_page_dump")
    shutil.rmtree(dump, ignore_errors=True)
    (docs.select(F.to_json(F.struct(
            F.col("doc_id").alias("page_id"),
            F.substring("text", 1, 32).alias("title"),
            "lang", "n_chars")).alias("value"))
     .repartition(4).write.text(dump))
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(PagedDumpDataSource)
    stream = (spark.readStream.format("paged_dump")
              .option("path", dump).load())
    return SP.run_available_now(stream, "st_custom_source_stream",
                                output_mode="append")


@register("s20_custom_sink", oracle="""
SELECT CAST(doc_id AS VARCHAR) AS page_id,
       substr(text, 1, 32) AS title, lang,
       CAST(n_chars AS BIGINT) AS n_chars, FALSE AS malformed
FROM documents
""")
def s20_custom_sink(spark: SparkSession, d: str) -> DataFrame:
    """The custom DataSource's WRITE side: documents -> paged_dump
    writer (per-task staged page files + driver-side _MANIFEST commit,
    paged_source.PagedDumpWriter) -> read back through the
    manifest-honoring reader.  Round-trip equality with the source
    projection is the oracle; the abort/stray-file invisibility half
    of the protocol is pinned in tests/test_sources.py."""
    import shutil
    from ..sources.paged_source import PagedDumpDataSource
    from .catalog_more import _scratch
    docs = _t(spark, d, "documents")
    dump = _scratch("s20_sink_dump")
    shutil.rmtree(dump, ignore_errors=True)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(PagedDumpDataSource)
    (docs.select(
        F.col("doc_id").cast("string").alias("page_id"),
        F.substring("text", 1, 32).alias("title"),
        "lang", F.col("n_chars").cast("long").alias("n_chars"),
        F.lit(False).alias("malformed"))
     .repartition(4)
     .write.format("paged_dump").option("path", dump)
     .mode("append").save())
    return spark.read.format("paged_dump").option("path", dump).load()


@register("ev_value_histogram", oracle="""
SELECT CAST(floor(value / 50) AS INT) AS bucket,
       count(*) AS n,
       round(CAST(floor(value / 50) AS INT) * CAST(50.0 AS DOUBLE), 1)
         AS bucket_low
FROM events GROUP BY 1
""")
def ev_value_histogram(spark: SparkSession, d: str) -> DataFrame:
    """Fixed-width histogram of the event value column (bin width 50)
    — the profiling aggregate behind every dashboard distribution
    panel.  Pure map-side bucketing + one partial-agged count shuffle;
    bucket count is data-range/width regardless of corpus size.  For
    unknown ranges at 100 TB, derive the width from approx
    min/max percentiles first (one sketch pass), then this exact
    bucketed count."""
    ev = _t(spark, d, "events")
    b = F.floor(F.col("value") / 50).cast("int")
    return (ev.groupBy(b.alias("bucket"))
            .agg(F.count("*").alias("n"),
                 F.round(F.first(b) * 50.0, 1).alias("bucket_low")))


@register("s23_csv_source", oracle="""
SELECT count(*) AS n_good, CAST(1 AS BIGINT) AS n_bad,
       CAST(sum(CAST(n_chars AS BIGINT)) AS BIGINT) AS sum_chars
FROM documents
""")
def s23_csv_source(spark: SparkSession, d: str) -> DataFrame:
    """CSV round trip with PERMISSIVE corrupt capture — the third
    mainstream landing format next to parquet (native) and JSON-lines
    (sources/json_dump.py).  Documents are written as quoted CSV, a
    malformed line is appended, and the read-back uses an EXPLICIT
    schema (no inference pass) with _corrupt_record capture: good
    rows and their n_chars sum must equal the source table, the bad
    line must land in the corrupt channel, not fail the scan.  At
    100 TB: explicit schema + multiLine=false keeps CSV splittable by
    newline; the quote/escape options are the correctness surface."""
    import os
    import shutil
    from .catalog_more import _scratch
    docs = _t(spark, d, "documents")
    path = _scratch("s23_csv")
    shutil.rmtree(path, ignore_errors=True)
    (docs.select("doc_id", "text", "lang", "n_chars")
     .write.option("header", "false").option("quoteAll", "true")
     .csv(path))
    with open(os.path.join(path, "part-zz-bad.csv"), "w") as fh:
        fh.write('"not,a,number","x","en","NaNope"\n')
    schema = ("doc_id long, text string, lang string, n_chars long, "
              "_corrupt_record string")
    back = (spark.read.schema(schema)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt_record")
            .csv(path)).cache()
    good = back.filter(F.col("_corrupt_record").isNull()
                       & F.col("doc_id").isNotNull())
    bad = back.filter(F.col("_corrupt_record").isNotNull())
    return good.agg(F.count("*").alias("n_good")) \
        .crossJoin(F.broadcast(bad.agg(F.count("*").alias("n_bad")))) \
        .crossJoin(F.broadcast(good.agg(
            F.sum("n_chars").cast("long").alias("sum_chars"))))


@register("s17_compact", oracle="""
SELECT count(*) AS n_docs, TRUE AS compacted, 2 AS files_after
FROM documents
""")
def s17_compact(spark: SparkSession, d: str) -> DataFrame:
    """Small-files compaction — the table-maintenance op every
    streaming ingest needs (micro-batch appends leave thousands of
    KB-sized files; scan cost at 100 TB is dominated by file-open
    overhead until they're rewritten).  Shatter documents into a
    many-files layout, compact with repartition(target), and
    value-check in-plan that (a) zero rows were lost (n_docs) and
    (b) the file count actually dropped (compacted flag from real
    directory listings).  In production the target is
    size-based — repartition(ceil(bytes / 128MB)) with
    maxRecordsPerFile as the guard — and the rewrite is per-partition
    so compaction never touches cold data."""
    import glob
    import shutil
    from .catalog_more import _scratch
    docs = _t(spark, d, "documents")
    small_dir, packed = _scratch("s17_small"), _scratch("s17_packed")
    shutil.rmtree(small_dir, ignore_errors=True)
    shutil.rmtree(packed, ignore_errors=True)
    docs.repartition(64).write.parquet(small_dir)
    spark.read.parquet(small_dir).repartition(2).write.parquet(packed)
    n_before = len(glob.glob(f"{small_dir}/part-*.parquet"))
    n_after = len(glob.glob(f"{packed}/part-*.parquet"))
    return (spark.read.parquet(packed)
            .agg(F.count("*").alias("n_docs"))
            .select("n_docs",
                    F.lit(n_after < n_before).alias("compacted"),
                    F.lit(n_after).alias("files_after")))


# ===========================================================================
# Warehouse-style event ops: SCD2 islands, multi-granularity rollup
# ===========================================================================

@register("ev_multitouch_attribution", oracle="""
WITH p AS (SELECT event_id, user_id, ts FROM events
           WHERE event_type = 'purchase'),
     t AS (SELECT user_id, event_id, event_type, ts FROM events
           WHERE event_type IN ('view', 'click')),
matched AS (
  SELECT p.event_id AS purchase_id, t.event_id AS touch_id,
         t.event_type, p.ts AS p_ts, t.ts AS t_ts
  FROM p JOIN t
    ON t.user_id = p.user_id
   AND t.ts < p.ts AND t.ts >= p.ts - INTERVAL 60 MINUTE
), credited AS (
  SELECT purchase_id, touch_id, event_type,
         1.0 / count(*) OVER (PARTITION BY purchase_id) AS linear_w,
         CAST(floor(epoch(p_ts) - epoch(t_ts)) AS BIGINT) AS age_s
  FROM matched
)
SELECT event_type,
       round(sum(linear_w), 4) AS linear_credit,
       round(sum(exp(-age_s / 1800.0)), 4) AS decay_credit,
       count(*) AS n_touches
FROM credited GROUP BY event_type
""")
def ev_multitouch_attribution(spark: SparkSession, d: str) -> DataFrame:
    """Multi-touch marketing attribution: every view/click in the hour
    before a purchase shares that purchase's credit — LINEAR (1/n per
    touch) and TIME-DECAY (exp(-age/30min)) models side by side,
    rolled up by channel (event_type).  The single-touch as-of join
    (ev_asof_join) is the k=1 special case.

    Plan: the same gap-bucketed equi-join strategy as ev_window_join
    (no inequality-join fallback), then a per-purchase window for the
    1/n weights and one small rollup.  Shuffles: (user, bucket) for
    the match, purchase_id for the credit split — both uniform.  At
    100 TB the credited rows are touches-within-window, output-
    proportional, never |events| x |events|."""
    gap_us = 3600 * 1_000_000
    ev = _t(spark, d, "events")
    p = (ev.filter(F.col("event_type") == "purchase")
         .select(F.col("event_id").alias("purchase_id"),
                 F.col("user_id"),
                 F.unix_micros(F.col("ts").cast("timestamp"))
                 .alias("p_us")))
    p = p.withColumn(
        "bucket", F.explode(F.array(F.floor(F.col("p_us") / gap_us),
                                    F.floor(F.col("p_us") / gap_us) - 1)))
    t = (ev.filter(F.col("event_type").isin("view", "click"))
         .select(F.col("user_id").alias("t_user"),
                 F.col("event_id").alias("touch_id"),
                 F.col("event_type"),
                 F.unix_micros(F.col("ts").cast("timestamp"))
                 .alias("t_us")))
    t = t.withColumn("bucket", F.floor(F.col("t_us") / gap_us))
    matched = p.join(
        t, (p["user_id"] == t["t_user"]) & (p["bucket"] == t["bucket"])
        & (F.col("t_us") < F.col("p_us"))
        & (F.col("t_us") >= F.col("p_us") - gap_us), "inner")
    wp = Window.partitionBy("purchase_id")
    credited = (matched
                .select("purchase_id", "touch_id", "event_type",
                        ((F.col("p_us") - F.col("t_us"))
                         / 1_000_000).cast("long").alias("age_s"))
                .withColumn("linear_w", F.lit(1.0) / F.count("*").over(wp)))
    return (credited.groupBy("event_type")
            .agg(F.round(F.sum("linear_w"), 4).alias("linear_credit"),
                 F.round(F.sum(F.exp(-F.col("age_s") / 1800.0)), 4)
                 .alias("decay_credit"),
                 F.count("*").alias("n_touches")))


@register("ta_zipf_slope", oracle=f"""
WITH toks AS (
  SELECT unnest({OV.tokens_sql('text')}) AS t FROM documents
), freq AS (
  SELECT t, count(*) AS c FROM toks GROUP BY t
), ranked AS (
  SELECT c, row_number() OVER (ORDER BY c DESC, t) AS r FROM freq
), logs AS (
  SELECT ln(r) AS lr, ln(c) AS lc FROM ranked
)
SELECT count(*) AS n_types,
       round(regr_slope(lc, lr), 4) AS zipf_slope
FROM logs
""")
def ta_zipf_slope(spark: SparkSession, d: str) -> DataFrame:
    """Zipf-law fit over the corpus token frequencies: the OLS slope
    of ln(freq) on ln(rank) — natural text sits near -1; template
    spam, id dumps, and synthetic word soup drift far from it, making
    the slope a one-number corpus-health diagnostic (and this corpus
    IS synthetic word soup, which the value shows).  Slope computed
    from covariance/variance aggregates (regr_slope's definition), so
    the whole fit is one pass over the type table after the frequency
    count — no driver-side regression.  Rank ties break on token for
    engine-identical ordering."""
    docs = _t(spark, d, "documents")
    freq = (docs.select(F.explode(dedup.tokens(F.col("text"))).alias("t"))
            .groupBy("t").agg(F.count("*").alias("c")))
    w = Window.orderBy(F.desc("c"), F.col("t"))
    logs = freq.select(
        F.log(F.row_number().over(w).cast("double")).alias("lr"),
        F.log(F.col("c").cast("double")).alias("lc"))
    return logs.agg(
        F.count("*").alias("n_types"),
        F.round(F.covar_pop("lc", "lr") / F.var_pop("lr"), 4)
        .alias("zipf_slope"))


@register("flagship_valuecheck", oracle=FL.flagship_oracle_sql())
def flagship_valuecheck(spark: SparkSession, d: str) -> DataFrame:
    """The FLAGSHIP pipeline value-checked end to end: the same
    clean -> quality gate -> chunk -> hash-embed -> cosine top-k ->
    attribution DAG behind entry(), compared against a full DuckDB
    replication (chunking, per-chunk hash-embed components, cosine
    from raw integer components, attribution + quality recompute).
    Every stage was already oracled in isolation (t2/m1/m3/r4/r1);
    this pins their COMPOSITION — join keys, filter placement, score
    normalization — as one value-hashed result."""
    from .flagship import flagship_search
    out = flagship_search(spark, d, k=10, dim=64)
    return out.select("chunk_id", "doc_id", "content", "score",
                      "source_type", "doc_lang",
                      F.round("quality_score", 6).alias("quality_score"))


@register("m1_chunk_udtf", oracle=O.chunk_fixed_sql())
def m1_chunk_udtf(spark: SparkSession, d: str) -> DataFrame:
    """The fixed-stride chunker as a PYTHON UDTF (Spark 4
    user-defined table function): one input row lateral-joins to N
    chunk rows produced by plain Python — the API for row-expanding
    logic too imperative for expressions but too row-local for
    applyInPandas.  Same semantics (and the SAME oracle) as
    m1_chunk_fixed's pure-expression form, so the two execution
    strategies are pinned to one contract; the expression form stays
    the production path (codegen, no Python workers), the UDTF is
    the extensibility point a user plugs custom splitters into."""
    import hashlib
    import re

    from pyspark.sql.functions import udtf
    from ..functions.text import CLEAN_RULES

    rules = tuple(CLEAN_RULES)

    @udtf(returnType="chunk_id string, doc_id long, content string, "
                     "chunk_index int, start_char int, end_char int, "
                     "word_count int")
    class ChunkFixed:
        def eval(self, doc_id, text):
            s = text or ""
            for pat, rep in rules:
                s = re.sub(pat, rep, s)
            size, stride, min_chars = 1000, 800, 50
            n = 0 if not s else (len(s) - 1) // stride + 1
            for i in range(n):
                raw = s[i * stride: i * stride + size]
                content = re.sub(r"^\s+|\s+$", "", raw)
                if len(content) < min_chars:
                    continue
                cid = hashlib.md5(
                    f"{doc_id}_{i}_{raw[:100]}".encode()).hexdigest()
                yield (cid, doc_id, content, i, i * stride,
                       i * stride + len(raw), len(content.split()))

    spark.udtf.register("pgrs_chunk_fixed", ChunkFixed)
    _t(spark, d, "documents").createOrReplaceTempView("__pgrs_docs_udtf")
    return spark.sql("""
        SELECT c.* FROM __pgrs_docs_udtf d,
        LATERAL pgrs_chunk_fixed(d.doc_id, d.text) c
    """)


@register("s25_user_erasure", oracle="""
WITH victims AS (
  SELECT DISTINCT user_id FROM events WHERE user_id % 97 = 0
)
SELECT 'customer' AS tbl,
       (SELECT count(*) FROM customer) AS n_before,
       (SELECT count(*) FROM customer
        WHERE c_custkey IN (SELECT user_id FROM victims)) AS n_removed,
       CAST(0 AS BIGINT) AS n_residue
UNION ALL
SELECT 'events',
       (SELECT count(*) FROM events),
       (SELECT count(*) FROM events
        WHERE user_id IN (SELECT user_id FROM victims)),
       CAST(0 AS BIGINT)
""")
def s25_user_erasure(spark: SparkSession, d: str) -> DataFrame:
    """Right-to-be-forgotten erasure across tables: a deterministic
    victim set (user_id % 97 == 0) is removed from every table that
    references it (customer by key, events by FK) via LEFT ANTI joins
    — the cascading-delete pattern (S11) generalized cross-table —
    and the RESIDUE CHECK re-scans the survivors for any victim row,
    pinned to zero.  Per-table before/removed/residue counts are all
    value-checked.  At 100 TB the anti-join is the only correct shape
    (per-row deletes don't exist on immutable files); with partition/
    bucket layout on the key the rewrite touches only victim
    partitions (upsert_partitions), and a table format turns it into
    DELETE WHERE."""
    ev = _t(spark, d, "events")
    cust = _t(spark, d, "customer")
    victims = (ev.filter(F.col("user_id") % 97 == 0)
               .select("user_id").distinct())

    def erase(df: DataFrame, key: str, tbl: str) -> DataFrame:
        keyed = df.withColumn("__k", F.col(key))
        vic = victims.select(F.col("user_id").alias("__k"))
        survivors = keyed.join(vic, "__k", "left_anti")
        residue = survivors.join(vic, "__k", "left_semi")
        return (df.agg(F.count("*").alias("n_before"))
                .crossJoin(F.broadcast(
                    keyed.join(vic, "__k", "left_semi")
                    .agg(F.count("*").alias("n_removed"))))
                .crossJoin(F.broadcast(
                    residue.agg(F.count("*").alias("n_residue"))))
                .select(F.lit(tbl).alias("tbl"), "n_before",
                        "n_removed", "n_residue"))

    return erase(cust, "c_custkey", "customer") \
        .unionByName(erase(ev, "user_id", "events"))


@register("s24_versioned_read", oracle="""
SELECT 'v1_asof' AS which,
       (SELECT count(*) FROM documents WHERE doc_id % 2 = 0) AS n_rows,
       (SELECT CAST(sum(doc_id) AS BIGINT) FROM documents
        WHERE doc_id % 2 = 0) AS id_sum
UNION ALL
SELECT 'v2_latest',
       (SELECT count(*) FROM documents),
       (SELECT CAST(sum(doc_id) AS BIGINT) FROM documents)
""")
def s24_versioned_read(spark: SparkSession, d: str) -> DataFrame:
    """SNAPSHOT VERSIONING + time travel on plain parquet
    (sources.tables.write_version/read_version): v1 = the even-doc
    snapshot, v2 = the full corpus; an as-of-1 read must return
    exactly v1 and the default read exactly v2 — both pinned by row
    count and id checksum.  Writers land immutable ``v=N`` snapshot
    dirs, so readers are never torn; a table format swaps the
    directory convention for commit logs with the same read API."""
    import shutil
    from ..sources import tables as TB
    from .catalog_more import _scratch
    docs = _t(spark, d, "documents")
    store = _scratch("s24_versions")
    shutil.rmtree(store, ignore_errors=True)
    TB.write_version(docs.filter(F.col("doc_id") % 2 == 0), store, 1)
    TB.write_version(docs, store, 2)

    def summarize(df: DataFrame, which: str) -> DataFrame:
        return df.agg(F.count("*").alias("n_rows"),
                      F.sum("doc_id").cast("long").alias("id_sum")) \
            .select(F.lit(which).alias("which"), "n_rows", "id_sum")

    asof = summarize(TB.read_version(spark, store, as_of=1), "v1_asof")
    latest = summarize(TB.read_version(spark, store), "v2_latest")
    return asof.unionByName(latest)


@register("dq_rules", oracle="""
SELECT 'documents.lang_in_domain' AS rule,
       (SELECT count(*) FROM documents) AS n_checked,
       (SELECT count(*) FROM documents
        WHERE lang NOT IN ('en', 'zh', 'de', 'fr', 'es')) AS n_violations
UNION ALL
SELECT 'documents.n_chars_consistent',
       (SELECT count(*) FROM documents),
       (SELECT count(*) FROM documents WHERE n_chars <> length(text))
UNION ALL
SELECT 'events.user_fk_in_customer',
       (SELECT count(*) FROM events),
       (SELECT count(*) FROM events e
        WHERE NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = e.user_id))
UNION ALL
SELECT 'events.value_non_negative',
       (SELECT count(*) FROM events),
       (SELECT count(*) FROM events WHERE value < 0)
""")
def dq_rules(spark: SparkSession, d: str) -> DataFrame:
    """Declarative DATA-QUALITY rules (the dbt-test / Deequ
    constraint-suite pattern): domain checks, derived-column
    consistency, non-negativity, and a CROSS-TABLE referential check
    (every event's user_id must exist in customer — an anti-join, so
    the FK validation scales like the delete path, not like a
    per-row lookup).  Per-rule checked/violation counts, every number
    value-pinned; a clean corpus proves zeros, and the rules-fire
    direction is pinned in tests with injected violations.  In
    production the violations frame (not just counts) routes to a
    quarantine table — same plans minus the final agg."""
    docs = _t(spark, d, "documents")
    ev = _t(spark, d, "events")
    cust = _t(spark, d, "customer").select(
        F.col("c_custkey").alias("user_id"))

    def rule(name: str, checked: DataFrame, violated: DataFrame):
        return (checked.agg(F.count("*").alias("n_checked"))
                .crossJoin(F.broadcast(
                    violated.agg(F.count("*").alias("n_violations"))))
                .select(F.lit(name).alias("rule"), "n_checked",
                        "n_violations"))

    langs = ["en", "zh", "de", "fr", "es"]
    r1 = rule("documents.lang_in_domain", docs,
              docs.filter(~F.col("lang").isin(langs)))
    r2 = rule("documents.n_chars_consistent", docs,
              docs.filter(F.col("n_chars") != F.length("text")))
    r3 = rule("events.user_fk_in_customer", ev,
              ev.join(cust, "user_id", "left_anti"))
    r4 = rule("events.value_non_negative", ev,
              ev.filter(F.col("value") < 0))
    return r1.unionByName(r2).unionByName(r3).unionByName(r4)


@register("obs_pipeline_metrics", oracle=f"""
SELECT count(*) AS n_docs,
       CAST(sum(CASE WHEN text IS NULL OR length(text) = 0
                THEN 1 ELSE 0 END) AS BIGINT) AS n_empty,
       CAST(sum(CAST(n_chars AS BIGINT)) AS BIGINT) AS total_chars,
       (SELECT count(*) FROM (
          SELECT 1 FROM documents
          WHERE ({O.quality_sql('text')}) >= 0.3)) AS n_quality_pass
FROM documents
""")
def obs_pipeline_metrics(spark: SparkSession, d: str) -> DataFrame:
    """DATA-QUALITY OBSERVERS via df.observe/Observation: pipeline
    health metrics (row count, empty-text count, char volume, quality
    pass count) collected AS A SIDE EFFECT of the job that processes
    the data — zero extra scans, the accumulator-based pattern
    production pipelines attach to every ingest.  The observed values
    are returned as a one-row frame and value-checked against direct
    SQL aggregation — proving the observer sees every row exactly
    once (observe() metrics are task-retry-safe, unlike raw
    accumulators)."""
    from pyspark.sql import Observation
    docs = _t(spark, d, "documents")
    q = X.quality_components(F.col("text"))["quality_score"]
    obs = Observation()
    observed = docs.observe(
        obs,
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("text").isNull()
                     | (F.length("text") == 0), 1).otherwise(0))
        .cast("long").alias("n_empty"),
        F.sum(F.col("n_chars").cast("long")).alias("total_chars"),
        F.sum(F.when(q >= 0.3, 1).otherwise(0)).cast("long")
        .alias("n_quality_pass"))
    observed.count()   # the "real job" the metrics piggyback on
    m = obs.get
    return spark.createDataFrame(
        [(m["n_docs"], m["n_empty"], m["total_chars"],
          m["n_quality_pass"])],
        "n_docs long, n_empty long, total_chars long, "
        "n_quality_pass long")


@register("s14_storage_stats", oracle="""
SELECT (SELECT count(*) FROM documents) AS document_count,
       (SELECT count(*) FROM documents) AS chunk_count,
       (SELECT count(*) FROM events) AS event_count,
       (SELECT count(*) FROM embeddings) AS embedding_count,
       TRUE AS healthy
""")
def s14_storage_stats(spark: SparkSession, d: str) -> DataFrame:
    """S14 storage stats driver-visible (reference
    vector_store.py:344-379: collection counts + index list + health
    ping): row counts per store plus a health flag (every table
    readable and non-empty).  One count job per table — in production
    these read catalog/table-metadata statistics instead of scanning
    (parquet footers carry row counts; the counts here ARE
    footer-served by Spark's count optimization)."""
    from ..sources import tables as TB
    docs = _t(spark, d, "documents")
    stats = TB.storage_stats(docs, docs)   # chunks table == docs here
    ev = _t(spark, d, "events").agg(
        F.count("*").alias("event_count"))
    emb = _t(spark, d, "embeddings").agg(
        F.count("*").alias("embedding_count"))
    out = stats.crossJoin(F.broadcast(ev)).crossJoin(F.broadcast(emb))
    return out.select(
        "*",
        ((F.col("document_count") > 0) & (F.col("event_count") > 0)
         & (F.col("embedding_count") > 0)).alias("healthy"))


@register("mm_modality_router", oracle="""
SELECT 'audio' AS modality, count(*) AS n_items,
       CAST(sum(1 + greatest(0, ((n_chars * 100) - 16000 + 7999) // 8000))
            AS BIGINT) AS n_units
FROM documents WHERE doc_id % 3 = 1
UNION ALL
SELECT 'image', count(*), CAST(count(*) AS BIGINT)
FROM documents WHERE doc_id % 3 = 0
UNION ALL
SELECT 'video', count(*),
       CAST(sum(least(5, greatest(ceil(n_chars / 100.0)::INT, 1)))
            AS BIGINT)
FROM documents WHERE doc_id % 3 = 2
""")
def mm_modality_router(spark: SparkSession, d: str) -> DataFrame:
    """MIXED-modality ingestion routing: one corpus fans out to
    per-modality processing branches — images through the mapInPandas
    decoder, audio through the window planner, video through the
    frame sampler — and the branch outputs union into one per-modality
    work summary (items in, processing units out).  This is the shape
    a real multimodal landing zone runs every batch; each branch is
    the already-oracled operator (mm_decode_features /
    mm_audio_windows / mm_frame_sample), so the router adds routing,
    not new semantics.  Branch filters push into the shared scan; no
    branch shuffles until its own summary agg."""
    from ..operators import multimodal
    docs = _t(spark, d, "documents")
    img = multimodal.decode_features(
        multimodal.attach_binary(docs.filter(F.col("doc_id") % 3 == 0)))
    aud = multimodal.audio_windows(
        docs.filter(F.col("doc_id") % 3 == 1)
        .select("doc_id", (F.col("n_chars") * 100).cast("long")
                .alias("n_samples")))
    vid = multimodal.frame_sample(
        docs.filter(F.col("doc_id") % 3 == 2)
        .select("doc_id", (F.col("n_chars") / 100.0).alias("duration_s")))

    def summary(df: DataFrame, modality: str) -> DataFrame:
        return df.agg(
            F.countDistinct("doc_id").alias("n_items"),
            F.count("*").alias("n_units")) \
            .select(F.lit(modality).alias("modality"),
                    F.col("n_items").cast("long").alias("n_items"),
                    F.col("n_units").cast("long").alias("n_units"))

    return (summary(img, "image")
            .unionByName(summary(aud, "audio"))
            .unionByName(summary(vid, "video")))


@register("ev_seasonality", oracle="""
SELECT CAST(dayofweek(ts) + 1 AS INT) AS dow,
       CAST(hour(ts) AS INT) AS hour_of_day,
       count(*) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY 1, 2
""")
def ev_seasonality(spark: SparkSession, d: str) -> DataFrame:
    """Seasonality profile: the day-of-week x hour-of-day activity
    matrix (events + distinct users per cell) — capacity planning and
    anomaly-baseline input (ev_anomaly_zscore's daily baseline is this
    matrix's row sums).  One partial-agged shuffle; output is a fixed
    7x24 grid at any scale.  DOW convention: Sunday=1 in both engines
    (Spark dayofweek == DuckDB dayofweek+... pinned by the oracle
    hash, which is the point of checking it)."""
    ev = _t(spark, d, "events")
    ts = F.col("ts").cast("timestamp")
    return (ev.groupBy(
        F.dayofweek(ts).cast("int").alias("dow"),
        F.hour(ts).cast("int").alias("hour_of_day"))
        .agg(F.count("*").alias("n_events"),
             F.countDistinct("user_id").alias("n_users")))


@register("t14_dedup_aware_sample", oracle=f"""
WITH pairs AS ({{NGRAM_PAIRS}}),
dups AS (
  SELECT DISTINCT greatest(id_a, id_b) AS doc_id FROM pairs
), keepers AS (
  SELECT d.doc_id, d.source FROM documents d
  LEFT JOIN dups USING (doc_id) WHERE dups.doc_id IS NULL
)
SELECT doc_id, source FROM keepers
WHERE ('0x' || substr(md5(doc_id::VARCHAR || ':sample'), 1, 8))::BIGINT
      % 100 < 10
""".replace("{NGRAM_PAIRS}", OV.ngram_pairs_sql(0.5).strip()))
def t14_dedup_aware_sample(spark: SparkSession, d: str) -> DataFrame:
    """Pipeline chaining the way a curation run actually orders it:
    DEDUP FIRST, THEN SAMPLE — sampling before dedup biases the
    sample toward duplicated content (a doc with 5 near-copies is 5x
    as likely to survive).  Composition of dd_keepers (min-id-wins
    drop set) and t9_hash_sample's deterministic 10% hash gate, both
    already oracled alone; the composition pins the anti-join + gate
    ordering."""
    docs = _t(spark, d, "documents")
    pairs = dedup.ngram_jaccard_pairs_index(docs)
    flagged = dedup.dedup_keepers(pairs, docs)
    keepers = flagged.filter(~F.col("is_near_dup")) \
        .select("doc_id").join(docs, "doc_id")
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.concat(F.col("doc_id").cast("string"),
                                          F.lit(":sample"))), 1, 8),
               16, 10).cast("long"), F.lit(100))
    return keepers.filter(bucket < 10).select("doc_id", "source")


@register("ev_active_users", oracle="""
WITH days AS (
  SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day, user_id
  FROM events
), dau AS (
  SELECT day, count(*) AS dau FROM days GROUP BY day
), mau AS (
  SELECT d.day, count(DISTINCT e.user_id) AS mau
  FROM (SELECT DISTINCT day FROM days) d
  JOIN days e ON e.day > d.day - INTERVAL 28 DAY AND e.day <= d.day
  GROUP BY d.day
)
SELECT CAST(dau.day AS VARCHAR) AS day, dau.dau, mau.mau,
       round(dau.dau * 1.0 / mau.mau, 6) AS stickiness
FROM dau JOIN mau ON dau.day = mau.day
""")
def ev_active_users(spark: SparkSession, d: str) -> DataFrame:
    """DAU / trailing-28-day MAU / stickiness per day — the
    engagement dashboard's headline numbers.  The MAU needs distinct
    users over a SLIDING window, which doesn't decompose into daily
    partials (distinct isn't algebraic) — the scale-correct plan
    collapses events to distinct (day, user) FIRST (the only pass
    over raw events), then the day-range self-join runs on
    days x users rows, and each day counts its trailing window.  At
    100 TB swap the exact distinct for per-day HLL sketches, which DO
    merge across the window (a5_approx_gate pins that error
    pattern)."""
    ev = _t(spark, d, "events")
    days = (ev.select(
        F.date_trunc("DAY", F.col("ts").cast("timestamp"))
        .cast("date").alias("day"), "user_id").distinct())
    dau = days.groupBy("day").agg(F.count("*").alias("dau"))
    day_list = days.select("day").distinct() \
        .select(F.col("day").alias("ref_day"))
    mau = (day_list.join(
        days,
        (F.col("day") > F.date_sub(F.col("ref_day"), 28))
        & (F.col("day") <= F.col("ref_day")))
        .groupBy("ref_day")
        .agg(F.countDistinct("user_id").alias("mau")))
    return (dau.join(mau, dau.day == mau.ref_day)
            .select(F.col("day").cast("string").alias("day"),
                    "dau", "mau",
                    F.round(F.col("dau") / F.col("mau"), 6)
                    .alias("stickiness")))


@register("ev_active_users_hll", oracle="""
WITH days AS (
  SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day, user_id
  FROM events
), dau AS (
  SELECT day, count(*) AS dau FROM days GROUP BY day
), mau AS (
  SELECT d.day, count(DISTINCT e.user_id) AS mau_exact
  FROM (SELECT DISTINCT day FROM days) d
  JOIN days e ON e.day > d.day - INTERVAL 28 DAY AND e.day <= d.day
  GROUP BY d.day
)
SELECT CAST(dau.day AS VARCHAR) AS day, dau.dau, mau.mau_exact,
       TRUE AS mau_within_5pct
FROM dau JOIN mau ON dau.day = mau.day
""")
def ev_active_users_hll(spark: SparkSession, d: str) -> DataFrame:
    """The sliding-MAU at ACTUAL scale: per-day DataSketches HLL
    sketches (hll_sketch_agg — ONE pass over events), then
    hll_union_agg as a WINDOW over the trailing 28 day-rows and an
    estimate — sketches merge where exact distinct cannot, so the
    sliding distinct costs days x sketch-bytes instead of a day-range
    self-join over users (ev_active_users' exact form, which is this
    entry's in-plan truth).  The 5% error gate is value-pinned by the
    oracle, a la a5_approx_gate; exact DAU and exact MAU ride along
    value-checked."""
    ev = _t(spark, d, "events")
    days = (ev.select(
        F.date_trunc("DAY", F.col("ts").cast("timestamp"))
        .cast("date").alias("day"), "user_id").distinct())
    days.createOrReplaceTempView("__pgrs_days_hll")
    return spark.sql("""
        WITH daily AS (
          SELECT day, count(*) AS dau,
                 hll_sketch_agg(user_id) AS sk
          FROM __pgrs_days_hll GROUP BY day
        ), est AS (
          SELECT day, dau,
                 hll_sketch_estimate(hll_union_agg(sk) OVER
                   (ORDER BY day ROWS BETWEEN 27 PRECEDING AND CURRENT ROW))
                   AS mau_est
          FROM daily
        ), exact AS (
          SELECT d.day, count(DISTINCT e.user_id) AS mau_exact
          FROM (SELECT DISTINCT day FROM __pgrs_days_hll) d
          JOIN __pgrs_days_hll e
            ON e.day > d.day - INTERVAL 28 DAY AND e.day <= d.day
          GROUP BY d.day
        )
        SELECT CAST(est.day AS STRING) AS day, est.dau, exact.mau_exact,
               (abs(est.mau_est - exact.mau_exact) / exact.mau_exact)
                 <= 0.05 AS mau_within_5pct
        FROM est JOIN exact ON est.day = exact.day
    """)


@register("ev_error_bursts", oracle="""
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_err,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS rn,
         row_number() OVER (PARTITION BY user_id,
                            CASE WHEN event_type = 'error'
                                 THEN 1 ELSE 0 END
                            ORDER BY ts, event_id) AS rn_in_kind
  FROM events
), runs AS (
  SELECT user_id, rn - rn_in_kind AS grp, count(*) AS streak
  FROM flagged WHERE is_err = 1
  GROUP BY user_id, rn - rn_in_kind
)
SELECT CAST(streak AS INT) AS streak_len,
       count(*) AS n_bursts,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM runs GROUP BY streak
""")
def ev_error_bursts(spark: SparkSession, d: str) -> DataFrame:
    """Error-burst detection: lengths of CONSECUTIVE error runs per
    user via the classic rn-difference gaps-and-islands trick (two
    row_numbers, no lag state) — the SRE read that separates isolated
    failures from cascades.  Output: burst-length histogram with
    affected-user counts.  Both window ranks key on user_id; one
    shuffle, metadata-scale output."""
    ev = _t(spark, d, "events")
    is_err = F.when(F.col("event_type") == "error", 1).otherwise(0)
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.withColumn("is_err", is_err) \
        .withColumn("rn", F.row_number().over(w_all))
    w_kind = Window.partitionBy("user_id", "is_err") \
        .orderBy("ts", "event_id")
    flagged = flagged.withColumn("rn_in_kind",
                                 F.row_number().over(w_kind))
    runs = (flagged.filter(F.col("is_err") == 1)
            .groupBy("user_id",
                     (F.col("rn") - F.col("rn_in_kind")).alias("grp"))
            .agg(F.count("*").alias("streak")))
    return (runs.groupBy(F.col("streak").cast("int").alias("streak_len"))
            .agg(F.count("*").alias("n_bursts"),
                 F.countDistinct("user_id").cast("long").alias("n_users"))
            .orderBy("streak_len"))


@register("dd_cluster_sizes", oracle=f"""
WITH RECURSIVE pairs AS MATERIALIZED ({{PAIRS}}),
edges AS MATERIALIZED (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION SELECT id_b, id_a FROM pairs
),
reach(src, dst) AS (
  SELECT src, dst FROM edges
  UNION SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
),
comp AS (
  SELECT d.doc_id,
         least(d.doc_id, coalesce(min(r.dst), d.doc_id)) AS component
  FROM documents d LEFT JOIN reach r ON r.src = d.doc_id
  GROUP BY d.doc_id
),
sizes AS (
  SELECT component, count(*) AS cluster_size FROM comp GROUP BY component
)
SELECT CAST(cluster_size AS INT) AS cluster_size,
       count(*) AS n_clusters,
       CAST(sum(cluster_size) AS BIGINT) AS n_docs
FROM sizes GROUP BY cluster_size
""".replace("{PAIRS}", OV.ngram_pairs_sql(0.5).strip()))
def dd_cluster_sizes(spark: SparkSession, d: str) -> DataFrame:
    """Near-dup CLUSTER SIZE histogram over the exact components
    (dd_components' output aggregated): how much of the corpus sits
    in singletons vs 2-clusters vs boilerplate blobs — the
    distribution that decides dedup policy (drop-all-but-one is safe
    for pairs, but a 10k-doc cluster is template spam needing its own
    treatment).  Two metadata-scale aggs on top of the converged
    labels."""
    docs = _t(spark, d, "documents")
    pairs = dedup.ngram_jaccard_pairs_index(docs)
    comp = dedup.connected_components(pairs, docs)
    sizes = comp.groupBy("component").agg(
        F.count("*").alias("cluster_size"))
    return (sizes.groupBy(F.col("cluster_size").cast("int")
                          .alias("cluster_size"))
            .agg(F.count("*").alias("n_clusters"),
                 F.sum("cluster_size").cast("long").alias("n_docs")))


@register("a14_null_profile", oracle="""
SELECT count(*) AS n_rows,
       CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS null_text,
       CAST(sum(CASE WHEN text IS NOT NULL AND trim(text) = ''
                THEN 1 ELSE 0 END) AS BIGINT) AS blank_text,
       CAST(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS null_lang,
       CAST(sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS null_source,
       CAST(sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS null_n_chars
FROM documents
""")
def a14_null_profile(spark: SparkSession, d: str) -> DataFrame:
    """Column completeness profile (the df.summary()-style read every
    ingest dashboard starts with): null counts per column plus the
    blank-but-not-null text count that null rates hide.  One
    conditional-sum pass — at 100 TB this is the cheapest full-table
    statement possible, and its numbers calibrate the dq_rules
    thresholds."""
    docs = _t(spark, d, "documents")
    nul = lambda c: F.sum(  # noqa: E731
        F.when(F.col(c).isNull(), 1).otherwise(0)).cast("long")
    return docs.agg(
        F.count("*").alias("n_rows"),
        nul("text").alias("null_text"),
        F.sum(F.when(F.col("text").isNotNull()
                     & (F.trim("text") == ""), 1).otherwise(0))
        .cast("long").alias("blank_text"),
        nul("lang").alias("null_lang"),
        nul("source").alias("null_source"),
        nul("n_chars").alias("null_n_chars"))


@register("t18_minmax_normalize", oracle="""
WITH scaled AS (
  SELECT event_type, CAST(round(value * 10000) AS BIGINT) AS v
  FROM events
), bounds AS (
  SELECT event_type, min(v) AS lo, max(v) AS hi FROM scaled
  GROUP BY event_type
)
SELECT s.event_type,
       CAST(min(b.lo) AS BIGINT) AS lo_scaled,
       CAST(max(b.hi) AS BIGINT) AS hi_scaled,
       round(avg(CASE WHEN b.hi = b.lo THEN 0.0
                      ELSE (s.v - b.lo) * 1.0 / (b.hi - b.lo) END), 6)
         AS mean_normalized
FROM scaled s JOIN bounds b ON b.event_type = s.event_type
GROUP BY s.event_type
""")
def t18_minmax_normalize(spark: SparkSession, d: str) -> DataFrame:
    """Min-max feature normalization per event type — the scaling
    step before any distance-based model consumes the value column
    (cosine/knn treat unscaled features as implicit weights).  Bounds
    on integer-scaled values (exact, like sq_bounds for vectors), the
    degenerate zero-range group guarded to 0; output pins the bounds
    and the normalized mean per type.  One partial-agged bounds pass +
    one broadcast join back — the classic two-pass scaler."""
    ev = _t(spark, d, "events")
    scaled = ev.select(
        "event_type",
        F.round(F.col("value") * 10000).cast("long").alias("v"))
    bounds = (scaled.groupBy("event_type")
              .agg(F.min("v").alias("lo"), F.max("v").alias("hi")))
    j = scaled.join(F.broadcast(bounds), "event_type")
    norm = F.when(F.col("hi") == F.col("lo"), F.lit(0.0)) \
        .otherwise((F.col("v") - F.col("lo"))
                   / (F.col("hi") - F.col("lo")))
    return (j.groupBy("event_type")
            .agg(F.min("lo").cast("long").alias("lo_scaled"),
                 F.max("hi").cast("long").alias("hi_scaled"),
                 F.round(F.avg(norm), 6).alias("mean_normalized")))


@register("ta_source_vocab", oracle=f"""
WITH toks AS (
  SELECT source, unnest({{TOKS}}) AS t FROM documents
), cnt AS (
  SELECT source, t, count(*) AS n FROM toks GROUP BY 1, 2
), ranked AS (
  SELECT source, t, n,
         row_number() OVER (PARTITION BY source
                            ORDER BY n DESC, t) AS rk
  FROM cnt
)
SELECT source, rk, t AS token, n
FROM ranked WHERE rk <= 3
""".replace("{TOKS}", OV.tokens_sql("text")))
def ta_source_vocab(spark: SparkSession, d: str) -> DataFrame:
    """Per-source vocabulary profile: each source's top-3 tokens by
    raw count — the domain-characterization read that catches a
    source drifting off-topic (or a scraper pulling boilerplate)
    before quality scores move.  Grouped top-k over the exploded
    token table: one (source, token) partial-agged count, one
    source-partitioned rank window.  Deterministic token tiebreak."""
    docs = _t(spark, d, "documents")
    toks = docs.select(
        "source", F.explode(dedup.tokens(F.col("text"))).alias("t"))
    cnt = toks.groupBy("source", "t").agg(F.count("*").alias("n"))
    w = Window.partitionBy("source").orderBy(F.desc("n"), F.col("t"))
    return (cnt.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 3)
            .select("source", "rk", F.col("t").alias("token"), "n"))


@register("t17_winsorize", oracle="""
WITH scaled AS (
  SELECT event_type,
         CAST(round(value * 10000) AS BIGINT) AS v
  FROM events
), ranked AS (
  SELECT event_type, v,
         cume_dist() OVER (PARTITION BY event_type ORDER BY v) AS cd
  FROM scaled
), caps AS (
  SELECT event_type, max(CASE WHEN cd <= 0.99 THEN v END) AS cap
  FROM ranked GROUP BY event_type
)
SELECT s.event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(max(c.cap) AS BIGINT) AS cap_scaled,
       CAST(sum(CASE WHEN s.v > c.cap THEN 1 ELSE 0 END) AS BIGINT)
         AS n_capped,
       CAST(sum(least(s.v, c.cap)) AS BIGINT) AS winsorized_sum_scaled
FROM scaled s JOIN caps c ON c.event_type = s.event_type
GROUP BY s.event_type
""")
def t17_winsorize(spark: SparkSession, d: str) -> DataFrame:
    """Winsorization — outlier capping at the per-type p99 before any
    mean-based statistic (heavy-tailed `value` distributions make raw
    means meaningless; every feature pipeline clips first).  The cap
    is the DISCRETE p99 (largest value with cume_dist <= 0.99):
    interpolation-free, so both engines agree bit-exactly on integer-
    scaled values — the percentile-parity trap (interpolated
    quantiles differ in the last ulp) designed out rather than
    tolerated.  One window per type for ranks + one agg; capped sums
    stay integer."""
    ev = _t(spark, d, "events")
    scaled = ev.select(
        "event_type",
        F.round(F.col("value") * 10000).cast("long").alias("v"))
    w = Window.partitionBy("event_type").orderBy("v")
    ranked = scaled.withColumn("cd", F.cume_dist().over(w))
    caps = (ranked.groupBy("event_type")
            .agg(F.max(F.when(F.col("cd") <= 0.99, F.col("v")))
                 .alias("cap")))
    j = scaled.join(caps, "event_type")
    return (j.groupBy("event_type")
            .agg(F.count("*").cast("long").alias("n"),
                 F.max("cap").cast("long").alias("cap_scaled"),
                 F.sum(F.when(F.col("v") > F.col("cap"), 1).otherwise(0))
                 .cast("long").alias("n_capped"),
                 F.sum(F.least(F.col("v"), F.col("cap"))).cast("long")
                 .alias("winsorized_sum_scaled")))


@register("ev_new_vs_returning", oracle="""
WITH days AS (
  SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day, user_id
  FROM events
), firsts AS (
  SELECT user_id, min(day) AS first_day FROM days GROUP BY user_id
)
SELECT CAST(d.day AS VARCHAR) AS day,
       CAST(sum(CASE WHEN d.day = f.first_day THEN 1 ELSE 0 END)
            AS BIGINT) AS new_users,
       CAST(sum(CASE WHEN d.day > f.first_day THEN 1 ELSE 0 END)
            AS BIGINT) AS returning_users
FROM days d JOIN firsts f ON f.user_id = d.user_id
GROUP BY d.day
""")
def ev_new_vs_returning(spark: SparkSession, d: str) -> DataFrame:
    """Growth accounting: each day's active users split into NEW
    (first-ever active day) vs RETURNING — the decomposition that
    tells acquisition from retention (the cohort matrix's diagonal
    vs everything below it).  Same distinct-first collapse and
    user_id-keyed self-aggregation as ev_retention_cohorts; output is
    |days| rows."""
    ev = _t(spark, d, "events")
    days = (ev.select(
        F.date_trunc("DAY", F.col("ts").cast("timestamp"))
        .cast("date").alias("day"), "user_id").distinct())
    firsts = days.groupBy("user_id").agg(F.min("day").alias("first_day"))
    j = days.join(firsts, "user_id")
    return (j.groupBy(F.col("day").cast("string").alias("day"))
            .agg(F.sum(F.when(F.col("day") == F.col("first_day"), 1)
                       .otherwise(0)).cast("long").alias("new_users"),
                 F.sum(F.when(F.col("day") > F.col("first_day"), 1)
                       .otherwise(0)).cast("long")
                 .alias("returning_users")))


@register("ev_activity_concentration", oracle="""
WITH per AS (
  SELECT user_id, count(*) AS n FROM events GROUP BY user_id
), ranked AS (
  SELECT n,
         row_number() OVER (ORDER BY n DESC, user_id) AS rk,
         sum(n) OVER (ORDER BY n DESC, user_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum,
         (SELECT sum(n) FROM per) AS total,
         (SELECT count(*) FROM per) AS n_users
  FROM per
)
SELECT CAST(max(n_users) AS BIGINT) AS n_users,
       round(max(CASE WHEN rk = ceil(n_users * 0.1) THEN cum END)
             * 1.0 / max(total), 6) AS top10_share,
       round(max(CASE WHEN rk = ceil(n_users * 0.5) THEN cum END)
             * 1.0 / max(total), 6) AS top50_share
FROM ranked
""")
def ev_activity_concentration(spark: SparkSession, d: str) -> DataFrame:
    """Activity concentration (Pareto read on the event log): the
    share of all events generated by the top 10% / 50% most active
    users — THE skew statistic that decides whether the per-user
    operators need salting (operators/skew.py) before they need
    anything else.  Per-user counts -> one global rank window over
    |users| rows (metadata-scale after the first agg) -> shares at
    the decile cut ranks.  Integer cumulative sums; only the final
    two ratios are floats, rounded."""
    ev = _t(spark, d, "events")
    per = ev.groupBy("user_id").agg(F.count("*").alias("n"))
    w = Window.orderBy(F.desc("n"), "user_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tot = per.agg(F.sum("n").alias("total"),
                  F.count("*").alias("n_users"))
    ranked = (per.withColumn("rk", F.row_number().over(w))
              .withColumn("cum", F.sum("n").over(run))
              .crossJoin(F.broadcast(tot)))
    at = lambda q: F.max(F.when(  # noqa: E731
        F.col("rk") == F.ceil(F.col("n_users") * q), F.col("cum")))
    return ranked.agg(
        F.max("n_users").cast("long").alias("n_users"),
        F.round(at(0.1) / F.max("total"), 6).alias("top10_share"),
        F.round(at(0.5) / F.max("total"), 6).alias("top50_share"))


@register("ev_session_stats", oracle="""
WITH ordered AS (
  SELECT user_id, ts, event_id,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_ts
  FROM events
), flagged AS (
  SELECT *, CASE WHEN prev_ts IS NULL
                   OR floor(epoch(ts)) - floor(epoch(prev_ts)) > 1800
                 THEN 1 ELSE 0 END AS new_session
  FROM ordered
), numbered AS (
  SELECT *, sum(new_session) OVER (PARTITION BY user_id
              ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
            AS session_id
  FROM flagged
), sessions AS (
  SELECT user_id, session_id,
         CAST(floor(epoch(max(ts))) - floor(epoch(min(ts)))
              AS BIGINT) AS dur_s,
         count(*) AS n_events
  FROM numbered GROUP BY 1, 2
)
SELECT count(*) AS n_sessions,
       CAST(floor(median(dur_s)) AS BIGINT) AS median_dur_s,
       CAST(max(dur_s) AS BIGINT) AS max_dur_s,
       round(avg(n_events), 4) AS avg_events,
       CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bounces
FROM sessions
""")
def ev_session_stats(spark: SparkSession, d: str) -> DataFrame:
    """Session-quality summary over the sessionized event log:
    session count, median/max duration, events per session, and
    BOUNCE count (single-event sessions — the engagement metric the
    duration median hides).  Gap test via epoch differences on both
    engines (sub-second-safe, the ev_multitouch lesson); durations
    floored to integer seconds so the median is engine-exact.  Same
    single user_id shuffle as ev_sessionize + a one-row agg."""
    ev = _t(spark, d, "events")
    ts = F.col("ts").cast("timestamp")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap = F.unix_timestamp(ts) - F.unix_timestamp(F.lag(ts).over(w))
    flagged = ev.withColumn(
        "new_session",
        F.when(F.lag(ts).over(w).isNull() | (gap > 1800), 1).otherwise(0))
    numbered = flagged.withColumn(
        "session_id", F.sum("new_session").over(run))
    sessions = (numbered.groupBy("user_id", "session_id")
                .agg((F.unix_timestamp(F.max(ts))
                      - F.unix_timestamp(F.min(ts))).cast("long")
                     .alias("dur_s"),
                     F.count("*").alias("n_events")))
    return sessions.agg(
        F.count("*").alias("n_sessions"),
        F.floor(F.expr("percentile(dur_s, 0.5)")).cast("long")
        .alias("median_dur_s"),
        F.max("dur_s").cast("long").alias("max_dur_s"),
        F.round(F.avg("n_events"), 4).alias("avg_events"),
        F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
        .cast("long").alias("n_bounces"))


@register("ev_week_overlap_hll", oracle="""
WITH days AS (
  SELECT DISTINCT date_trunc('week', ts) AS wk, user_id FROM events
), pairs AS (
  SELECT x.wk AS wk_a, count(*) AS inter_exact
  FROM days x JOIN days y
    ON y.user_id = x.user_id AND y.wk = x.wk + INTERVAL 7 DAY
  GROUP BY x.wk
)
SELECT CAST(CAST(wk_a AS DATE) AS VARCHAR) AS week,
       CAST(inter_exact AS BIGINT) AS inter_exact,
       TRUE AS est_within_10pct
FROM pairs
""")
def ev_week_overlap_hll(spark: SparkSession, d: str) -> DataFrame:
    """SKETCH SET ALGEBRA: week-over-week returning-user overlap via
    HLL inclusion-exclusion — |A∩B| ≈ |A| + |B| - |A∪B| with
    hll_union on the per-week sketches, the only way to intersect
    distinct-sets whose raw membership is too big to keep (sketches
    union losslessly; intersection comes from the identity).  Exact
    intersection (from the distinct day-user table) is computed
    alongside and the estimate is gated within 10% — the value oracle
    pins the exact counts AND the gate."""
    ev = _t(spark, d, "events")
    (ev.select(F.date_trunc("WEEK", F.col("ts").cast("timestamp"))
               .alias("wk"), "user_id").distinct()
     .createOrReplaceTempView("__pgrs_wk_hll"))
    return spark.sql("""
        WITH wsk AS (
          SELECT wk, hll_sketch_agg(user_id) AS sk, count(*) AS n
          FROM __pgrs_wk_hll GROUP BY wk
        ), pairs AS (
          SELECT a.wk AS wk_a, a.n + b.n
                 - hll_sketch_estimate(hll_union(a.sk, b.sk)) AS est
          FROM wsk a JOIN wsk b ON b.wk = a.wk + INTERVAL 7 DAY
        ), exact AS (
          SELECT x.wk AS wk_a, count(*) AS inter_exact
          FROM __pgrs_wk_hll x JOIN __pgrs_wk_hll y
            ON y.user_id = x.user_id AND y.wk = x.wk + INTERVAL 7 DAY
          GROUP BY x.wk
        )
        SELECT CAST(CAST(p.wk_a AS DATE) AS STRING) AS week,
               e.inter_exact,
               (abs(p.est - e.inter_exact) / e.inter_exact) <= 0.10
                 AS est_within_10pct
        FROM pairs p JOIN exact e ON e.wk_a = p.wk_a
    """)


@register("ev_path_transitions", oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events
), pairs AS (
  SELECT prev_type, event_type, count(*) AS n
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY 1, 2
), tot AS (
  SELECT prev_type, sum(n) AS n_from FROM pairs GROUP BY 1
)
SELECT p.prev_type AS from_type, p.event_type AS to_type, p.n,
       round(p.n * 1.0 / t.n_from, 6) AS p_transition
FROM pairs p JOIN tot t ON p.prev_type = t.prev_type
""")
def ev_path_transitions(spark: SparkSession, d: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: count and probability of each (from_type -> to_type)
    step — the path-analysis aggregate behind funnel discovery
    (ev_funnel checks ONE ordained path; this surfaces which paths
    exist).  lag over the user_id window (the session family's one
    shuffle), then two metadata-scale aggs: the matrix is
    |types|^2 rows at any corpus size."""
    ev = _t(spark, d, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select("user_id", "event_type",
                    F.lag("event_type").over(w).alias("prev_type"))
    pairs = (seq.filter(F.col("prev_type").isNotNull())
             .groupBy(F.col("prev_type").alias("from_type"),
                      F.col("event_type").alias("to_type"))
             .agg(F.count("*").alias("n")))
    wt = Window.partitionBy("from_type")
    return pairs.select(
        "from_type", "to_type", "n",
        F.round(F.col("n") / F.sum("n").over(wt), 6)
        .alias("p_transition"))


@register("ta_keywords_tfidf", oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest({OV.tokens_sql('text')}) AS t FROM documents
), tf AS (
  SELECT doc_id, t, count(*) AS tf FROM toks GROUP BY 1, 2
), df AS (
  SELECT t, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1
), n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.t,
         tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0)) AS s
  FROM tf JOIN df ON tf.t = df.t, n
), ranked AS (
  SELECT doc_id, t, s,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY s DESC, t) AS rk
  FROM scored
)
SELECT doc_id, rk, t AS keyword, round(s, 6) AS tfidf
FROM ranked WHERE rk <= 3
""")
def ta_keywords_tfidf(spark: SparkSession, d: str) -> DataFrame:
    """Per-document keyword extraction: top-3 terms by TF-IDF
    (smoothed IDF ln((N+1)/(df+1)), deterministic term tiebreak) —
    the tagging/labeling step of a curation pipeline, and the
    document-side complement of the query-side TF-IDF relevance in
    operators/textscore.py.

    Plan: one token explode feeds BOTH the per-doc TF agg and the
    corpus DF agg; the DF table is vocabulary-sized (broadcastable at
    most scales — here AQE's call), the per-doc rank window keys on
    doc_id.  At 100 TB the vocabulary table is the only global
    artifact, exactly like the BM25 stats."""
    docs = _t(spark, d, "documents")
    toks = docs.select(
        "doc_id", F.explode(dedup.tokens(F.col("text"))).alias("t"))
    tf = toks.groupBy("doc_id", "t").agg(F.count("*").alias("tf"))
    df_t = toks.groupBy("t").agg(
        F.countDistinct("doc_id").alias("df"))
    n_docs = docs.count()
    scored = (tf.join(df_t, "t")
              .select("doc_id", "t",
                      (F.col("tf")
                       * F.log((n_docs + 1.0) / (F.col("df") + 1.0)))
                      .alias("s")))
    w = Window.partitionBy("doc_id").orderBy(F.desc("s"), F.col("t"))
    return (scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 3)
            .select("doc_id", "rk", F.col("t").alias("keyword"),
                    F.round("s", 6).alias("tfidf")))


@register("ev_scd2_islands", oracle="""
WITH ordered AS (
  SELECT user_id, ts, event_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
), flagged AS (
  SELECT *, CASE WHEN prev_type IS NULL OR prev_type <> event_type
                 THEN 1 ELSE 0 END AS chg
  FROM ordered
), numbered AS (
  SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
            AS island
  FROM flagged
), islands AS (
  SELECT user_id, island, min(event_type) AS event_type,
         min(ts) AS valid_from, count(*) AS n_events
  FROM numbered GROUP BY user_id, island
)
SELECT user_id, island, event_type, valid_from,
       lead(valid_from) OVER (PARTITION BY user_id ORDER BY island)
         AS valid_to,
       n_events
FROM islands
""")
def ev_scd2_islands(spark: SparkSession, d: str) -> DataFrame:
    """SCD-type-2 interval build (gaps-and-islands): collapse each
    user's consecutive same-type events into one validity interval
    [valid_from, valid_to), valid_to = next island's start, NULL while
    current — the standard warehouse pattern for turning an event log
    into a slowly-changing dimension.

    Plan: change-flag via lag -> island id via prefix-sum -> one
    groupBy -> lead for the closing edge.  Every window and the agg
    key off user_id, so the work is ONE logical repartition by user
    re-used across four operators (Spark re-shuffles for the
    (user_id, island) agg since the hash differs; at 100 TB pin it
    with repartition(user_id) + groupBy-within-partitions or accept
    the second small exchange — both beat any self-join formulation)."""
    from pyspark.sql import Window
    ev = _t(spark, d, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flagged = ev.withColumn(
        "chg",
        F.when(F.lag("event_type").over(w).isNull()
               | (F.lag("event_type").over(w) != F.col("event_type")), 1)
        .otherwise(0))
    numbered = flagged.withColumn("island", F.sum("chg").over(run))
    islands = (numbered.groupBy("user_id", "island")
               .agg(F.min("event_type").alias("event_type"),
                    F.min("ts").alias("valid_from"),
                    F.count("*").alias("n_events")))
    wl = Window.partitionBy("user_id").orderBy("island")
    return islands.withColumn("valid_to",
                              F.lead("valid_from").over(wl)) \
                  .select("user_id", "island", "event_type", "valid_from",
                          "valid_to", "n_events")


@register("ev_rollup_sets", oracle="""
SELECT CASE WHEN GROUPING(d) = 1 THEN 'ALL' ELSE d::VARCHAR END AS day,
       CASE WHEN GROUPING(event_type) = 1 THEN 'ALL' ELSE event_type END
         AS event_type,
       count(*) AS n_events,
       round(CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS DOUBLE)
             / 10000.0, 4) AS sum_value
FROM (SELECT CAST(date_trunc('day', ts) AS DATE) AS d, event_type, value
      FROM events) t
GROUP BY GROUPING SETS ((d, event_type), (d), ())
""")
def ev_rollup_sets(spark: SparkSession, d: str) -> DataFrame:
    """Hypertable-style multi-granularity rollup in ONE aggregation:
    GROUPING SETS (day x type, day, grand total), disambiguated with
    GROUPING() markers — the continuous-aggregate shape (day page +
    day totals + corpus total) without three scans.  Spark expands the
    sets map-side and partial-aggregates each, so it stays one scan +
    one exchange.  value sums are integer-scaled before summing (the
    ev_rolling_metrics convention) so the grand total is FP-order
    independent and oracle-exact.  At 100 TB: identical shape; the
    rollup output is tiny relative to input, which is exactly when
    grouping sets beat re-aggregating a materialized day level."""
    ev = _t(spark, d, "events")
    ev.createOrReplaceTempView("__pgrs_events_r6")
    return spark.sql("""
        SELECT CASE WHEN grouping(d) = 1 THEN 'ALL'
                    ELSE cast(d AS STRING) END AS day,
               CASE WHEN grouping(event_type) = 1 THEN 'ALL'
                    ELSE event_type END AS event_type,
               count(*) AS n_events,
               round(sum(CAST(round(value * 10000) AS BIGINT)) / 10000.0D, 4)
                 AS sum_value
        FROM (SELECT cast(date_trunc('DAY', ts) AS DATE) AS d,
                     event_type, value
              FROM __pgrs_events_r6) t
        GROUP BY GROUPING SETS ((d, event_type), (d), ())
    """)


@register("pk_pack_stats", oracle="""
WITH toks AS (
  SELECT doc_id,
         ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 8 AS bucket,
         greatest(length(text) // 4, 1)::BIGINT AS n_tokens
  FROM documents
), packed AS (
  SELECT doc_id, bucket, n_tokens,
         (sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - n_tokens)::BIGINT AS start_token
  FROM toks
)
SELECT bucket,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST((sum(n_tokens) + 2047) // 2048 AS BIGINT) AS n_sequences,
       round(sum(n_tokens) * 1.0
             / (((sum(n_tokens) + 2047) // 2048) * 2048), 6) AS fill_rate,
       CAST(sum(CASE WHEN (start_token // 2048)
                       <> ((start_token + n_tokens - 1) // 2048)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_boundary_crossers
FROM packed GROUP BY bucket
""")
def pk_pack_stats(spark: SparkSession, d: str) -> DataFrame:
    """Packing-efficiency report for pk_sequence_pack: per shard
    bucket, total tokens, 2048-token sequences consumed, fill rate
    (waste lives only in each bucket's final partial sequence — the
    property that makes stream packing strictly better than
    pad-per-document), and how many documents straddle a sequence
    boundary (the attention-mask bookkeeping the trainer needs).
    Same single prefix-sum window as the packer, then a bucket-level
    agg."""
    from pyspark.sql import Window as W
    docs = _t(spark, d, "documents")
    n_tokens = F.greatest(F.floor(F.length("text") / 4), F.lit(1)) \
        .cast("long")
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
               16, 10).cast("long"), F.lit(8))
    w = (W.partitionBy("bucket").orderBy("doc_id")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    base = docs.select("doc_id", bucket.alias("bucket"),
                       n_tokens.alias("n_tokens"))
    packed = base.withColumn(
        "start_token", F.sum("n_tokens").over(w) - F.col("n_tokens"))
    crosser = (F.floor(F.col("start_token") / 2048)
               != F.floor((F.col("start_token") + F.col("n_tokens") - 1)
                          / 2048))
    nseq = F.floor((F.sum("n_tokens") + 2047) / 2048).cast("long")
    return (packed.groupBy("bucket")
            .agg(F.sum("n_tokens").cast("long").alias("total_tokens"),
                 nseq.alias("n_sequences"),
                 F.round(F.sum("n_tokens")
                         / (nseq * 2048.0), 6).alias("fill_rate"),
                 F.sum(F.when(crosser, 1).otherwise(0)).cast("long")
                 .alias("n_boundary_crossers")))


@register("ta_langid_confusion", oracle=f"""
WITH pred AS (
  SELECT lang AS labeled, {OV.detect_language_sql('text')} AS detected
  FROM documents
)
SELECT labeled, detected, count(*) AS n
FROM pred GROUP BY 1, 2
""")
def ta_langid_confusion(spark: SparkSession, d: str) -> DataFrame:
    """Classifier-quality reporting for the heuristic language
    detector: the full confusion matrix of detected vs labeled lang —
    the evaluation artifact any corpus-filter model ships with
    (ta_language_id reports predictions; this reports how good they
    are, and the driver value-checks every cell).  One scan + one
    |langs|^2-bounded agg."""
    docs = _t(spark, d, "documents")
    pred = docs.select(
        F.col("lang").alias("labeled"),
        textstats.detect_language(F.col("text")).alias("detected"))
    return (pred.groupBy("labeled", "detected")
            .agg(F.count("*").alias("n")))


@register("t12_quality_deciles", oracle=f"""
WITH scored AS (
  SELECT doc_id, {O.quality_sql('text')} AS q FROM documents
), tiled AS (
  SELECT doc_id, q, ntile(10) OVER (ORDER BY q, doc_id) AS decile
  FROM scored WHERE q IS NOT NULL
)
SELECT decile, count(*) AS n_docs,
       round(min(q), 6) AS min_q, round(max(q), 6) AS max_q
FROM tiled GROUP BY decile
""")
def t12_quality_deciles(spark: SparkSession, d: str) -> DataFrame:
    """Quality DECILE bucketing via ntile — the curriculum/mix-bucket
    assignment step (rank documents by T2 quality, cut into 10
    equal-count buckets, report per-bucket bounds).  Deterministic:
    the ntile ordering carries a doc_id tiebreak, so equal scores
    split identically on both engines.  Scale note: a single global
    ntile is one total sort — at 100 TB swap to the approx-percentile
    cutoff pattern (t10_stratified_cutoff) for map-only bucketing; the
    exact global form IS the oracle semantics."""
    docs = _t(spark, d, "documents")
    scored = docs.select(
        "doc_id",
        X.quality_components(F.col("text"))["quality_score"].alias("q")) \
        .filter(F.col("q").isNotNull())
    w = Window.orderBy(F.col("q").asc(), F.col("doc_id").asc())
    tiled = scored.withColumn("decile", F.ntile(10).over(w))
    return (tiled.groupBy("decile")
            .agg(F.count("*").alias("n_docs"),
                 F.round(F.min("q"), 6).alias("min_q"),
                 F.round(F.max("q"), 6).alias("max_q")))


@register("w7_quality_percentile", oracle=f"""
WITH scored AS (
  SELECT doc_id, source, {O.quality_sql('text')} AS q FROM documents
)
SELECT doc_id, source,
       round(percent_rank() OVER (PARTITION BY source
                                  ORDER BY q, doc_id), 6) AS q_pctile
FROM scored WHERE q IS NOT NULL
""")
def w7_quality_percentile(spark: SparkSession, d: str) -> DataFrame:
    """percent_rank: each document's quality standing WITHIN its
    source (0 = worst, 1 = best) — the per-domain normalization that
    makes one global quality threshold fair across sources with
    different score distributions (a crawl domain that always scores
    low still keeps its best docs).  Per-source window with doc_id
    tiebreak; one shuffle on source."""
    docs = _t(spark, d, "documents")
    scored = docs.select(
        "doc_id", "source",
        X.quality_components(F.col("text"))["quality_score"].alias("q")) \
        .filter(F.col("q").isNotNull())
    w = Window.partitionBy("source").orderBy(F.col("q").asc(),
                                             F.col("doc_id").asc())
    return scored.select(
        "doc_id", "source",
        F.round(F.percent_rank().over(w), 6).alias("q_pctile"))


@register("ev_gap_distribution", oracle="""
WITH gaps AS (
  SELECT user_id,
         datediff('second',
                  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                  ts) AS gap_s
  FROM events
)
SELECT user_id, count(*) AS n_gaps,
       CAST(floor(median(gap_s)) AS BIGINT) AS median_gap_s,
       CAST(max(gap_s) AS BIGINT) AS max_gap_s
FROM gaps WHERE gap_s IS NOT NULL
GROUP BY user_id HAVING count(*) >= 20
""")
def ev_gap_distribution(spark: SparkSession, d: str) -> DataFrame:
    """Inter-event gap distribution per user (median + max seconds
    between consecutive events) — the statistic that calibrates the
    sessionization gap (ev_sessionize's 30 min is a point on THIS
    distribution).  lag over the user window, exact median per user
    (integer seconds -> engine-identical), thin users (<20 gaps)
    suppressed.  Same single user_id shuffle as the session family;
    at 100 TB swap exact median for approx_percentile and gate like
    a5_approx_gate."""
    ev = _t(spark, d, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts = F.col("ts").cast("timestamp")
    gap = (F.unix_timestamp(ts)
           - F.unix_timestamp(F.lag(ts).over(w.orderBy(
               F.col("ts"), F.col("event_id")))))
    gaps = ev.withColumn("gap_s", gap).filter(F.col("gap_s").isNotNull())
    return (gaps.groupBy("user_id")
            .agg(F.count("*").alias("n_gaps"),
                 F.floor(F.expr("percentile(gap_s, 0.5)")).cast("long")
                 .alias("median_gap_s"),
                 F.max("gap_s").cast("long").alias("max_gap_s"))
            .filter(F.col("n_gaps") >= 20))


@register("s22_schema_evolution", oracle="""
SELECT count(*) AS n_rows,
       CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_with_quality,
       CAST(sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null_quality
FROM documents
""")
def s22_schema_evolution(spark: SparkSession, d: str) -> DataFrame:
    """SCHEMA EVOLUTION on the lake: an old batch written WITHOUT the
    quality column and a new batch WITH it must read back as one
    table under mergeSchema, old rows surfacing NULL — the
    add-a-column migration every long-lived ingest performs.  The
    oracle pins exact row counts on both sides of the evolution.
    At 100 TB: mergeSchema costs a footer read per file — fine for
    one migration read, but production pins the merged schema in the
    table catalog afterwards so scans go back to single-schema."""
    import shutil
    from .catalog_more import _scratch
    docs = _t(spark, d, "documents")
    path = _scratch("s22_evolving")
    shutil.rmtree(path, ignore_errors=True)
    old = docs.filter(F.col("doc_id") % 2 == 1) \
        .select("doc_id", "source")
    new = docs.filter(F.col("doc_id") % 2 == 0) \
        .select("doc_id", "source", F.lit(0.5).alias("quality"))
    old.write.parquet(f"{path}/b=1")
    new.write.parquet(f"{path}/b=2")
    merged = spark.read.option("mergeSchema", "true").parquet(
        f"{path}/b=1", f"{path}/b=2")
    return merged.agg(
        F.count("*").alias("n_rows"),
        F.sum(F.when(F.col("quality").isNotNull(), 1).otherwise(0))
        .cast("long").alias("n_with_quality"),
        F.sum(F.when(F.col("quality").isNull(), 1).otherwise(0))
        .cast("long").alias("n_null_quality"))


@register("u6_except_intersect", oracle="""
WITH en_docs AS (SELECT source FROM documents WHERE lang = 'en'),
     zh_docs AS (SELECT source FROM documents WHERE lang = 'zh')
SELECT 'both' AS side, source FROM
  (SELECT source FROM en_docs INTERSECT SELECT source FROM zh_docs)
UNION ALL
SELECT 'en_only' AS side, source FROM
  (SELECT source FROM en_docs EXCEPT SELECT source FROM zh_docs)
""")
def u6_except_intersect(spark: SparkSession, d: str) -> DataFrame:
    """INTERSECT / EXCEPT — the two set operators the reference never
    uses (SURVEY §2.6 notes their absence) but a complete engine
    exposes: sources that publish in BOTH en and zh, and en-only
    sources.  Spark compiles both to aggregate + semi/anti join under
    the hood — same scale behavior as the dedup family's distinct
    (one hash shuffle per branch on the compared columns)."""
    docs = _t(spark, d, "documents")
    en = docs.filter(F.col("lang") == "en").select("source")
    zh = docs.filter(F.col("lang") == "zh").select("source")
    both = en.intersect(zh).select(F.lit("both").alias("side"), "source")
    only = en.subtract(zh) \
        .select(F.lit("en_only").alias("side"), "source")
    return both.unionByName(only)


@register("f19_sql_udfs", oracle=f"""
SELECT doc_id,
       {O.word_count_sql('text')}::INT AS n_words,
       (length(text) // 4)::BIGINT AS est_tokens,
       (CASE WHEN length(text) > 50 THEN 53
             ELSE length(text) END)::INT AS trunc_len,
       round(least(greatest(n_chars / 1000.0, 0.0), 1.0), 6)
         AS clamped_kchars
FROM documents
""")
def f19_sql_udfs(spark: SparkSession, d: str) -> DataFrame:
    """The scalar-function surface as SPARK SQL UDFs
    (functions/sql_udfs.py: CREATE TEMPORARY FUNCTION ... RETURN expr)
    — a pure-SQL user calls pgrs_word_count / pgrs_token_estimate /
    pgrs_truncate / pgrs_clamp01 with the SAME semantics the
    DataFrame API gets from functions/text.py, checked here against
    the DuckDB oracle.  SQL UDF bodies inline into Catalyst (no
    Python in the row path), so this costs exactly what the Column
    forms cost."""
    from ..functions.sql_udfs import register_sql_udfs
    register_sql_udfs(spark)
    docs = _t(spark, d, "documents")
    docs.createOrReplaceTempView("__pgrs_docs_f19")
    return spark.sql("""
        SELECT doc_id,
               pgrs_word_count(text) AS n_words,
               pgrs_token_estimate(text) AS est_tokens,
               CAST(length(pgrs_truncate(text, 50)) AS INT) AS trunc_len,
               round(pgrs_clamp01(n_chars / 1000.0D), 6) AS clamped_kchars
        FROM __pgrs_docs_f19
    """)


@register("ta_token_entropy", oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest({OV.tokens_sql('text')}) AS t FROM documents
), cnt AS (
  SELECT doc_id, t, count(*) AS c FROM toks GROUP BY 1, 2
), tot AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n FROM cnt GROUP BY 1
)
SELECT c.doc_id, t.n AS n_tokens,
       round(-sum((c.c * 1.0 / t.n) * ln(c.c * 1.0 / t.n)), 6)
         AS token_entropy
FROM cnt c JOIN tot t ON c.doc_id = t.doc_id
GROUP BY 1, 2
""")
def ta_token_entropy(spark: SparkSession, d: str) -> DataFrame:
    """Token-distribution Shannon entropy per document — the corpus
    filter that catches keyboard-mash / single-token-loop / template
    garbage that length and stopword ratios miss (low entropy = few
    distinct tokens dominate; the Gopher/C4-family pipelines cut on
    exactly this).  Same tokenizer as the dedup family
    (dedup.tokens).

    Plan: explode tokens -> (doc, token) partial-agged counts -> one
    more partial agg to per-doc totals folded back with a same-key
    join -> entropy as column math.  Everything keys on doc_id (or
    (doc_id, token)) so the shuffles are uniform; at 100 TB the
    explode is the only row multiplier and it feeds straight into a
    map-side combine."""
    docs = _t(spark, d, "documents")
    toks = docs.select(
        "doc_id", F.explode(dedup.tokens(F.col("text"))).alias("t"))
    cnt = toks.groupBy("doc_id", "t").agg(F.count("*").alias("c"))
    tot = cnt.groupBy("doc_id").agg(F.sum("c").alias("n"))
    p = F.col("c") / F.col("n")
    return (cnt.join(tot, "doc_id")
            .groupBy("doc_id", F.col("n").alias("n_tokens"))
            .agg(F.round(-F.sum(p * F.log(p)), 6).alias("token_entropy")))


@register("t13_mix_oversample", oracle="""
WITH per AS (
  SELECT source, count(*) AS n_docs FROM documents GROUP BY source
), tot AS (
  SELECT sum(n_docs) AS n_all, count(*) AS n_src FROM per
), w AS (
  SELECT source,
         (1.0 / n_src) / (n_docs * 1.0 / n_all) AS weight
  FROM per, tot
), expanded AS (
  SELECT d.doc_id, d.source,
         CAST(floor(w.weight) AS INT)
           + (CASE WHEN (CAST(CAST('0x' ||
                substr(md5(d.doc_id::VARCHAR || ':ovs'), 1, 8) AS VARCHAR)
                AS BIGINT) % 1000000) / 1000000.0
               < w.weight - floor(w.weight) THEN 1 ELSE 0 END) AS n_copies
  FROM documents d JOIN w ON d.source = w.source
)
SELECT source, CAST(sum(n_copies) AS BIGINT) AS n_after
FROM expanded GROUP BY source
""")
def t13_mix_oversample(spark: SparkSession, d: str) -> DataFrame:
    """Materialize the t11_source_mix weights: each document is
    repeated floor(w) times plus one more with probability frac(w),
    decided by a DETERMINISTIC per-doc hash — so the resampled corpus
    hits the uniform target mix in expectation, reproducibly (same
    doc set every run, no RNG state).  Output: per-source post-sample
    counts, which the oracle recomputes exactly.

    Plan: weights are #sources rows (broadcast); the expansion is a
    map-only explode by n_copies — no shuffle until the reporting
    agg.  At 100 TB this IS the training-mix materialization job, and
    its cost is output-proportional."""
    docs = _t(spark, d, "documents").select("doc_id", "source")
    per = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    tot = per.agg(F.sum("n_docs").alias("n_all"),
                  F.count("*").alias("n_src"))
    w = (per.crossJoin(F.broadcast(tot))
         .select("source",
                 ((F.lit(1.0) / F.col("n_src"))
                  / (F.col("n_docs") / F.col("n_all"))).alias("weight")))
    frac_hash = (F.conv(F.substring(F.md5(F.concat(
        F.col("doc_id").cast("string"), F.lit(":ovs"))), 1, 8), 16, 10)
        .cast("long") % 1000000) / 1000000.0
    expanded = (docs.join(F.broadcast(w), "source")
                .withColumn(
                    "n_copies",
                    F.floor(F.col("weight")).cast("int")
                    + F.when(frac_hash < F.col("weight")
                             - F.floor(F.col("weight")), 1).otherwise(0)))
    return (expanded.groupBy("source")
            .agg(F.sum("n_copies").cast("long").alias("n_after")))


# ===========================================================================
# Training-data hygiene: benchmark decontamination, domain-mix weights
# ===========================================================================

@register("dd_impact_report", oracle=f"""
WITH g AS (
  SELECT md5(coalesce(text, '')) AS h, count(*) AS cnt,
         min(length(text) // 4) AS tok
  FROM documents GROUP BY 1
)
SELECT (SELECT CAST(sum(cnt) AS BIGINT) FROM g) AS n_docs,
       (SELECT CAST(sum(cnt - 1) AS BIGINT) FROM g) AS n_exact_redundant,
       (SELECT CAST(sum((cnt - 1) * tok) AS BIGINT) FROM g)
         AS tokens_saved,
       (SELECT count(*) FROM ({OV.minhash_pairs_sql()}) p) AS n_near_pairs
""")
def dd_impact_report(spark: SparkSession, d: str) -> DataFrame:
    """The dedup family composed into the report a data-curation run
    actually publishes: corpus size, exact-duplicate redundancy (docs
    beyond each group's keeper), training tokens that redundancy
    wastes, and verified near-dup pair count (MinHash 16/4 @ 0.8,
    identical banding to dd_minhash_lsh so the number is the same one
    that query reports).  Four aggregates meeting in one row via
    1-row crossJoins — each input aggregation is the already-audited
    plan shape of its family member."""
    docs = _t(spark, d, "documents")
    h = F.md5(F.coalesce(F.col("text"), F.lit("")))
    g = (docs.groupBy(h.alias("h"))
         .agg(F.count("*").alias("cnt"),
              F.min(F.floor(F.length("text") / 4)).alias("tok")))
    exact = g.agg(
        F.sum("cnt").cast("long").alias("n_docs"),
        F.sum(F.col("cnt") - 1).cast("long").alias("n_exact_redundant"),
        F.sum((F.col("cnt") - 1) * F.col("tok")).cast("long")
        .alias("tokens_saved"))
    near = (dedup.minhash_dedup_pairs(docs)
            .agg(F.count("*").alias("n_near_pairs")))
    return exact.crossJoin(F.broadcast(near))


@register("dd_decontaminate", oracle=f"""
WITH toks AS (
  SELECT doc_id, {OV.tokens_sql('text')} AS w FROM documents
), grams AS (
  SELECT doc_id, unnest({OV.word_shingles_sql('w', 5)}) AS g FROM toks
), bench AS (
  SELECT DISTINCT g FROM grams WHERE doc_id % 17 = 0
), corpus AS (
  SELECT doc_id, g FROM grams WHERE doc_id % 17 <> 0
), agg AS (
  SELECT c.doc_id, count(*) AS n_grams, count(b.g) AS n_hits
  FROM corpus c LEFT JOIN bench b ON c.g = b.g
  GROUP BY 1
)
SELECT doc_id, n_hits, n_grams,
       round(n_hits * 1.0 / n_grams, 6) AS contamination
FROM agg WHERE n_hits > 0
""")
def dd_decontaminate(spark: SparkSession, d: str) -> DataFrame:
    """Benchmark decontamination — the training-data hygiene twin of
    dedup: flag corpus documents that share any word 5-gram with a
    held-out evaluation set (docs with doc_id % 17 == 0 play the
    benchmark), reporting hit count and contamination fraction per
    flagged doc.  Same shingle definition as dd_minhash_lsh
    (dedup.word_shingles; short docs fall back to whole-text), so both
    hygiene passes share one gram extraction at ingest.

    Plan: one narrow gram-explode pass over the corpus; the benchmark
    gram set is eval-scale (thousands of docs, not billions), so the
    membership join BROADCASTS it and the contamination scan is
    map-side — one shuffle total, for the per-doc count aggregation.
    If the benchmark ever outgrows broadcast, the join keys on the
    uniform gram hash, skew-free by construction.  The LEFT join keeps
    every corpus gram so n_grams is computed in the same pass as
    n_hits (no second aggregation over the corpus)."""
    docs = _t(spark, d, "documents")
    grams = dedup.shingle_explode(docs, k=5, extra_cols=("doc_id",),
                                  out_col="g")
    bench = (grams.filter(F.col("doc_id") % 17 == 0)
             .select("g").distinct())
    corpus = grams.filter(F.col("doc_id") % 17 != 0)
    marked = corpus.join(
        F.broadcast(bench.withColumn("__hit", F.lit(1))), "g", "left")
    return (marked.groupBy("doc_id")
            .agg(F.count("*").alias("n_grams"),
                 F.count("__hit").alias("n_hits"))
            .filter(F.col("n_hits") > 0)
            .select("doc_id", "n_hits", "n_grams",
                    F.round(F.col("n_hits") / F.col("n_grams"), 6)
                    .alias("contamination")))


@register("t11_source_mix", oracle="""
WITH per AS (
  SELECT source, count(*) AS n_docs,
         CAST(sum(CAST(n_chars AS BIGINT) // 4) AS BIGINT) AS est_tokens
  FROM documents GROUP BY source
), tot AS (
  SELECT sum(est_tokens) AS all_tokens,
         count(*) AS n_sources FROM per
)
SELECT source, n_docs, est_tokens,
       round(est_tokens * 1.0 / all_tokens, 6) AS actual_share,
       round(1.0 / n_sources, 6) AS target_share,
       round((1.0 / n_sources) / (est_tokens * 1.0 / all_tokens), 6)
         AS sampling_weight
FROM per, tot
""")
def t11_source_mix(spark: SparkSession, d: str) -> DataFrame:
    """Domain-mix reweighting for training-data assembly: per source,
    the corpus' actual token share vs a uniform target mix, and the
    sampling multiplier (target/actual) a downstream sampler applies
    to hit the target — the static form of DoReMi-style domain
    reweighting, and the input t9_hash_sample/t10_stratified_sample
    consume as per-stratum rates.

    Plan shape: one partial-agg pass to per-source totals (map-side
    combine collapses everything before the shuffle; #sources rows
    survive), then a broadcast of the 1-row grand total back across
    the source rows.  At 100 TB this is the cheapest possible scan:
    two tiny exchanges, no wide rows, no skew (aggregation key
    cardinality == #sources)."""
    per = (_t(spark, d, "documents")
           .groupBy("source")
           .agg(F.count("*").alias("n_docs"),
                F.sum((F.col("n_chars").cast("long") / 4)
                      .cast("long")).alias("est_tokens")))
    tot = per.agg(F.sum("est_tokens").alias("all_tokens"),
                  F.count("*").alias("n_sources"))
    j = per.crossJoin(F.broadcast(tot))
    actual = F.col("est_tokens") / F.col("all_tokens")
    target = F.lit(1.0) / F.col("n_sources")
    return j.select(
        "source", "n_docs", "est_tokens",
        F.round(actual, 6).alias("actual_share"),
        F.round(target, 6).alias("target_share"),
        F.round(target / actual, 6).alias("sampling_weight"))


@register("m3_incremental_embed", oracle="""
WITH store AS (
  SELECT DISTINCT md5(coalesce(text, '')) AS h
  FROM documents WHERE doc_id % 2 = 0
)
SELECT count(*) AS n_total,
       CAST(sum(CASE WHEN md5(coalesce(text, '')) IN (SELECT h FROM store)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_cached,
       CAST(sum(CASE WHEN md5(coalesce(text, '')) IN (SELECT h FROM store)
                THEN 0 ELSE 1 END) AS BIGINT) AS n_embedded,
       TRUE AS all_embedded
FROM documents
""")
def m3_incremental_embed(spark: SparkSession, d: str) -> DataFrame:
    """Incremental EMBEDDING CACHE — the biggest cost lever in a real
    feature pipeline (model inference dwarfs everything else; the
    reference re-embeds every fetched doc per run,
    document_processor.py:125-150): embeddings are stored keyed by
    CONTENT HASH, and an incoming batch joins against the store so
    only cache MISSES go through the embedder.  Even doc_ids play the
    warm store, the full corpus plays the incoming batch.

    Proof in-plan: per-batch cached/embedded counts (value-pinned —
    a broken cache join shows up as n_cached=0) and an all_embedded
    flag (every row left with a non-null vector).  Determinism of the
    hash embedder makes cached and recomputed vectors identical —
    asserted in tests for the operator family.  At 100 TB: the store
    join keys on the uniform crypto hash (no skew), and the embed
    UDF — the expensive stage — runs on the miss minority only."""
    docs = _t(spark, d, "documents")
    h = F.md5(F.coalesce(F.col("text"), F.lit("")))
    store = (embedding.hash_embed(
        docs.filter(F.col("doc_id") % 2 == 0)
        .select(F.col("doc_id"), F.col("text"),
                h.alias("content_hash")),
        text_col="text", id_col="doc_id")
        .select("content_hash", F.col("embedding").alias("__cached"))
        .dropDuplicates(["content_hash"]))
    batch = docs.select("doc_id", "text", h.alias("content_hash"))
    joined = batch.join(store, "content_hash", "left")
    misses = (joined.filter(F.col("__cached").isNull())
              .drop("__cached"))
    fresh = embedding.hash_embed(misses, text_col="text",
                                 id_col="doc_id")
    hits = (joined.filter(F.col("__cached").isNotNull())
            .withColumn("embedding", F.col("__cached"))
            .select("doc_id", "embedding", F.lit(1).alias("__hit")))
    out = hits.unionByName(
        fresh.select("doc_id", "embedding", F.lit(0).alias("__hit")))
    return out.agg(
        F.count("*").alias("n_total"),
        F.sum("__hit").cast("long").alias("n_cached"),
        F.sum(1 - F.col("__hit")).cast("long").alias("n_embedded"),
        (F.sum(F.when(F.col("embedding").isNull(), 1).otherwise(0)) == 0)
        .alias("all_embedded"))


# ===========================================================================
# Relational-core widening: TPC-H Q6 / Q10 / Q18 shapes
# ===========================================================================

@register("q6_forecast_revenue", headline=True, oracle="""
SELECT round(CAST(sum(CAST(round(l_extendedprice * l_discount * 10000)
                      AS BIGINT)) AS DOUBLE) / 10000.0, 2) AS revenue,
       count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""")
def q6_forecast_revenue(spark: SparkSession, d: str) -> DataFrame:
    """TPC-H Q6 shape: the pure scan-filter-global-agg microbenchmark.
    All three predicates push to the parquet scan (min/max row-group
    pruning on l_shipdate — at 100 TB with date-sorted ingest this
    skips most of the table before reading a byte) and only 4 columns
    survive ReadSchema.  The revenue term is integer-scaled before
    summing (the ev_rollup_sets convention) so the single global sum
    is FP-order independent and oracle-exact regardless of partition
    count or engine."""
    li = _t(spark, d, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24))
    scaled = F.round(F.col("l_extendedprice") * F.col("l_discount")
                     * 10000).cast("long")
    return li.agg(
        F.round(F.sum(scaled) / 10000.0, 2).alias("revenue"),
        F.count("*").alias("n_lines"))


@register("q10_returned_items", oracle="""
SELECT c_custkey, c_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       round(c_acctbal, 2) AS acctbal, n_name
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-07-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""")
def q10_returned_items(spark: SparkSession, d: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item report): date-windowed orders x
    returnflag-filtered lineitem -> customer/nation decoration -> agg
    -> top-20.  Join order matters at scale: lineitem joins orders
    FIRST (both fact-sized, filtered before the shuffle), then the
    k-reduced aggregate side meets customer; only nation (25 rows,
    fixed) is force-broadcast — customer scales with sf so its
    strategy is left to AQE, same policy as q3/q5.  Deterministic
    c_custkey tiebreak on the top-k."""
    nation = _t(spark, d, "nation").select("n_nationkey", "n_name")
    cust = _t(spark, d, "customer")
    orders = _t(spark, d, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1996-07-01"))))
    li = _t(spark, d, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice")
                           * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select("c_custkey", "c_name", "revenue",
                F.round("c_acctbal", 2).alias("acctbal"), "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20))


@register("q4_priority_semijoin", oracle="""
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-07-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
""")
def q4_priority_semijoin(spark: SparkSession, d: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS -> LEFT SEMI join (the
    reference schema lacks commit/receipt dates, so the late-shipment
    predicate is shipdate > orderdate + 60d — same correlated-semi
    structure).  The semi join materializes NO lineitem columns and
    stops probing an order on first match; both sides hash-partition
    on the order key and the date filter prunes the orders scan before
    the shuffle.  Output is 5 rows — the agg is free."""
    orders = _t(spark, d, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1996-07-01"))))
    li = _t(spark, d, "lineitem").select("l_orderkey", "l_shipdate")
    cond = ((orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate
               > orders.o_orderdate + F.expr("INTERVAL 60 DAYS")))
    return (orders.join(li, cond, "left_semi")
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("order_count")))


@register("q12_priority_by_linestatus", oracle="""
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l_linestatus
""")
def q12_priority_by_linestatus(spark: SparkSession, d: str) -> DataFrame:
    """TPC-H Q12 shape: fact-fact equi-join + conditional aggregation
    (CASE inside sum — one pass, no per-branch scans; the schema has
    no shipmode, so linestatus plays the grouping column).  The
    lineitem date filter cuts the probe side before the shuffle;
    orders carries only (key, priority) into the join — two columns
    survive ReadSchema.  Partial aggregation collapses to 2 groups
    map-side."""
    orders = _t(spark, d, "orders").select("o_orderkey", "o_orderpriority")
    li = _t(spark, d, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01")))) \
        .select("l_orderkey", "l_linestatus")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("l_linestatus")
            .agg(F.sum(F.when(high, 1).otherwise(0))
                 .alias("high_line_count"),
                 F.sum(F.when(~high, 1).otherwise(0))
                 .alias("low_line_count")))


@register("q14_promo_revenue", oracle="""
SELECT round(
  100.0 * (CAST(sum(CASE WHEN p_type = 'PROMO'
                 THEN CAST(round(l_extendedprice * (1 - l_discount)
                                 * 10000) AS BIGINT)
                 ELSE 0 END) AS DOUBLE) / 10000.0)
        / (CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
                               * 10000) AS BIGINT)) AS DOUBLE) / 10000.0),
  4) AS promo_revenue_pct,
       count(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01'
  AND l_shipdate < TIMESTAMP '1997-10-01'
""")
def q14_promo_revenue(spark: SparkSession, d: str) -> DataFrame:
    """TPC-H Q14 shape (promotion effect): one-month lineitem slice
    joined to part, a conditional revenue ratio in a single global
    agg.  Revenue terms are integer-scaled (the q6 convention) so the
    ratio is FP-order independent.  part scales with sf, so its join
    side is AQE's choice (broadcast while it fits); the month filter
    makes the probe side tiny long before the join."""
    li = _t(spark, d, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-09-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-10-01"))))
    part = _t(spark, d, "part").select("p_partkey", "p_type")
    scaled = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount"))
                     * 10000).cast("long")
    j = li.join(part, li.l_partkey == part.p_partkey)
    promo = F.sum(F.when(F.col("p_type") == "PROMO", scaled)
                  .otherwise(F.lit(0))) / 10000.0
    total = F.sum(scaled) / 10000.0
    return j.agg(
        F.round(100.0 * promo / total, 4).alias("promo_revenue_pct"),
        F.count("*").alias("n_lines"))


@register("q17_small_quantity_revenue", oracle="""
SELECT round(CAST(sum(CAST(round(l_extendedprice * 10000) AS BIGINT))
                AS DOUBLE) / 10000.0 / 7.0, 2) AS avg_yearly,
       count(*) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#1'
  AND l.l_quantity < (SELECT 0.5 * avg(l2.l_quantity)
                      FROM lineitem l2
                      WHERE l2.l_partkey = l.l_partkey)
""")
def q17_small_quantity_revenue(spark: SparkSession, d: str) -> DataFrame:
    """TPC-H Q17 shape: CORRELATED SCALAR SUBQUERY — each lineitem
    compared against its own part's average quantity (threshold 0.5x;
    the classic 0.2x catches nothing on uniform 1-50 quantities).
    Catalyst de-correlates this into a per-partkey aggregate joined
    back to the fact table — written here AS the subquery via
    spark.sql so the optimizer's rewrite is what's exercised, exactly
    the q4-EXISTS treatment.  The per-part average table is
    |parts|-sized; the brand filter prunes the probe side first.
    Revenue integer-scaled (q6 convention) for the one-row ratio."""
    _t(spark, d, "lineitem").createOrReplaceTempView("__pgrs_li_q17")
    _t(spark, d, "part").createOrReplaceTempView("__pgrs_p_q17")
    return spark.sql("""
        SELECT round(CAST(sum(CAST(round(l_extendedprice * 10000) AS BIGINT))
                       AS DOUBLE) / 10000.0 / 7.0, 2) AS avg_yearly,
               count(*) AS n_lines
        FROM __pgrs_li_q17 l
        JOIN __pgrs_p_q17 p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#1'
          AND l.l_quantity < (SELECT 0.5 * avg(l2.l_quantity)
                              FROM __pgrs_li_q17 l2
                              WHERE l2.l_partkey = l.l_partkey)
    """)


@register("q22_active_without_errors", oracle="""
SELECT c.c_mktsegment, count(*) AS n_customers,
       round(avg(c.c_acctbal), 4) AS avg_acctbal
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
  AND NOT EXISTS (SELECT 1 FROM events e
                  WHERE e.user_id = c.c_custkey
                    AND e.event_type = 'error')
GROUP BY c.c_mktsegment
""")
def q22_active_without_errors(spark: SparkSession, d: str) -> DataFrame:
    """TPC-H Q22 flavor: EXISTS + NOT EXISTS on one query — customers
    WITH orders but WITHOUT error events, per segment.  Catalyst plans
    the pair as a left-SEMI join chained with a left-ANTI join (both
    key-only probes, no subquery re-execution per row); the cross-
    domain anti side (events) shows the same rewrite holds across
    tables of different grain.  avg over sub-penny acctbal values is
    rounded; counts exact."""
    cust = _t(spark, d, "customer")
    cust.createOrReplaceTempView("__pgrs_c_q22")
    _t(spark, d, "orders").createOrReplaceTempView("__pgrs_o_q22")
    _t(spark, d, "events").createOrReplaceTempView("__pgrs_e_q22")
    return spark.sql("""
        SELECT c.c_mktsegment, count(*) AS n_customers,
               round(avg(c.c_acctbal), 4) AS avg_acctbal
        FROM __pgrs_c_q22 c
        WHERE EXISTS (SELECT 1 FROM __pgrs_o_q22 o
                      WHERE o.o_custkey = c.c_custkey)
          AND NOT EXISTS (SELECT 1 FROM __pgrs_e_q22 e
                          WHERE e.user_id = c.c_custkey
                            AND e.event_type = 'error')
        GROUP BY c.c_mktsegment
    """)


@register("q18_large_volume_customers", oracle="""
WITH big AS (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey HAVING sum(l_quantity) > 200
)
SELECT c_name, c_custkey, o_orderkey, o_orderdate,
       round(o_totalprice, 2) AS totalprice,
       round(sum(l_quantity), 2) AS sum_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (SELECT l_orderkey FROM big)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY totalprice DESC, o_orderkey
LIMIT 100
""")
def q18_large_volume_customers(spark: SparkSession, d: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): a HAVING-filtered
    self-aggregation of the fact table feeds a semi-join back onto
    itself.  The scale play: aggregate lineitem by orderkey FIRST
    (map-side partial agg collapses the fact table to one row per
    order before any join), semi-join filter the orders, and only then
    decorate with customer.  The big-orders set is selective (~0.9% of
    orders here) so the second pass over lineitem meets an
    AQE-broadcastable filter side; at 100 TB both sides of that join
    hash-partition on l_orderkey/o_orderkey and the shuffle carries
    the filtered minority, not the corpus.  Deterministic o_orderkey
    tiebreak."""
    li = _t(spark, d, "lineitem")
    big = (li.groupBy("l_orderkey")
           .agg(F.sum("l_quantity").alias("__q"))
           .filter(F.col("__q") > 200)
           .select("l_orderkey", F.round("__q", 2).alias("sum_qty")))
    orders = _t(spark, d, "orders")
    cust = _t(spark, d, "customer")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate",
                F.round("o_totalprice", 2).alias("totalprice"), "sum_qty")
        .orderBy(F.desc("totalprice"), "o_orderkey")
        .limit(100))


@register("ev_anomaly_zscore", oracle="""
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         count(*) AS n
  FROM events GROUP BY 1, 2
), scored AS (
  SELECT event_type, CAST(day AS VARCHAR) AS day, n,
         avg(n) OVER w AS mu,
         stddev_samp(n) OVER w AS sigma,
         count(*) OVER w AS n_baseline
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
)
SELECT event_type, day, n, round(mu, 4) AS baseline_mean,
       CASE WHEN sigma IS NULL OR sigma = 0 THEN FALSE
            ELSE abs(n - mu) / sigma > 2 END AS is_anomaly
FROM scored WHERE n_baseline >= 3
""")
def ev_anomaly_zscore(spark: SparkSession, d: str) -> DataFrame:
    """Trailing-baseline anomaly detection: each (event_type, day)
    count is z-scored against ITS OWN preceding 7 days (frame ends at
    -1 PRECEDING, so today never contaminates its baseline — the
    classic monitoring-pipeline subtlety), flagged when |z| > 2; days
    with under 3 baseline points are suppressed (cold start).

    The z-score itself stays out of the output (stddev is the one
    aggregate whose FP path differs across engines); the DECISION
    |z|>2 and the 4-rounded mean are the stable contract.  Plan: one
    partial-agged daily rollup (the only pass over raw events), then
    per-type windows over day-count rows — weeks x types rows,
    metadata-scale at any corpus size."""
    ev = _t(spark, d, "events")
    daily = (ev.groupBy(
        "event_type",
        F.date_trunc("DAY", F.col("ts").cast("timestamp"))
        .cast("date").alias("day"))
        .agg(F.count("*").alias("n")))
    w = (Window.partitionBy("event_type").orderBy("day")
         .rowsBetween(-7, -1))
    scored = (daily
              .withColumn("mu", F.avg("n").over(w))
              .withColumn("sigma", F.stddev_samp("n").over(w))
              .withColumn("n_baseline", F.count("*").over(w)))
    return (scored.filter(F.col("n_baseline") >= 3)
            .select("event_type", F.col("day").cast("string").alias("day"),
                    "n", F.round("mu", 4).alias("baseline_mean"),
                    F.when(F.col("sigma").isNull() | (F.col("sigma") == 0),
                           F.lit(False))
                    .otherwise(F.abs(F.col("n") - F.col("mu"))
                               / F.col("sigma") > 2)
                    .alias("is_anomaly")))


@register("ev_incremental_rollup", oracle="""
SELECT CAST(CAST(date_trunc('day', ts) AS DATE) AS VARCHAR) AS day,
       event_type, count(*) AS n_events,
       CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT)
         AS value_scaled
FROM events GROUP BY 1, 2
""")
def ev_incremental_rollup(spark: SparkSession, d: str) -> DataFrame:
    """Incremental MATERIALIZED-VIEW maintenance (the hypertable
    continuous-aggregate loop): a day x type rollup store is built
    from the historical half of the event log, then the 'new' half
    arrives as a batch and is folded in by merging PARTIAL aggregates
    — union the stored partials with the increment's partials and
    re-aggregate — NOT by recomputing over all events.  The oracle is
    the full recompute, so the merge is proven lossless.

    Why this is the 100 TB shape: count and integer-scaled sum are
    algebraic — partials merge associatively, so maintenance cost is
    O(increment + touched rollup rows), independent of history size
    (avg/stddev ride along as (sum, count) / (sum, sum2, count)).  The
    rollup store is day-partitioned parquet; only days present in the
    increment are rewritten (dynamic partition overwrite — the
    sources.tables upsert pattern)."""
    import shutil
    from .catalog_more import _scratch
    ev = _t(spark, d, "events").withColumn(
        "day", F.date_trunc("DAY", F.col("ts").cast("timestamp"))
        .cast("date").cast("string"))
    scaled = F.round(F.col("value") * 10000).cast("long")

    def rollup(df: DataFrame) -> DataFrame:
        return (df.groupBy("day", "event_type")
                .agg(F.count("*").alias("n_events"),
                     F.sum(scaled).alias("value_scaled")))

    cut = "2024-01-15"
    store = _scratch("ev_rollup_store")
    shutil.rmtree(store, ignore_errors=True)
    rollup(ev.filter(F.col("day") < cut)).write.parquet(store)
    increment = rollup(ev.filter(F.col("day") >= cut))
    merged = (spark.read.parquet(store)
              .unionByName(increment)
              .groupBy("day", "event_type")
              .agg(F.sum("n_events").alias("n_events"),
                   F.sum("value_scaled").alias("value_scaled")))
    return merged


@register("ev_type_pivot", oracle="""
SELECT CAST(CAST(date_trunc('day', ts) AS DATE) AS VARCHAR) AS day,
       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
            AS BIGINT) AS click,
       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
            AS BIGINT) AS error,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
            AS BIGINT) AS purchase,
       CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
            AS BIGINT) AS signup,
       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
            AS BIGINT) AS view
FROM events GROUP BY 1
""")
def ev_type_pivot(spark: SparkSession, d: str) -> DataFrame:
    """PIVOT: events long->wide, one count column per event type per
    day.  The pivot VALUES ARE SPECIFIED explicitly — without the
    list, Spark first runs a whole-table distinct to discover the
    columns (an extra job + a schema that changes with the data);
    with it, the pivot compiles to one conditional-count hash
    aggregation, exactly the CASE-sum oracle.  At 100 TB: one scan,
    one partial-agged exchange keyed by day — and a bounded, stable
    output schema, which is the production requirement for anything
    downstream of a pivot."""
    ev = _t(spark, d, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    return (ev.groupBy(F.date_trunc("DAY", F.col("ts").cast("timestamp"))
                       .cast("date").cast("string").alias("day"))
            .pivot("event_type", types)
            .count()
            .na.fill(0, types))


@register("ev_heavy_hitters", oracle="""
WITH exact AS (
  SELECT user_id, count(*) AS n FROM events GROUP BY user_id
  ORDER BY n DESC, user_id LIMIT 10
)
SELECT user_id, n FROM exact
""")
def ev_heavy_hitters(spark: SparkSession, d: str) -> DataFrame:
    """Heavy hitters: exact top-10 users by event count (deterministic
    id tiebreak) — one partial-agged shuffle + TakeOrderedAndProject.
    At 100 TB with millions of keys this exact form stays cheap
    (per-key counts partial-aggregate map-side; only |users| rows
    shuffle); when even that is too much — unbounded key spaces,
    streaming — swap in a count-min sketch / space-saving summary per
    partition and merge, trading exactness for O(sketch) state.  The
    exact form IS the oracle; the approximate twin's error gate
    pattern is a5_approx_gate."""
    ev = _t(spark, d, "events")
    return (ev.groupBy("user_id").agg(F.count("*").alias("n"))
            .orderBy(F.desc("n"), "user_id").limit(10))


def _rrf_oracle() -> str:
    from .catalog_ext import QUERY_TERMS
    cos = OV.cosine_sql("embedding", OV.vec_lit_sql(QUERY_VEC))
    ovlp = OV.overlap_score_sql("text", QUERY_TERMS)
    return f"""
WITH vec AS (
  SELECT id, rnk FROM (
    SELECT vec_id AS id,
           row_number() OVER (ORDER BY {cos} DESC, vec_id) AS rnk
    FROM embeddings) WHERE rnk <= 40
), txt AS (
  SELECT id, rnk FROM (
    SELECT doc_id AS id,
           row_number() OVER (ORDER BY {ovlp} DESC, doc_id) AS rnk
    FROM documents) WHERE rnk <= 40
), unioned AS (
  SELECT id, rnk FROM vec UNION ALL SELECT id, rnk FROM txt
), fused AS (
  SELECT id, round(sum(1.0 / (60 + rnk)), 6) AS rrf_score,
         count(*) AS n_branches
  FROM unioned GROUP BY id
)
SELECT id, rrf_score, CAST(n_branches AS INT) AS n_branches
FROM fused ORDER BY rrf_score DESC, id LIMIT 20
"""


@register("r7_hybrid_rrf", oracle=_rrf_oracle())
def r7_hybrid_rrf(spark: SparkSession, d: str) -> DataFrame:
    """Hybrid fusion by RECIPROCAL RANK (RRF, k=60) — the fusion Atlas
    $rankFusion and Elastic standardize on, next to the reference's
    weighted-score fusion (r7_hybrid_fusion): each branch contributes
    1/(60+rank), so fusion is SCALE-FREE — no score-normalization
    problem between cosine in [-1,1] and unbounded overlap counts,
    the exact mismatch A2's 0.7/0.3 weights paper over.  Ranks carry
    id tiebreaks, making the fusion integer-deterministic; the only
    float is the final reciprocal sum, rounded on both sides.  Same
    two branch scans and k-bounded shuffles as r7_hybrid_fusion."""
    from .catalog_ext import _overlap_score, with_cosine_q
    emb = _t(spark, d, "embeddings")
    docs = _t(spark, d, "documents")
    wv = Window.orderBy(F.desc("__cos_q"), F.col("vec_id"))
    vec = (with_cosine_q(emb)
           .select(F.col("vec_id").alias("id"),
                   F.row_number().over(wv).alias("rnk"))
           .filter(F.col("rnk") <= 40))
    wt = Window.orderBy(F.desc(_overlap_score(F.col("text"))),
                        F.col("doc_id"))
    txt = (docs.select(F.col("doc_id").alias("id"),
                       F.row_number().over(wt).alias("rnk"))
           .filter(F.col("rnk") <= 40))
    unioned = vec.unionByName(txt)
    return (unioned.groupBy("id")
            .agg(F.round(F.sum(1.0 / (60 + F.col("rnk"))), 6)
                 .alias("rrf_score"),
                 F.count("*").cast("int").alias("n_branches"))
            .orderBy(F.desc("rrf_score"), "id").limit(20))


def _mmr_oracle(lam: float = 0.7, k: int = 5) -> str:
    """Unrolled-step SQL replay of full MMR over the top-10 overlap
    candidates: per step, remaining candidates score
    lam*rel - (1-lam)*max_sim_to_selected and the argmax joins the
    selected set (ties -> lowest rank index, matching the operator's
    strict-> first-in-order rule).  Float literals carry Python's
    exact repr so both engines compute bit-identical MMR values."""
    from .catalog_ext import QUERY_TERMS
    ov = OV.overlap_score_sql("text", QUERY_TERMS)
    toks = OV.tokens_sql("text")
    one_minus = repr(1 - lam)
    parts = [f"""
WITH cand0 AS (
  SELECT doc_id, {ov} AS score, text
  FROM documents ORDER BY score DESC, doc_id LIMIT 10
), cand AS (
  SELECT doc_id, score, list_distinct({toks}) AS toks,
         row_number() OVER (ORDER BY score DESC, text, doc_id) - 1 AS rn
  FROM cand0
), simj AS (
  SELECT a.rn AS rn_a, b.rn AS rn_b,
         CASE WHEN len(a.toks) = 0 AND len(b.toks) = 0 THEN 1.0
              WHEN len(a.toks) = 0 OR len(b.toks) = 0 THEN 0.0
              ELSE len(list_intersect(a.toks, b.toks))::DOUBLE
                   / len(list_distinct(a.toks || b.toks)) END AS j
  FROM cand a JOIN cand b ON a.rn <> b.rn
), sel1 AS (
  SELECT rn, 1 AS pick FROM cand ORDER BY score DESC, rn LIMIT 1
)"""]
    for i in range(2, k + 1):
        parts.append(f""", m{i} AS (
  SELECT c.rn, {lam!r} * c.score
           - {one_minus} * coalesce(max(s.j), 0.0::DOUBLE) AS mmr
  FROM cand c
  LEFT JOIN simj s ON s.rn_b = c.rn
       AND s.rn_a IN (SELECT rn FROM sel{i - 1})
  WHERE c.rn NOT IN (SELECT rn FROM sel{i - 1})
  GROUP BY c.rn, c.score
), sel{i} AS (
  SELECT * FROM sel{i - 1}
  UNION ALL
  SELECT rn, {i} AS pick FROM
    (SELECT rn FROM m{i} ORDER BY mmr DESC, rn LIMIT 1) t
)""")
    parts.append(f"""
SELECT 'q1' AS query_id, c.doc_id, round(c.score, 6) AS score,
       s.pick AS mmr_rank
FROM sel{k} s JOIN cand c ON c.rn = s.rn
""")
    return "".join(parts)


@register("w8_mmr_rerank", oracle=_mmr_oracle())
def w8_mmr_rerank(spark: SparkSession, d: str) -> DataFrame:
    """Full MMR reranking (fusion.mmr_rerank) over the same top-10
    overlap candidates w5_greedy_diversity filters: true MMR
    re-scores every step (lam*relevance - (1-lam)*max-sim-to-
    selected) instead of a hard Jaccard cutoff, so diversity trades
    continuously against relevance.  The sequential loop is
    SQL-replayed step by step (unrolled argmax CTEs, bit-identical
    float literals) — the strongest determinism claim a greedy
    reranker can make."""
    from ..operators import fusion
    from .catalog_ext import _overlap_score
    docs = _t(spark, d, "documents")
    results = (docs.select(
        F.lit("q1").alias("query_id"),
        F.col("doc_id"),
        _overlap_score(F.col("text")).alias("score"),
        F.col("text").alias("content"))
        .orderBy(F.desc("score"), "doc_id").limit(10))
    out = fusion.mmr_rerank(results, id_col="doc_id")
    return out.select("query_id", "doc_id",
                      F.round("score", 6).alias("score"), "mmr_rank")


@register("ev_heavy_hitters_approx", oracle="""
SELECT CAST(10 AS INT) AS n_items, TRUE AS counts_match_exact,
       TRUE AS min_count_ok
""")
def ev_heavy_hitters_approx(spark: SparkSession, d: str) -> DataFrame:
    """Sketch twin of ev_heavy_hitters: approx_top_k (frequent-items
    sketch) with an in-plan gate built to be TIE-ROBUST — among equal
    counts the sketch may legitimately pick different ids than the
    exact query's id-tiebreak, so the gate checks what IS contractual:
    (a) every reported count equals that key's exact count (the
    sketch's capacity exceeds the key cardinality here, so counts are
    exact), and (b) every reported item's count reaches the exact
    10th-place count.  At 100 TB with unbounded keys this sketch IS
    the heavy-hitters plan; the counts become approximate and gate (a)
    relaxes to an epsilon band."""
    ev = _t(spark, d, "events")
    ev.createOrReplaceTempView("__pgrs_ev_hh")
    approx = spark.sql("""
        SELECT explode(approx_top_k(user_id, 10, 16384)) AS it
        FROM __pgrs_ev_hh
    """).select(F.col("it.item").alias("user_id"),
                F.col("it.count").alias("approx_n"))
    exact = ev.groupBy("user_id").agg(F.count("*").alias("n"))
    tenth = (exact.orderBy(F.desc("n"), "user_id").limit(10)
             .agg(F.min("n").alias("__t")))
    j = approx.join(exact, "user_id", "left").crossJoin(F.broadcast(tenth))
    return j.agg(
        F.count("*").cast("int").alias("n_items"),
        (F.sum(F.when(F.col("approx_n") == F.col("n"), 0).otherwise(1))
         == 0).alias("counts_match_exact"),
        (F.sum(F.when(F.col("approx_n") >= F.col("__t"), 0).otherwise(1))
         == 0).alias("min_count_ok"))


@register("ev_retention_cohorts", oracle="""
WITH acts AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS act_week FROM events
), firsts AS (
  SELECT user_id, min(act_week) AS cohort_week FROM acts GROUP BY user_id
)
SELECT CAST(CAST(f.cohort_week AS DATE) AS VARCHAR) AS cohort_week,
       CAST(datediff('day', f.cohort_week, a.act_week) // 7 AS INT)
         AS week_offset,
       count(*) AS n_active
FROM acts a JOIN firsts f ON a.user_id = f.user_id
GROUP BY 1, 2
""")
def ev_retention_cohorts(spark: SparkSession, d: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by first-active week
    (the cohort), counted in each later week they were active —
    the standard product-analytics retention triangle, over the event
    log.

    Plan: distinct (user, week) pairs FIRST (collapses the event
    volume to |users| x |weeks| before anything else), then the
    cohort assignment is a self-aggregation on user_id — the distinct,
    the min-agg, and the join all share the user_id hash partitioning,
    so AQE/exchange-reuse keeps it to one fact-sized shuffle plus
    metadata-sized ones.  The final (cohort, offset) agg outputs at
    most weeks^2 rows.  At 100 TB: identical shape; the distinct is
    the only pass that sees raw events."""
    ev = _t(spark, d, "events")
    wk = F.date_trunc("WEEK", F.col("ts").cast("timestamp"))
    acts = ev.select("user_id", wk.alias("act_week")).distinct()
    firsts = (acts.groupBy("user_id")
              .agg(F.min("act_week").alias("cohort_week")))
    j = acts.join(firsts, "user_id")
    return (j.groupBy(
                F.col("cohort_week").cast("date").cast("string")
                .alias("cohort_week"),
                F.floor(F.datediff(F.col("act_week"), F.col("cohort_week"))
                        / 7).cast("int").alias("week_offset"))
            .agg(F.count("*").alias("n_active")))


@register("s21_bucketed_join", oracle="""
SELECT o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_lines, TRUE AS no_exchange
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
""")
def s21_bucketed_join(spark: SparkSession, d: str) -> DataFrame:
    """Bucketed CO-LOCATED join, driver-visible: write lineitem and
    orders bucketed+sorted by the order key (the reference's btree
    index re-expressed as storage layout, index_manager.py:345-407 ->
    SURVEY §2.11), then join WITHOUT any Exchange — verified in-plan
    (broadcast disabled so bucketing, not broadcasting, is what's
    proven) and emitted as the no_exchange column the oracle pins to
    TRUE.  At 100 TB this is the difference between shuffling the
    fact table on every join and a local zip of pre-sorted buckets;
    the one-off bucketed write is amortized across every downstream
    join on the same key."""
    import shutil
    from .catalog_more import _scratch
    wh = _scratch("s21_bucketed")
    shutil.rmtree(wh, ignore_errors=True)
    li = _t(spark, d, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount")
    orders = _t(spark, d, "orders").select("o_orderkey", "o_orderpriority")
    spark.sql("DROP TABLE IF EXISTS s21_li")
    spark.sql("DROP TABLE IF EXISTS s21_orders")
    (li.write.mode("overwrite").option("path", f"{wh}/li")
       .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
       .saveAsTable("s21_li"))
    (orders.write.mode("overwrite").option("path", f"{wh}/orders")
       .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
       .saveAsTable("s21_orders"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (spark.table("s21_li")
                  .join(spark.table("s21_orders"),
                        F.col("l_orderkey") == F.col("o_orderkey"))
                  .groupBy("o_orderpriority")
                  .agg(F.round(F.sum(F.col("l_extendedprice")
                                     * (1 - F.col("l_discount"))), 2)
                       .alias("revenue"),
                       F.count("*").alias("n_lines")))
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    join_part = plan.split("HashAggregate")[-1]
    no_exchange = ("Exchange" not in join_part
                   and "Bucketed: true" in plan)
    return joined.select("o_orderpriority", "revenue", "n_lines",
                         F.lit(no_exchange).alias("no_exchange"))


# ===========================================================================
# Incremental ingest: dedup the incoming batch against the stored corpus
# ===========================================================================

@register("s15_incremental_ingest", oracle="""
WITH store AS (
  SELECT md5(coalesce(text, '')) AS h FROM documents WHERE doc_id % 2 = 0
), batch AS (
  SELECT doc_id, md5(coalesce(text, '')) AS h
  FROM documents WHERE doc_id % 2 = 1
), fresh AS (
  SELECT * FROM batch WHERE h NOT IN (SELECT h FROM store)
), keep AS (
  SELECT h, min(doc_id) AS keeper FROM fresh GROUP BY h
)
SELECT f.doc_id, f.h AS content_hash, (f.doc_id = k.keeper) AS is_keeper
FROM fresh f JOIN keep k USING (h)
""")
def s15_incremental_ingest(spark: SparkSession, d: str) -> DataFrame:
    """Ingest-time dedup against the EXISTING store (the reference's
    store-with-retry path re-checks per document,
    vector_store.py:125-178; here it's one set operation): hash the
    incoming batch, LEFT ANTI join against the stored hash set, then
    resolve in-batch duplicates with a min-id keeper.  Even doc_ids
    play the store, odd the incoming batch.

    At 100 TB the anti-join is the scaling decision: the stored hash
    set is corpus-sized, so no broadcast — it becomes a shuffled
    anti-join on the uniform crypto hash (no skew).  The cheap upgrade
    is a bloom filter built from the store's hashes applied map-side
    to the batch BEFORE the shuffle (false positives re-checked by the
    join); Spark's AQE does this automatically for inner joins
    (runtime row-level filtering), anti-joins get it manually."""
    docs = _t(spark, d, "documents")
    h = F.md5(F.coalesce(F.col("text"), F.lit("")))
    store = (docs.filter(F.col("doc_id") % 2 == 0)
             .select(h.alias("content_hash")))
    batch = (docs.filter(F.col("doc_id") % 2 == 1)
             .select("doc_id", h.alias("content_hash")))
    fresh = batch.join(store, "content_hash", "left_anti")
    w = Window.partitionBy("content_hash")
    return (fresh.withColumn("__keeper", F.min("doc_id").over(w))
            .select("doc_id", "content_hash",
                    (F.col("doc_id") == F.col("__keeper")).alias("is_keeper")))


# ===========================================================================
# TPC-H relational widening, part 2: Q7/Q8/Q13/Q19/Q21 shapes
# (partsupp-free adaptations; the testdata has no partsupp table, so
# Q2/Q11/Q16/Q20 are out of reach by construction)
# ===========================================================================

@register("q7_volume_shipping", oracle="""
SELECT supp_nation, cust_nation, l_year,
       round(CAST(sum(scaled) AS DOUBLE) / 10000.0, 2) AS revenue,
       count(*) AS n_lines
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         year(l.l_shipdate) AS l_year,
         CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000)
              AS BIGINT) AS scaled
  FROM lineitem l
  JOIN orders o   ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
  JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
  WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
    AND l.l_shipdate < TIMESTAMP '1998-01-01'
    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
)
GROUP BY supp_nation, cust_nation, l_year
""")
def q7_volume_shipping(spark: SparkSession, d: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping): bidirectional nation-pair
    trade volume by ship year.  Scale play: the nation-pair predicate
    is pushed to BOTH dimension legs before the fact joins —
    s_nationkey/c_nationkey are each filtered to the two-key set
    {1, 2} (broadcast-sized dims), so only ~(2/25)^2 of
    customer x supplier survive to meet the fact table; the asymmetric
    pair-direction predicate runs post-join on the already-shrunk
    rows.  Revenue integer-scaled (q6 convention) so the 4-group sums
    are FP-order independent."""
    li = _t(spark, d, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01"))))
    orders = _t(spark, d, "orders").select("o_orderkey", "o_custkey")
    nation = _t(spark, d, "nation")
    n1 = (nation.filter(F.col("n_name").isin("NATION_1", "NATION_2"))
          .select(F.col("n_nationkey").alias("__snk"),
                  F.col("n_name").alias("supp_nation")))
    n2 = (nation.filter(F.col("n_name").isin("NATION_1", "NATION_2"))
          .select(F.col("n_nationkey").alias("__cnk"),
                  F.col("n_name").alias("cust_nation")))
    supp = (_t(spark, d, "supplier").select("s_suppkey", "s_nationkey")
            .join(F.broadcast(n1), F.col("s_nationkey") == F.col("__snk")))
    cust = (_t(spark, d, "customer").select("c_custkey", "c_nationkey")
            .join(F.broadcast(n2), F.col("c_nationkey") == F.col("__cnk")))
    scaled = (F.round(F.col("l_extendedprice") * (1 - F.col("l_discount"))
                      * 10000).cast("long"))
    j = (li.join(orders, li.l_orderkey == orders.o_orderkey)
         .join(cust, orders.o_custkey == cust.c_custkey)
         .join(supp, li.l_suppkey == supp.s_suppkey)
         .filter(((F.col("supp_nation") == "NATION_1")
                  & (F.col("cust_nation") == "NATION_2"))
                 | ((F.col("supp_nation") == "NATION_2")
                    & (F.col("cust_nation") == "NATION_1"))))
    return (j.groupBy("supp_nation", "cust_nation",
                      F.year("l_shipdate").alias("l_year"))
            .agg(F.round(F.sum(scaled).cast("double") / 10000.0, 2)
                 .alias("revenue"),
                 F.count("*").alias("n_lines")))


@register("q8_market_share", oracle="""
SELECT o_year,
       round(CAST(sum(CASE WHEN supp_nation = 'NATION_7'
                           THEN scaled ELSE 0 END) AS DOUBLE)
             / CAST(sum(scaled) AS DOUBLE), 4) AS mkt_share,
       count(*) AS n_lines
FROM (
  SELECT year(o.o_orderdate) AS o_year, n1.n_name AS supp_nation,
         CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000)
              AS BIGINT) AS scaled
  FROM lineitem l
  JOIN part p     ON p.p_partkey = l.l_partkey
  JOIN orders o   ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
  JOIN region r   ON r.r_regionkey = n2.n_regionkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
  WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
    AND o.o_orderdate >= TIMESTAMP '1996-01-01'
    AND o.o_orderdate < TIMESTAMP '1998-01-01'
)
GROUP BY o_year
""")
def q8_market_share(spark: SparkSession, d: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): NATION_7's share of
    ECONOMY-part revenue sold into ASIA, by order year.  The
    snowflake leg (customer -> nation -> region = 'ASIA') is resolved
    dim-side first: region filters nation to 5 keys, that broadcast
    filters customer before it ever meets orders.  The p_type filter
    prunes part the same way.  The share is a conditional-sum ratio
    over integer-scaled revenue in one agg pass — no second join, the
    numerator rides the same rows with a CASE."""
    li = _t(spark, d, "lineitem")
    part = (_t(spark, d, "part").filter(F.col("p_type") == "ECONOMY")
            .select("p_partkey"))
    orders = _t(spark, d, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1998-01-01")))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    nation = _t(spark, d, "nation")
    region = _t(spark, d, "region").filter(F.col("r_name") == "ASIA")
    asia_nk = (nation.join(F.broadcast(region),
                           nation.n_regionkey == region.r_regionkey)
               .select(F.col("n_nationkey").alias("__ank")))
    cust = (_t(spark, d, "customer").select("c_custkey", "c_nationkey")
            .join(F.broadcast(asia_nk),
                  F.col("c_nationkey") == F.col("__ank")))
    n1 = nation.select(F.col("n_nationkey").alias("__snk"),
                       F.col("n_name").alias("supp_nation"))
    supp = (_t(spark, d, "supplier").select("s_suppkey", "s_nationkey")
            .join(F.broadcast(n1), F.col("s_nationkey") == F.col("__snk")))
    scaled = (F.round(F.col("l_extendedprice") * (1 - F.col("l_discount"))
                      * 10000).cast("long"))
    j = (li.join(part, li.l_partkey == part.p_partkey)
         .join(orders, li.l_orderkey == orders.o_orderkey)
         .join(cust, orders.o_custkey == cust.c_custkey)
         .join(supp, li.l_suppkey == supp.s_suppkey))
    num = F.sum(F.when(F.col("supp_nation") == "NATION_7", scaled)
                .otherwise(F.lit(0))).cast("double")
    den = F.sum(scaled).cast("double")
    return (j.groupBy(F.year("o_orderdate").alias("o_year"))
            .agg(F.round(num / den, 4).alias("mkt_share"),
                 F.count("*").alias("n_lines")))


@register("q13_order_count_distribution", oracle="""
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                    AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
GROUP BY c_count
""")
def q13_order_count_distribution(spark: SparkSession, d: str) -> DataFrame:
    """TPC-H Q13 shape (customer order-count distribution): LEFT
    OUTER join with a predicate INSIDE the join condition (the
    original's NOT LIKE on o_comment, adapted to o_orderpriority
    since the testdata carries no comments), so customers whose only
    orders are urgent still appear with c_count = 0.  Two-level agg:
    count per customer (shuffle on c_custkey, the fact side
    pre-filtered map-side), then the histogram over counts (25-ish
    groups, trivially small).  count(o_orderkey) over the null-
    extended rows gives the 0 bucket for free."""
    cust = _t(spark, d, "customer").select("c_custkey")
    orders = (_t(spark, d, "orders")
              .filter(F.col("o_orderpriority") != "1-URGENT")
              .select("o_custkey", "o_orderkey"))
    per_cust = (cust.join(orders, cust.c_custkey == orders.o_custkey,
                          "left")
                .groupBy("c_custkey")
                .agg(F.count("o_orderkey").alias("c_count")))
    return (per_cust.groupBy("c_count")
            .agg(F.count("*").alias("custdist")))


@register("q19_disjunctive_revenue", oracle="""
SELECT round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
                                 * 10000) AS BIGINT)) AS DOUBLE)
             / 10000.0, 2) AS revenue,
       count(*) AS n_lines
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 1 AND 15)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 5 AND 20
       AND l.l_quantity BETWEEN 10 AND 25)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 15 AND 30
       AND l.l_quantity BETWEEN 20 AND 35)
""")
def q19_disjunctive_revenue(spark: SparkSession, d: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue, OR-of-ANDs): three
    brand/size/quantity branches OR'd across a part join.  The
    classic optimization is written explicitly: the disjunction
    IMPLIES coarse single-table prefilters (p_brand IN the 3 brands,
    p_size/l_quantity in the branch envelopes), which are added as
    redundant conjuncts so each scan prunes BEFORE the join — the OR
    itself can't push down, its implied envelope can.  Semantically a
    no-op (implied predicates), so the oracle omits them; at scale
    they turn an all-parts join into a 3-brand join."""
    li = (_t(spark, d, "lineitem")
          .filter(F.col("l_quantity").between(1, 35)))
    part = (_t(spark, d, "part")
            .filter(F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
                    & F.col("p_size").between(1, 30))
            .select("p_partkey", "p_brand", "p_size"))
    j = li.join(part, li.l_partkey == part.p_partkey)
    branch = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 10)
         & F.col("l_quantity").between(1, 15))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(5, 20)
           & F.col("l_quantity").between(10, 25))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(15, 30)
           & F.col("l_quantity").between(20, 35)))
    scaled = (F.round(F.col("l_extendedprice") * (1 - F.col("l_discount"))
                      * 10000).cast("long"))
    return (j.filter(branch)
            .agg(F.round(F.sum(scaled).cast("double") / 10000.0, 2)
                 .alias("revenue"),
                 F.count("*").alias("n_lines")))


@register("q21_waiting_supplier", oracle="""
SELECT s.s_name, count(*) AS numwait
FROM supplier s
JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
JOIN orders o    ON o.o_orderkey = l1.l_orderkey
JOIN nation n    ON n.n_nationkey = s.s_nationkey
WHERE o.o_orderstatus = 'F'
  AND n.n_name = 'NATION_3'
  AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 50
""")
def q21_waiting_supplier(spark: SparkSession, d: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): the
    supplier was LATE on a finished multi-supplier order and every
    OTHER supplier on that order was on time.  Lateness is adapted to
    l_shipdate > o_orderdate + 60 days (the testdata has no
    commit/receipt dates).  Written as EXISTS + correlated NOT EXISTS
    over the same fact table via spark.sql — Catalyst rewrites the
    pair into a left-semi + left-anti join on l_orderkey (the q22
    treatment), so the fact table is scanned three times but joined
    key-only, never re-executed per row; all three legs hash-
    partition on l_orderkey so at 100 TB the semi/anti probes
    co-locate with the driving scan.  Deterministic s_name tiebreak
    under the top-50."""
    _t(spark, d, "supplier").createOrReplaceTempView("__pgrs_s_q21")
    _t(spark, d, "lineitem").createOrReplaceTempView("__pgrs_l_q21")
    _t(spark, d, "orders").createOrReplaceTempView("__pgrs_o_q21")
    _t(spark, d, "nation").createOrReplaceTempView("__pgrs_n_q21")
    return spark.sql("""
        SELECT s.s_name, count(*) AS numwait
        FROM __pgrs_s_q21 s
        JOIN __pgrs_l_q21 l1 ON l1.l_suppkey = s.s_suppkey
        JOIN __pgrs_o_q21 o  ON o.o_orderkey = l1.l_orderkey
        JOIN __pgrs_n_q21 n  ON n.n_nationkey = s.s_nationkey
        WHERE o.o_orderstatus = 'F'
          AND n.n_name = 'NATION_3'
          AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAYS
          AND EXISTS (SELECT 1 FROM __pgrs_l_q21 l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM __pgrs_l_q21 l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > o.o_orderdate
                                                + INTERVAL 60 DAYS)
        GROUP BY s.s_name
        ORDER BY numwait DESC, s.s_name
        LIMIT 50
    """)


@register("ev_rfm_segments", oracle="""
WITH pur AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
), anchor AS (SELECT max(day) AS max_day FROM pur),
per_user AS (
  SELECT p.user_id,
         date_diff('day', max(p.day), a.max_day) AS recency_days,
         count(*) AS frequency,
         CAST(sum(p.cents) AS BIGINT) AS monetary_cents
  FROM pur p CROSS JOIN anchor a
  GROUP BY p.user_id, a.max_day
), scored AS (
  SELECT user_id, monetary_cents,
         ntile(4) OVER (ORDER BY recency_days, user_id) AS r_quartile,
         ntile(4) OVER (ORDER BY frequency DESC, user_id) AS f_quartile,
         ntile(4) OVER (ORDER BY monetary_cents DESC, user_id)
           AS m_quartile
  FROM per_user
)
SELECT r_quartile, f_quartile, m_quartile,
       count(*) AS n_users,
       round(CAST(sum(monetary_cents) AS DOUBLE) / 100.0, 2)
         AS total_monetary
FROM scored
GROUP BY r_quartile, f_quartile, m_quartile
""")
def ev_rfm_segments(spark: SparkSession, d: str) -> DataFrame:
    """RFM segmentation: per purchasing user, recency (days since
    last purchase vs the corpus max day), frequency (purchase
    count), monetary (integer-scaled cents so the sum is FP-order
    independent), each cut into ntile(4) quartiles with a user_id
    tiebreak for determinism, then rolled up to segment counts.  The
    per-user agg shuffles once on user_id; the anchor date is a
    1-row broadcast cross join (the repo's scalar pattern).  The
    three global ntiles sort the USER dimension (not the fact
    table) — fine to ~1e8 users; past that, swap the exact ntile
    for approx_percentile cut points applied map-side, same output
    contract."""
    ev = _t(spark, d, "events").filter(F.col("event_type") == "purchase")
    pur = ev.select("user_id", F.to_date("ts").alias("day"),
                    F.round(F.col("value") * 100).cast("long")
                    .alias("cents"))
    anchor = pur.agg(F.max("day").alias("max_day"))
    per_user = (pur.crossJoin(F.broadcast(anchor))
                .groupBy("user_id", "max_day")
                .agg(F.max("day").alias("last_day"),
                     F.count("*").alias("frequency"),
                     F.sum("cents").alias("monetary_cents"))
                .select("user_id", "frequency", "monetary_cents",
                        F.datediff("max_day", "last_day")
                        .alias("recency_days")))
    scored = per_user.select(
        "user_id", "monetary_cents",
        F.ntile(4).over(Window.orderBy("recency_days", "user_id"))
        .alias("r_quartile"),
        F.ntile(4).over(Window.orderBy(F.desc("frequency"), "user_id"))
        .alias("f_quartile"),
        F.ntile(4).over(Window.orderBy(F.desc("monetary_cents"),
                                       "user_id"))
        .alias("m_quartile"))
    return (scored.groupBy("r_quartile", "f_quartile", "m_quartile")
            .agg(F.count("*").alias("n_users"),
                 F.round(F.sum("monetary_cents").cast("double") / 100.0,
                         2).alias("total_monetary")))


@register("q_basket_lift", oracle="""
WITH basket AS (
  SELECT DISTINCT l.l_orderkey, p.p_type
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
), n_orders AS (SELECT count(DISTINCT l_orderkey) AS n FROM basket),
support AS (
  SELECT p_type, count(*) AS n_type FROM basket GROUP BY p_type
), pairs AS (
  SELECT a.p_type AS type_a, b.p_type AS type_b, count(*) AS n_ab
  FROM basket a JOIN basket b
    ON a.l_orderkey = b.l_orderkey AND a.p_type < b.p_type
  GROUP BY a.p_type, b.p_type
)
SELECT pr.type_a, pr.type_b, pr.n_ab,
       round(CAST(pr.n_ab AS DOUBLE) * no.n
             / (CAST(sa.n_type AS DOUBLE) * sb.n_type), 4) AS lift
FROM pairs pr
JOIN support sa ON sa.p_type = pr.type_a
JOIN support sb ON sb.p_type = pr.type_b
CROSS JOIN n_orders no
""")
def q_basket_lift(spark: SparkSession, d: str) -> DataFrame:
    """Market-basket co-occurrence lift over part types: which part
    types appear in the same ORDER more often than independence
    predicts (lift = P(a,b) / (P(a)P(b))).  The scale discipline is
    the DISTINCT-first collapse: lineitem drops to at most
    |orders| x |types| rows (6 types here) BEFORE the pair
    self-join, and that join co-partitions both legs on l_orderkey —
    the shuffle carries the collapsed basket table, never the fact
    table, and the pair space is bounded by types^2, not rows.
    Support counts and the order total are broadcast-sized decorators
    on the 15-row pair frame."""
    li = _t(spark, d, "lineitem").select("l_orderkey", "l_partkey")
    part = _t(spark, d, "part").select("p_partkey", "p_type")
    basket = (li.join(part, li.l_partkey == part.p_partkey)
              .select("l_orderkey", "p_type").distinct())
    n_orders = (basket.select("l_orderkey").distinct()
                .agg(F.count("*").alias("n")))
    support = basket.groupBy("p_type").agg(F.count("*").alias("n_type"))
    a = basket.select(F.col("l_orderkey").alias("__ok"),
                      F.col("p_type").alias("type_a"))
    b = basket.select(F.col("l_orderkey").alias("__ok2"),
                      F.col("p_type").alias("type_b"))
    pairs = (a.join(b, (F.col("__ok") == F.col("__ok2"))
                    & (F.col("type_a") < F.col("type_b")))
             .groupBy("type_a", "type_b")
             .agg(F.count("*").alias("n_ab")))
    sa = support.select(F.col("p_type").alias("type_a"),
                        F.col("n_type").alias("__na"))
    sb = support.select(F.col("p_type").alias("type_b"),
                        F.col("n_type").alias("__nb"))
    return (pairs.join(F.broadcast(sa), "type_a")
            .join(F.broadcast(sb), "type_b")
            .crossJoin(F.broadcast(n_orders))
            .select("type_a", "type_b", "n_ab",
                    F.round(F.col("n_ab").cast("double") * F.col("n")
                            / (F.col("__na").cast("double")
                               * F.col("__nb")), 4).alias("lift")))


_LINK_CANON_SUFFIX_SQL = (
    "' link https://Example.com/Page/' || (doc_id % 37) || "
    "'?utm=' || doc_id || '#top plus "
    "https://example.com/page/' || (doc_id % 37) || '/'"
)


@register("dd_link_canon", oracle=f"""
WITH links AS (
  SELECT doc_id,
         unnest({O.links_sql(f"(text || {_LINK_CANON_SUFFIX_SQL})")})
           AS url
  FROM documents WHERE doc_id % 7 = 0
), canon AS (
  SELECT DISTINCT doc_id,
         regexp_replace(regexp_replace(regexp_replace(lower(url),
             '#.*$', ''), '\\?.*$', ''), '/+$', '') AS canon_url
  FROM links
)
SELECT canon_url, count(*) AS n_docs
FROM canon
GROUP BY canon_url
HAVING count(*) > 1
""")
def dd_link_canon(spark: SparkSession, d: str) -> DataFrame:
    """Crawl-frontier URL canonicalization: extracted links are
    normalized (lowercase, strip fragment, strip query string, strip
    trailing slashes) and cross-document duplicates surfaced — the
    dedup step a crawler runs so http://Host/page?utm=x#top and
    http://host/page schedule ONE fetch (the reference re-crawls
    naively, crawled_urls set in crawler.py).  The corpus text
    carries no URLs, so each doc is seeded with two VARIANTS of the
    same page (mixed case + tracking query + fragment vs plain with
    trailing slash, the s4_extract_links_seeded convention) — the
    merge path is exercised non-vacuously.  Lowercasing the full URL
    (not just the host) is a documented policy choice: it over-merges
    case-sensitive paths but is what frontier dedup wants.  One
    explode + one distinct + one count shuffle on the canonical key;
    the regex chain is codegen'd JVM string work, no UDF."""
    docs = _t(spark, d, "documents").filter(F.col("doc_id") % 7 == 0)
    seeded = docs.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(" link https://Example.com/Page/"),
            F.col("doc_id") % 37,
            F.lit("?utm="), F.col("doc_id"),
            F.lit("#top plus https://example.com/page/"),
            F.col("doc_id") % 37, F.lit("/"),
        ))
    links = (seeded
             .select("doc_id",
                     F.explode(X.extract_links(F.col("text")))
                     .alias("url")))
    canon = (links.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(F.lower(F.col("url")), "#.*$", ""),
                "\\?.*$", ""),
            "/+$", "").alias("canon_url"))
        .distinct())
    return (canon.groupBy("canon_url")
            .agg(F.count("*").alias("n_docs"))
            .filter(F.col("n_docs") > 1))


@register("a15_cardinality_profile", oracle="""
SELECT 'user_id' AS column_name,
       count(DISTINCT user_id) AS n_distinct, TRUE AS approx_ok
FROM events
UNION ALL
SELECT 'event_type', count(DISTINCT event_type), TRUE FROM events
UNION ALL
SELECT 'props', count(DISTINCT props), TRUE FROM events
""")
def a15_cardinality_profile(spark: SparkSession, d: str) -> DataFrame:
    """Column-cardinality profiling (the catalog statistic that
    drives join-strategy choices: broadcast vs shuffle, salting
    need).  Exact counts are the contract; approx_count_distinct
    (HLL++, one pass, no expand) rides the same rows and the entry
    GATES it within 5% of exact — the a5_approx_gate convention, so
    the driver value-checks the approximation's quality, not its
    noise.  At 100 TB run the approx pass alone: the exact multi-
    column form pays one Expand (row x columns) shuffle, the sketch
    form one narrow pass."""
    ev = _t(spark, d, "events")
    rows = []
    for c in ["user_id", "event_type", "props"]:
        rows.append(ev.agg(
            F.lit(c).alias("column_name"),
            F.count_distinct(F.col(c)).alias("n_distinct"),
            ((F.abs(F.approx_count_distinct(c).cast("double")
                    - F.count_distinct(F.col(c)).cast("double"))
              / F.count_distinct(F.col(c)).cast("double")) <= 0.05)
            .alias("approx_ok")))
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out


@register("ev_stickiness", oracle="""
WITH daily AS (
  SELECT CAST(date_trunc('week', ts) AS DATE) AS week,
         CAST(ts AS DATE) AS day, user_id
  FROM events GROUP BY 1, 2, 3
), dau AS (
  SELECT week, day, count(*) AS n_dau FROM daily GROUP BY 1, 2
), mau AS (
  SELECT week, count(DISTINCT user_id) AS n_wau
  FROM daily GROUP BY 1
)
SELECT CAST(d.week AS VARCHAR) AS week,
       CAST(round(avg(d.n_dau)) AS BIGINT) AS avg_dau,
       m.n_wau AS wau,
       round(CAST(round(avg(d.n_dau)) AS DOUBLE) / m.n_wau, 4)
         AS stickiness
FROM dau d JOIN mau m ON m.week = d.week
GROUP BY d.week, m.n_wau
""")
def ev_stickiness(spark: SparkSession, d: str) -> DataFrame:
    """DAU/WAU stickiness per week: how much of the weekly audience
    shows up on an average day.  The (week, day, user) DISTINCT
    collapse happens FIRST — one shuffle on the compound key drops
    the fact table to at most users x days rows, and both the daily
    counts and the weekly distinct ride that collapsed frame (the
    distinct-first discipline of ev_retention_cohorts).  avg(n_dau)
    is rounded to an integer before the ratio so the compare is
    FP-robust; week cast to string on both sides (the DATE
    stringify gotcha)."""
    daily = (_t(spark, d, "events")
             .select(F.date_trunc("week", "ts").cast("date")
                     .alias("week"),
                     F.to_date("ts").alias("day"), "user_id")
             .distinct())
    dau = (daily.groupBy("week", "day")
           .agg(F.count("*").alias("n_dau")))
    mau = (daily.groupBy("week")
           .agg(F.count_distinct("user_id").alias("n_wau")))
    return (dau.join(mau, "week")
            .groupBy("week", "n_wau")
            .agg(F.round(F.avg("n_dau")).cast("long").alias("avg_dau"),
                 F.round(F.round(F.avg("n_dau")).cast("double")
                         / F.col("n_wau"), 4).alias("stickiness"))
            .select(F.col("week").cast("string").alias("week"),
                    "avg_dau", F.col("n_wau").alias("wau"),
                    "stickiness"))


@register("s26_version_diff", oracle="""
WITH v_old AS (
  SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 5 <> 0
), v_new AS (
  SELECT doc_id,
         md5(CASE WHEN doc_id % 11 = 0 THEN upper(text) ELSE text END)
           AS h
  FROM documents WHERE doc_id % 7 <> 0
)
SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
       CASE WHEN o.doc_id IS NULL THEN 'added'
            WHEN n.doc_id IS NULL THEN 'removed'
            ELSE 'changed' END AS change_type
FROM v_old o FULL JOIN v_new n ON o.doc_id = n.doc_id
WHERE o.doc_id IS NULL OR n.doc_id IS NULL OR o.h <> n.h
""")
def s26_version_diff(spark: SparkSession, d: str) -> DataFrame:
    """CDC-style snapshot diff: which rows were added, removed, or
    changed between two table versions (the consumer of
    s24_versioned_read's time travel — what an incremental
    re-embedding pipeline reads instead of the full corpus,
    reference's per-doc re-check loop in vector_store.py done as one
    set operation).  Two deterministic slices of documents simulate
    the versions (doc_id % 5 / % 7 membership, content mutated on
    % 11).  One FULL OUTER join on the key, content compared by
    md5 — at 100 TB both sides hash-partition on doc_id and the
    comparison ships 32-byte hashes, not documents; unchanged rows
    (the vast majority) are filtered before anything downstream."""
    docs = _t(spark, d, "documents")
    old = (docs.filter(F.col("doc_id") % 5 != 0)
           .select(F.col("doc_id").alias("__oid"),
                   F.md5("text").alias("__oh")))
    new = (docs.filter(F.col("doc_id") % 7 != 0)
           .select(F.col("doc_id").alias("__nid"),
                   F.md5(F.when(F.col("doc_id") % 11 == 0,
                                F.upper(F.col("text")))
                         .otherwise(F.col("text"))).alias("__nh")))
    j = old.join(new, old.__oid == new.__nid, "full_outer")
    return (j.filter(F.col("__oid").isNull() | F.col("__nid").isNull()
                     | (F.col("__oh") != F.col("__nh")))
            .select(F.coalesce("__oid", "__nid").alias("doc_id"),
                    F.when(F.col("__oid").isNull(), F.lit("added"))
                    .when(F.col("__nid").isNull(), F.lit("removed"))
                    .otherwise(F.lit("changed")).alias("change_type")))


@register("q_fulfillment_lag", oracle="""
WITH per_order AS (
  SELECT o.o_orderkey, o.o_orderpriority,
         date_diff('day', CAST(o.o_orderdate AS DATE),
                   CAST(min(l.l_shipdate) AS DATE)) AS first_lag,
         date_diff('day', CAST(o.o_orderdate AS DATE),
                   CAST(max(l.l_shipdate) AS DATE)) AS last_lag
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_orderkey, o.o_orderpriority, o.o_orderdate
)
SELECT o_orderpriority,
       count(*) AS n_orders,
       round(CAST(sum(first_lag) AS DOUBLE) / count(*), 4)
         AS avg_first_ship_days,
       round(CAST(sum(last_lag) AS DOUBLE) / count(*), 4)
         AS avg_complete_days,
       max(last_lag) AS max_complete_days
FROM per_order
GROUP BY o_orderpriority
""")
def q_fulfillment_lag(spark: SparkSession, d: str) -> DataFrame:
    """Order-fulfillment lag by priority: days from order placement
    to FIRST shipment (responsiveness) and to LAST shipment
    (completion), averaged per priority class.  Two-level agg: the
    per-order min/max collapses lineitem on l_orderkey (partial agg
    map-side, one shuffle on the join key the join already needs —
    AQE reuses the partitioning), then a 5-group rollup.  Averages
    are computed as exact-integer-sum / count (day lags are ints, so
    the double division is the only FP step and is order-independent)."""
    orders = _t(spark, d, "orders").select(
        "o_orderkey", "o_orderpriority",
        F.to_date("o_orderdate").alias("__odate"))
    li = _t(spark, d, "lineitem").select(
        "l_orderkey", F.to_date("l_shipdate").alias("__sdate"))
    per_order = (orders
                 .join(li, orders.o_orderkey == li.l_orderkey)
                 .groupBy("o_orderkey", "o_orderpriority", "__odate")
                 .agg(F.datediff(F.min("__sdate"), F.col("__odate"))
                      .alias("first_lag"),
                      F.datediff(F.max("__sdate"), F.col("__odate"))
                      .alias("last_lag")))
    return (per_order.groupBy("o_orderpriority")
            .agg(F.count("*").alias("n_orders"),
                 F.round(F.sum("first_lag").cast("double")
                         / F.count("*"), 4).alias("avg_first_ship_days"),
                 F.round(F.sum("last_lag").cast("double")
                         / F.count("*"), 4).alias("avg_complete_days"),
                 F.max("last_lag").alias("max_complete_days")))


@register("w9_interorder_gap", oracle="""
WITH seq AS (
  SELECT o_custkey, CAST(o_orderdate AS DATE) AS day,
         lag(CAST(o_orderdate AS DATE)) OVER (
           PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey) AS prev_day
  FROM orders
), gaps AS (
  SELECT o_custkey, date_diff('day', prev_day, day) AS gap_days
  FROM seq WHERE prev_day IS NOT NULL
)
SELECT c.c_mktsegment,
       count(*) AS n_gaps,
       round(CAST(sum(g.gap_days) AS DOUBLE) / count(*), 4)
         AS avg_gap_days,
       max(g.gap_days) AS max_gap_days
FROM gaps g JOIN customer c ON c.c_custkey = g.o_custkey
GROUP BY c.c_mktsegment
""")
def w9_interorder_gap(spark: SparkSession, d: str) -> DataFrame:
    """Inter-order cadence: days between a customer's consecutive
    orders (lag window per custkey with an orderkey tiebreak),
    rolled up to segment-level averages — the purchase-frequency
    statistic behind reorder prediction.  One shuffle on o_custkey
    serves the window; the segment decoration joins AFTER the gap
    computation so the window never carries customer columns, and
    the final agg is 5 groups.  Exact-integer-sum / count averaging
    (the q_fulfillment_lag convention)."""
    orders = _t(spark, d, "orders").select(
        "o_custkey", "o_orderkey", F.to_date("o_orderdate").alias("day"))
    w = Window.partitionBy("o_custkey").orderBy("day", "o_orderkey")
    gaps = (orders
            .withColumn("prev_day", F.lag("day").over(w))
            .filter(F.col("prev_day").isNotNull())
            .select("o_custkey",
                    F.datediff("day", "prev_day").alias("gap_days")))
    cust = _t(spark, d, "customer").select("c_custkey", "c_mktsegment")
    return (gaps.join(cust, gaps.o_custkey == cust.c_custkey)
            .groupBy("c_mktsegment")
            .agg(F.count("*").alias("n_gaps"),
                 F.round(F.sum("gap_days").cast("double") / F.count("*"),
                         4).alias("avg_gap_days"),
                 F.max("gap_days").alias("max_gap_days")))


@register("q9_profit_proxy", oracle="""
SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount)
                           * 10000) AS BIGINT)
                - CAST(round(l.l_quantity * p.p_retailprice * 6000)
                       AS BIGINT)) AS DOUBLE) / 10000.0 AS profit,
       count(*) AS n_lines
FROM lineitem l
JOIN part p     ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey
GROUP BY n.n_name, year(o.o_orderdate)
""")
def q9_profit_proxy(spark: SparkSession, d: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit by nation-year): per-line
    profit = revenue minus cost, aggregated over the supplier's
    nation and the order year.  The testdata has no partsupp, so
    cost is proxied as 60% of p_retailprice x quantity — the plan
    shape (fact x 2 mid-size dims x 2 broadcast dims, full-corpus
    agg to a small nation x year matrix) is the point, and it is
    Q9's.  Per-line profit is integer-scaled BEFORE summing (q6
    convention: identical IEEE doubles per line in both engines,
    then exact BIGINT addition in any order).  part and supplier
    scale with sf so AQE owns their join strategy; nation rides a
    broadcast."""
    li = _t(spark, d, "lineitem")
    part = _t(spark, d, "part").select("p_partkey", "p_retailprice")
    supp = _t(spark, d, "supplier").select("s_suppkey", "s_nationkey")
    orders = _t(spark, d, "orders").select("o_orderkey", "o_orderdate")
    nation = _t(spark, d, "nation").select("n_nationkey",
                                           F.col("n_name").alias("nation"))
    scaled = (F.round(F.col("l_extendedprice") * (1 - F.col("l_discount"))
                      * 10000).cast("long")
              - F.round(F.col("l_quantity") * F.col("p_retailprice")
                        * 6000).cast("long"))
    j = (li.join(part, li.l_partkey == part.p_partkey)
         .join(supp, li.l_suppkey == supp.s_suppkey)
         .join(orders, li.l_orderkey == orders.o_orderkey)
         .join(F.broadcast(nation),
               supp.s_nationkey == nation.n_nationkey))
    return (j.groupBy("nation", F.year("o_orderdate").alias("o_year"))
            .agg((F.sum(scaled).cast("double") / 10000.0).alias("profit"),
                 F.count("*").alias("n_lines")))


@register("q15_top_supplier", oracle="""
WITH revenue AS (
  SELECT l_suppkey,
         CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                       AS BIGINT)) AS BIGINT) AS total_sc
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name,
       round(CAST(r.total_sc AS DOUBLE) / 10000.0, 2) AS total_revenue
FROM supplier s JOIN revenue r ON s.s_suppkey = r.l_suppkey
WHERE r.total_sc = (SELECT max(total_sc) FROM revenue)
""")
def q15_top_supplier(spark: SparkSession, d: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier): quarterly revenue per
    supplier (the original's VIEW, here a CTE/DataFrame), then the
    supplier(s) whose revenue EQUALS the maximum — the scalar-
    subquery-on-aggregate form, which keeps ties (argmax entries a4
    pick one winner; Q15 keeps all).  The revenue table is
    |suppliers|-sized, so the max is a 1-row broadcast and the
    equality filter is map-side; integer-scaled revenue makes the
    max well-defined across engines (no FP ordering at the top)."""
    li = _t(spark, d, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1996-04-01"))))
    scaled = (F.round(F.col("l_extendedprice") * (1 - F.col("l_discount"))
                      * 10000).cast("long"))
    revenue = (li.groupBy("l_suppkey")
               .agg(F.sum(scaled).alias("total_sc")))
    mx = revenue.agg(F.max("total_sc").alias("__mx"))
    supp = _t(spark, d, "supplier").select("s_suppkey", "s_name")
    return (revenue.crossJoin(F.broadcast(mx))
            .filter(F.col("total_sc") == F.col("__mx"))
            .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
            .select("s_suppkey", "s_name",
                    F.round(F.col("total_sc").cast("double") / 10000.0,
                            2).alias("total_revenue")))
