"""SemDeDup behavior in its DESIGN regime (near-identical vectors at
high cosine): copies of a vector land in the same KMeans cell with
overwhelming probability, so cluster scoping loses almost nothing —
unlike the moderate-threshold regime the driver gate measures (where
cross-cluster loss is expected and floored)."""

from __future__ import annotations

import math
import random

from production_grade_rag_spark.operators import dedup, similarity


def _dup_corpus(spark, n_groups=20, copies=3, dim=16, noise=0.01):
    rng = random.Random(7)
    rows = []
    vid = 0
    for _ in range(n_groups):
        base = [rng.gauss(0, 1) for _ in range(dim)]
        nb = math.sqrt(sum(x * x for x in base))
        base = [x / nb for x in base]
        for _ in range(copies):
            v = [x + rng.gauss(0, noise) for x in base]
            nv = math.sqrt(sum(x * x for x in v))
            rows.append((vid, [x / nv for x in v]))
            vid += 1
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_semdedup_high_threshold_recall_and_precision(spark):
    emb = _dup_corpus(spark)
    exact = {(r["id_a"], r["id_b"]) for r in
             similarity.pairwise_similar(emb, 0.99).collect()}
    assert len(exact) >= 40, "corpus must contain real near-dup groups"
    got = {(r["id_a"], r["id_b"]) for r in
           dedup.semdedup_pairs(emb, n_clusters=6,
                                threshold=0.99).collect()}
    # precision 1.0 by construction
    assert got <= exact
    # near-identical copies share a cell: recall ~1 in the design regime
    recall = len(got) / len(exact)
    assert recall >= 0.9, f"high-threshold recall too low: {recall}"


def test_semdedup_deterministic(spark):
    emb = _dup_corpus(spark)
    a = sorted((r["id_a"], r["id_b"], r["cell"]) for r in
               dedup.semdedup_pairs(emb, n_clusters=6,
                                    threshold=0.99).collect())
    b = sorted((r["id_a"], r["id_b"], r["cell"]) for r in
               dedup.semdedup_pairs(emb, n_clusters=6,
                                    threshold=0.99).collect())
    assert a == b


def test_shingle_frame_equals_inline(spark):
    # r15 optimization pin: the two-step projection (tokens
    # materialized, shingles over the attribute) must produce the
    # exact shingle arrays of the inline word_shingles form, and the
    # position-explode minhash signature must equal the
    # distinct-shingle-explode form it replaced.
    from pyspark.sql import functions as F

    from conftest import SF01

    docs = (spark.read.parquet(f"{SF01}/documents.parquet")
            .select("doc_id", "text"))
    for k in (3, 5):
        new = dedup.shingle_frame(docs, "text", "doc_id", k)
        old = docs.select(
            F.col("doc_id"),
            dedup.shingles_of(dedup.tokens(F.col("text")), k).alias("__sh"))
        assert new.exceptAll(old).count() == 0
        assert old.exceptAll(new).count() == 0
    # shingle_explode row multiplicity matches explode(word_shingles)
    ex_new = dedup.shingle_explode(docs, extra_cols=("doc_id",))
    ex_old = docs.select(
        "doc_id", F.explode(dedup.word_shingles(F.col("text"), 3))
        .alias("sh"))
    assert ex_new.exceptAll(ex_old).count() == 0
    assert ex_old.exceptAll(ex_new).count() == 0
    # signature table: position-explode == r14 distinct-shingle explode
    sigs_new = dedup.minhash_signatures(docs)
    ex = docs.select(
        F.col("doc_id"),
        F.explode(dedup.word_shingles(F.col("text"))).alias("__shingle"))
    h = ex.select("doc_id", dedup.md5_int32(F.col("__shingle")).alias("__h"))
    sigs_old = h.groupBy("doc_id").agg(*[
        F.min((F.lit(dedup.HASH_A[s]) * F.col("__h")
               + F.lit(dedup.HASH_B[s])) % F.lit(dedup.MINHASH_PRIME))
        .alias(f"h{s}") for s in range(16)])
    assert sigs_new.exceptAll(sigs_old).count() == 0
    assert sigs_old.exceptAll(sigs_new).count() == 0


def test_minhash_agg_expr_parse_equals_columns(spark):
    # r16: the 16 min-cells are handed to the SQL parser as one string
    # each; this pins the parsed (A*h+B)%P tree value-equal to the
    # chained-Column form it replaced, over hashes spanning the full
    # uint32 range (so the long-promotion and modulo paths are
    # exercised at their envelope).
    from pyspark.sql import functions as F

    from production_grade_rag_spark.operators.dedup import (
        HASH_A, HASH_B, MINHASH_PRIME)
    df = spark.createDataFrame(
        [(1, 0), (1, 4294967295), (2, 2147483648), (2, 12345)],
        "doc_id long, __h long")
    parsed = df.groupBy("doc_id").agg(*[
        F.expr(f"min(({HASH_A[s]}L * __h + {HASH_B[s]}L) % "
               f"{MINHASH_PRIME}L) as h{s}") for s in range(16)])
    chained = df.groupBy("doc_id").agg(*[
        F.min((F.lit(HASH_A[s]) * F.col("__h") + F.lit(HASH_B[s]))
              % F.lit(MINHASH_PRIME)).alias(f"h{s}")
        for s in range(16)])
    rp = {r["doc_id"]: r for r in parsed.collect()}
    rc = {r["doc_id"]: r for r in chained.collect()}
    for k in rp:
        for s in range(16):
            assert rp[k][f"h{s}"] == rc[k][f"h{s}"]
