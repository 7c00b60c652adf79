"""Gopher / C4 curation rules: every rule branch must fire on a doc
built to violate exactly it, and the Spark and DuckDB forms must agree
on those adversarial shapes (the oracle-parity test only sees the
synthetic corpus, which may not trip bullet/ellipsis/symbol rules)."""

from __future__ import annotations

from pyspark.sql import functions as F

from production_grade_rag_spark.operators.curation_rules import (
    c4_line_stats, c4_sql, gopher_flags, gopher_sql)

GOOD = ("the quick brown fox jumps over the lazy dog and runs far away "
        "to be with that other fox have fun with it ") * 3   # >50 words


def _docs(spark):
    rows = [
        (1, GOOD),
        (2, "too short to pass"),                       # ok_words fails
        (3, " ".join(["a"] * 60)),                      # mean len < 3
        (4, GOOD + " " + " ".join(["####"] * 20)),      # symbol ratio
        (5, "\n".join(["• bullet line"] * 10)),         # bullet frac
        (6, "\n".join(["trailing off..."] * 10)),       # ellipsis frac
        (7, " ".join(["12345"] * 60)),                  # alpha frac
        (8, " ".join(["word"] * 60)),                   # no stopwords
        (9, "This line ends well.\nno terminal punct\nshort.\n"
            "Lines with javascript inside end here.\n"
            "Three words here."),
        (10, "lorem ipsum dolor sit amet."),
        (11, "code { with braces }"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_gopher_each_rule_fires(spark):
    df = _docs(spark)
    flags = gopher_flags(F.col("text"))
    out = {r["doc_id"]: r for r in df.select(
        "doc_id", *[c.alias(n) for n, c in flags.items()]).collect()}
    assert out[1]["gopher_pass"]
    assert not out[2]["ok_words"]
    assert not out[3]["ok_mean_len"]
    assert not out[4]["ok_symbol"]
    assert not out[5]["ok_bullet"]
    assert not out[6]["ok_ellipsis"]
    assert not out[7]["ok_alpha"]
    assert not out[8]["ok_stop"]
    for d in range(2, 9):
        assert not out[d]["gopher_pass"]


def test_c4_line_rules(spark):
    df = _docs(spark)
    stats = c4_line_stats(F.col("text"))
    out = {r["doc_id"]: r for r in df.select(
        "doc_id", *[c.alias(n) for n, c in stats.items()]).collect()}
    r9 = out[9]
    assert r9["n_lines"] == 5
    # kept: "This line ends well." and "Three words here." — the
    # javascript line and the short/punctless lines drop
    assert r9["n_kept"] == 2
    assert r9["kept_chars"] == len("This line ends well.") + \
        len("Three words here.")
    assert not r9["page_drop"]
    assert out[10]["page_drop"] and out[11]["page_drop"]


def test_rules_spark_duckdb_parity_on_adversarial_docs(spark):
    import duckdb
    df = _docs(spark)
    pdf = df.toPandas()
    con = duckdb.connect()
    con.register("documents", pdf)
    for sql_frag, col_fn in ((gopher_sql, gopher_flags),
                             (c4_sql, c4_line_stats)):
        cols = col_fn(F.col("text"))
        got = [tuple(str(v) for v in r) for r in df.select(
            "doc_id", *[c.alias(n) for n, c in cols.items()])
            .orderBy("doc_id").collect()]
        want = [tuple(str(v) for v in r) for r in con.execute(
            f"SELECT doc_id, {sql_frag('text')} FROM documents "
            f"ORDER BY doc_id").fetchall()]
        assert got == want


def test_line_dedup_first_occurrence_and_reassembly(spark, tmp_path):
    """dd_line_dedup on a corpus the synthetic tables can't produce:
    cross-document duplicated lines (first occurrence by (doc_id, pos)
    survives), blank lines always kept, in-doc repeats deduped,
    original line order preserved in the reassembled hash."""
    import hashlib
    import shutil
    from production_grade_rag_spark.plans.catalog import CATALOG

    rows = [
        (1, "shared header\nunique one\n\nshared footer"),
        (2, "shared header\nunique two\nshared footer"),
        (3, "repeat me\nrepeat me\n\n"),
        (4, "shared header"),                    # everything deduped
    ]
    d = str(tmp_path / "sf_lines")
    spark.createDataFrame(rows, ["doc_id", "text"]) \
        .write.parquet(f"{d}/documents.parquet")
    # the entry only reads documents; satisfy the loader path
    out = {r["doc_id"]: r
           for r in CATALOG["dd_line_dedup"].build(spark, d).collect()}

    def md5(s):
        return hashlib.md5(s.encode()).hexdigest()

    assert out[1]["n_lines"] == 4 and out[1]["n_kept"] == 4
    assert out[1]["dedup_md5"] == md5(
        "shared header\nunique one\n\nshared footer")
    # doc 2 loses both shared lines to doc 1
    assert out[2]["n_kept"] == 1
    assert out[2]["dedup_md5"] == md5("unique two")
    # in-doc repeat deduped; blank lines survive (two of them: the
    # explicit blank and the trailing-split empty)
    assert out[3]["n_lines"] == 4 and out[3]["n_kept"] == 3
    assert out[3]["dedup_md5"] == md5("repeat me\n\n")
    # fully-deduplicated doc still appears, with the empty-text hash
    assert out[4]["n_kept"] == 0
    assert out[4]["dedup_md5"] == md5("")
    shutil.rmtree(d)
