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
