"""Text-analysis operators (beyond-reference, mandated by BASELINE.json):
language-ID, document fingerprinting, BPE-ish token counting.

All md5-based so the DuckDB oracle computes identical values; all
higher-order column expressions — no Python, no shuffle, one narrow
pass per document.  At 100 TB these run as map-only stages fused into
the scan by whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import WORD_SPLIT_RE, pystrip

# Stopword profiles for the n-gram/stopword language heuristic.  Small
# on purpose: the signal is the *ratio* of profile hits, and ties break
# by profile order (then 'unknown' when nothing matches).
LANG_PROFILES: tuple[tuple[str, tuple[str, ...]], ...] = (
    ("en", ("the", "and", "of", "to", "in", "is", "that", "for", "with", "a")),
    ("de", ("der", "die", "und", "das", "ist", "nicht", "ein", "mit", "für", "auf")),
    ("fr", ("le", "la", "et", "les", "des", "est", "pour", "dans", "une", "que")),
    ("es", ("el", "la", "de", "que", "los", "para", "con", "una", "por", "es")),
)

# "BPE-ish" pretokenizer: word pieces OR single non-word-non-space marks
# (the public GPT-2 pretokenizer shape, simplified to an RE2-safe form).
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def lang_scores(col: Column) -> dict[str, Column]:
    """Per-language stopword-hit ratio over whitespace tokens."""
    t = F.lower(pystrip(col))
    toks = F.when(F.length(t) == 0, F.array().cast("array<string>")) \
            .otherwise(F.split(t, WORD_SPLIT_RE))
    n = F.size(toks)
    out = {}
    for lang, words in LANG_PROFILES:
        hits = F.size(F.array_intersect(
            F.array_distinct(toks),
            F.array(*[F.lit(w) for w in words])))
        # distinct-hit count / profile size: how much of the profile the
        # document covers (robust to doc length, unlike raw token ratio)
        out[lang] = F.when(n == 0, F.lit(0.0)) \
                     .otherwise(hits.cast("double") / len(words))
    return out


def detect_language(col: Column, min_score: float = 0.05) -> Column:
    """Language-ID: argmax profile coverage, 'unknown' below min_score.
    Ties break in LANG_PROFILES order (first wins) — deterministic and
    mirrored exactly in the oracle SQL's CASE chain."""
    scores = lang_scores(col)
    best = F.greatest(*scores.values())
    expr = None
    for lang, _ in LANG_PROFILES:
        cond = scores[lang] == best
        expr = F.when(cond, F.lit(lang)) if expr is None else expr.when(cond, F.lit(lang))
    return F.when(best < min_score, F.lit("unknown")).otherwise(expr)


def with_language(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("detected_lang", detect_language(F.col(text_col)))


def bpe_token_count(col: Column) -> Column:
    """Token count under the BPE-ish pretokenizer (regex extract-all).
    Whitespace count is functions.text.word_count (F3)."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_TOKEN_RE), 0))


# English stopwords for the quality-ratio signal (superset of the 'en'
# language profile; public/ubiquitous list).
STOPWORDS: tuple[str, ...] = (
    "the", "and", "of", "to", "in", "is", "that", "for", "with", "a",
    "on", "as", "are", "was", "by", "at", "an", "be", "this", "it",
)
PUNCT_RE = r"[^A-Za-z0-9\s]"
DIGIT_RE = r"[0-9]"
UPPER_RE = r"[A-Z]"


def quality_ratios(col: Column) -> dict[str, Column]:
    """Training-data quality signals: punctuation / digit / uppercase
    character ratios and stopword token ratio (a document with almost
    no stopwords is usually not prose; one that is mostly punctuation
    or digits is usually markup or tables)."""
    n_chars = F.greatest(F.length(col), F.lit(1))
    t = F.lower(pystrip(col))
    toks = F.when(F.length(t) == 0, F.array().cast("array<string>")) \
            .otherwise(F.split(t, WORD_SPLIT_RE))
    n_toks = F.greatest(F.size(toks), F.lit(1))
    stop_hits = F.size(F.filter(
        toks, lambda w: w.isin(*STOPWORDS)))
    counts = {
        "punct_ratio": F.size(F.regexp_extract_all(col, F.lit(PUNCT_RE), 0)),
        "digit_ratio": F.size(F.regexp_extract_all(col, F.lit(DIGIT_RE), 0)),
        "upper_ratio": F.size(F.regexp_extract_all(col, F.lit(UPPER_RE), 0)),
    }
    out = {k: v.cast("double") / n_chars for k, v in counts.items()}
    out["stopword_ratio"] = stop_hits.cast("double") / n_toks
    return out


def with_quality_ratios(df: DataFrame, text_col: str = "text") -> DataFrame:
    for name, col in quality_ratios(F.col(text_col)).items():
        df = df.withColumn(name, F.round(col, 6))
    return df


def char_shingles(col: Column, k: int = 8) -> Column:
    """Character k-grams of the lowercased, whitespace-normalized text."""
    t = F.regexp_replace(F.lower(pystrip(col)), WORD_SPLIT_RE, " ")
    n = F.length(t)
    return F.when(n < k, F.array(t)).otherwise(
        F.transform(F.sequence(F.lit(1), n - k + 1),
                    lambda i: F.substr(t, i, F.lit(k))))


def fingerprint(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id", k: int = 8,
                mod: int = 16) -> DataFrame:
    """Document fingerprinting (0-mod-p sampling of k-gram hashes — the
    public Broder/'mod p' sketch; winnowing's fixed-sample-rate cousin).

    hash = int32(md5(gram)); keep grams with hash % mod == 0; the
    fingerprint is the sorted distinct kept hashes.  Two documents'
    fingerprint overlap estimates their k-gram resemblance at 1/mod the
    cost.  Map-only: no explode, no shuffle.
    """
    grams = char_shingles(F.col(text_col), k)
    hashes = F.transform(
        grams, lambda g: F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("long"))
    kept = F.array_sort(F.array_distinct(
        F.filter(hashes, lambda h: h % mod == 0)))
    return df.select(
        F.col(id_col),
        kept.alias("fingerprint"),
        F.size(kept).alias("fingerprint_size"))


def fingerprint_resemblance(fp: DataFrame, threshold: float = 0.5,
                            id_col: str = "doc_id") -> DataFrame:
    """Pairwise resemblance from fingerprints (Jaccard over sampled
    hash sets).  Same pair-pruning rules as the dedup suite apply at
    scale (LSH-band the fingerprints); exact form here for oracles."""
    a = fp.select(F.col(id_col).alias("id_a"), F.col("fingerprint").alias("__fa"))
    b = fp.select(F.col(id_col).alias("id_b"), F.col("fingerprint").alias("__fb"))
    res = (F.size(F.array_intersect("__fa", "__fb")).cast("double")
           / F.greatest(F.size(F.array_union("__fa", "__fb")), F.lit(1)))
    return (a.join(b, F.col("id_a") < F.col("id_b"))
             .withColumn("resemblance", F.round(res, 6))
             .filter(F.col("resemblance") >= threshold)
             .select("id_a", "id_b", "resemblance"))
