"""Published corpus-curation rule families (LLM-pipeline mandate):

- ``gopher_flags``: the Gopher quality heuristics (Rae et al. 2021,
  "Scaling Language Models", appendix A1.1 — public): word-count
  bounds, mean word length bounds, symbol-to-word ratio, bullet/
  ellipsis line fractions, alphabetic-word fraction, stop-word
  presence.  The reference's quality scorer (document_processor.py:
  36-79) is a length/diversity blend; these are the
  pretraining-corpus rules a 100 TB ingest actually applies.
- ``c4_line_stats``: the C4 line-level cleaning rules (Raffel et al.
  2020, §2.2 — public): keep lines ending in terminal punctuation
  with >= 3 words and no "javascript"; drop pages containing
  "lorem ipsum" or a curly brace.

Everything is pure column arithmetic over split arrays (one fused
projection, no UDF, no shuffle — the filters are map-side at any
scale), and every constant is shared with the DuckDB oracle builders
below so the rules are value-hashed cross-engine, not re-implemented.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..functions.text import PY_STRIP_RE, WORD_SPLIT_RE

# Gopher A1.1 constants (public)
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_LEN = 3.0
GOPHER_MAX_MEAN_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MAX_BULLET_FRAC = 0.9
GOPHER_MAX_ELLIPSIS_FRAC = 0.3
GOPHER_MIN_ALPHA_FRAC = 0.8
GOPHER_MIN_STOP_HITS = 2
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that",
                    "have", "with")
BULLET_PREFIXES = ("•", "-", "*")
TERMINAL_CHARS = (".", "!", "?", '"')

_ALPHA_RE = "[a-z]"


def _toks(col: Column) -> Column:
    t = F.lower(F.regexp_replace(col, PY_STRIP_RE, ""))
    return F.when(F.length(t) == 0, F.array().cast("array<string>")) \
            .otherwise(F.split(t, WORD_SPLIT_RE))


def _lines(col: Column) -> Column:
    return F.split(col, "\n")


def gopher_flags(col: Column) -> dict[str, Column]:
    """Per-document Gopher rule columns.  Returns named columns so the
    caller selects/aliases them (driver-contract alias discipline)."""
    toks = _toks(col)
    lines = _lines(col)
    n_words = F.size(toks)
    nw = n_words.cast("double")
    mean_len = F.when(n_words == 0, F.lit(0.0)).otherwise(
        F.aggregate(toks, F.lit(0), lambda a, x: a + F.length(x))
        .cast("double") / nw)
    n_symbol = F.size(F.filter(
        toks, lambda x: x.contains("#") | x.contains("...")))
    n_alpha = F.size(F.filter(toks, lambda x: x.rlike(_ALPHA_RE)))
    n_stop = F.size(F.filter(toks, lambda x: x.isin(*GOPHER_STOPWORDS)))
    n_lines = F.size(lines)
    nl = n_lines.cast("double")
    stripped = lambda ln: F.regexp_replace(ln, PY_STRIP_RE, "")  # noqa: E731
    n_bullet = F.size(F.filter(
        lines, lambda ln: F.substring(stripped(ln), 1, 1)
        .isin(*BULLET_PREFIXES)))
    n_ellipsis = F.size(F.filter(
        lines, lambda ln: stripped(ln).endswith("...")))
    ok_words = (n_words >= GOPHER_MIN_WORDS) & (n_words <= GOPHER_MAX_WORDS)
    ok_mean = ((mean_len >= GOPHER_MIN_MEAN_LEN)
               & (mean_len <= GOPHER_MAX_MEAN_LEN))
    ok_symbol = n_symbol.cast("double") / F.greatest(nw, F.lit(1.0)) \
        < GOPHER_MAX_SYMBOL_RATIO
    ok_bullet = n_bullet.cast("double") / F.greatest(nl, F.lit(1.0)) \
        < GOPHER_MAX_BULLET_FRAC
    ok_ellipsis = n_ellipsis.cast("double") / F.greatest(nl, F.lit(1.0)) \
        < GOPHER_MAX_ELLIPSIS_FRAC
    ok_alpha = n_alpha.cast("double") / F.greatest(nw, F.lit(1.0)) \
        > GOPHER_MIN_ALPHA_FRAC
    ok_stop = n_stop >= GOPHER_MIN_STOP_HITS
    return {
        "n_words": n_words.cast("long"),
        "mean_word_len": F.round(mean_len, 6),
        "ok_words": ok_words, "ok_mean_len": ok_mean,
        "ok_symbol": ok_symbol, "ok_bullet": ok_bullet,
        "ok_ellipsis": ok_ellipsis, "ok_alpha": ok_alpha,
        "ok_stop": ok_stop,
        "gopher_pass": (ok_words & ok_mean & ok_symbol & ok_bullet
                        & ok_ellipsis & ok_alpha & ok_stop),
    }


def c4_line_stats(col: Column) -> dict[str, Column]:
    """Per-document C4 line-cleaning columns."""
    lines = _lines(col)
    stripped = lambda ln: F.regexp_replace(ln, PY_STRIP_RE, "")  # noqa: E731

    def line_words(ln: Column) -> Column:
        t = stripped(ln)
        return F.when(F.length(t) == 0, F.lit(0)) \
                .otherwise(F.size(F.split(t, WORD_SPLIT_RE)))

    def keep(ln: Column) -> Column:
        t = stripped(ln)
        return (F.substring(t, -1, 1).isin(*TERMINAL_CHARS)
                & (line_words(ln) >= 3)
                & ~F.lower(t).contains("javascript"))

    kept = F.filter(lines, keep)
    low = F.lower(col)
    return {
        "n_lines": F.size(lines).cast("long"),
        "n_kept": F.size(kept).cast("long"),
        "kept_chars": F.aggregate(
            kept, F.lit(0), lambda a, x: a + F.length(x)).cast("long"),
        "page_drop": (low.contains("lorem ipsum") | low.contains("{")
                      | low.contains("}")),
    }


# ---------------------------------------------------------------------------
# DuckDB oracle builders (constants shared with the column forms above)
# ---------------------------------------------------------------------------

def _sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _strip_sql(x: str) -> str:
    return f"regexp_replace({x}, {_sql_str(PY_STRIP_RE)}, '')"


def _toks_sql(expr: str) -> str:
    t = f"lower({_strip_sql(expr)})"
    return (f"(CASE WHEN {t} = '' THEN []::VARCHAR[] "
            f"ELSE regexp_split_to_array({t}, {_sql_str(WORD_SPLIT_RE)}) "
            f"END)")


def gopher_sql(expr: str) -> str:
    """SELECT-list fragment computing the same columns as
    ``gopher_flags`` (expects per-row context; wrap in a CTE)."""
    toks = _toks_sql(expr)
    lines = f"string_split({expr}, chr(10))"
    stops = ", ".join(_sql_str(w) for w in GOPHER_STOPWORDS)
    bullets = ", ".join(_sql_str(b) for b in BULLET_PREFIXES)
    sln = f"{_strip_sql('ln')}"
    nw = f"len({toks})"
    nl = f"len({lines})"
    mean_len = (f"(CASE WHEN {nw} = 0 THEN 0.0::DOUBLE ELSE "
                f"list_sum(list_transform({toks}, x -> len(x)))::DOUBLE "
                f"/ {nw}::DOUBLE END)")
    n_symbol = (f"len(list_filter({toks}, x -> contains(x, '#') "
                f"OR contains(x, '...')))")
    n_alpha = (f"len(list_filter({toks}, "
               f"x -> regexp_matches(x, {_sql_str(_ALPHA_RE)})))")
    n_stop = f"len(list_filter({toks}, x -> x IN ({stops})))"
    n_bullet = (f"len(list_filter({lines}, "
                f"ln -> substr({sln}, 1, 1) IN ({bullets})))")
    n_ellipsis = (f"len(list_filter({lines}, "
                  f"ln -> {sln} LIKE '%...'))")
    ok = {
        "ok_words": f"({nw} >= {GOPHER_MIN_WORDS} "
                    f"AND {nw} <= {GOPHER_MAX_WORDS})",
        "ok_mean_len": f"({mean_len} >= {GOPHER_MIN_MEAN_LEN} "
                       f"AND {mean_len} <= {GOPHER_MAX_MEAN_LEN})",
        "ok_symbol": f"({n_symbol}::DOUBLE / greatest({nw}::DOUBLE, 1.0) "
                     f"< {GOPHER_MAX_SYMBOL_RATIO})",
        "ok_bullet": f"({n_bullet}::DOUBLE / greatest({nl}::DOUBLE, 1.0) "
                     f"< {GOPHER_MAX_BULLET_FRAC})",
        "ok_ellipsis": f"({n_ellipsis}::DOUBLE "
                       f"/ greatest({nl}::DOUBLE, 1.0) "
                       f"< {GOPHER_MAX_ELLIPSIS_FRAC})",
        "ok_alpha": f"({n_alpha}::DOUBLE / greatest({nw}::DOUBLE, 1.0) "
                    f"> {GOPHER_MIN_ALPHA_FRAC})",
        "ok_stop": f"({n_stop} >= {GOPHER_MIN_STOP_HITS})",
    }
    passes = " AND ".join(ok.values())
    cols = [f"{nw}::BIGINT AS n_words",
            f"round({mean_len}, 6) AS mean_word_len"]
    cols += [f"{v} AS {k}" for k, v in ok.items()]
    cols.append(f"({passes}) AS gopher_pass")
    return ", ".join(cols)


def c4_sql(expr: str) -> str:
    """SELECT-list fragment twin of ``c4_line_stats``."""
    lines = f"string_split({expr}, chr(10))"
    sln = _strip_sql("ln")
    terms = ", ".join(_sql_str(c) for c in TERMINAL_CHARS)
    line_words = (f"(CASE WHEN {sln} = '' THEN 0 ELSE "
                  f"len(regexp_split_to_array({sln}, "
                  f"{_sql_str(WORD_SPLIT_RE)})) END)")
    keep = (f"ln -> substr({sln}, -1, 1) IN ({terms}) "
            f"AND {line_words} >= 3 "
            f"AND NOT contains(lower({sln}), 'javascript')")
    kept = f"list_filter({lines}, {keep})"
    return (f"len({lines})::BIGINT AS n_lines, "
            f"len({kept})::BIGINT AS n_kept, "
            f"coalesce(list_sum(list_transform({kept}, "
            f"x -> len(x))), 0)::BIGINT AS kept_chars, "
            f"(contains(lower({expr}), 'lorem ipsum') "
            f"OR contains(lower({expr}), '{{') "
            f"OR contains(lower({expr}), '}}')) AS page_drop")
