"""DuckDB oracle-SQL generators for vector, dedup, and text-analysis
queries.

Shared-constant discipline (same as plans.oracle_sql): every hash /
shingle / profile definition is imported from the operator modules so
the Spark expressions and this SQL cannot drift.  Hashes are md5-based
(`('0x' || substr(md5(x),1,8))::BIGINT` == Spark
`conv(substring(md5(x),1,8),16,10)`), verified byte-identical in tests.
"""

from __future__ import annotations

from ..functions.text import PY_STRIP_RE, STD_TOKEN_DELIM_RE, WORD_SPLIT_RE
from ..operators.textstats import BPE_TOKEN_RE, LANG_PROFILES
from .oracle_sql import sql_str


# shared test query vector (dim 64) and query terms — they live here
# (no catalog imports) so catalog_ext and catalog_more can both use
# them without a cycle: catalog_more's decoration-time oracles run
# while catalog_ext is still mid-import whenever catalog_ext is the
# first plans module imported (plans.catalog's bottom imports chain
# through catalog_more), so anything they need must come from a leaf.
QUERY_VEC = [1.0, 0.5, -0.25, 0.75, -0.5] + [0.0] * 59
QUERY_TERMS = ["table", "join", "vector", "scan", "filter", "group"]


def _strip(expr: str) -> str:
    return f"regexp_replace({expr}, {sql_str(PY_STRIP_RE)}, '', 'g')"


def tokens_sql(expr: str) -> str:
    """Lowercased whitespace tokens; empty text -> empty list."""
    t = f"lower({_strip(expr)})"
    return (f"(CASE WHEN {t} = '' THEN []::VARCHAR[] "
            f"ELSE regexp_split_to_array({t}, {sql_str(WORD_SPLIT_RE)}) END)")


def bm25_sql(terms: list[str], k1: float = 1.2,
             b: float = 0.75, toks: str | None = None) -> tuple[str, str]:
    # NOTE: the tf/stats CTE reads FROM documents; callers whose Spark
    # side scores a 1:1 join of documents (e.g. docs x embeddings as an
    # engine index) get identical stats because the row set is the same.
    """(CTE prefix, score expression) for the Okapi-BM25 twin of
    operators.textscore.bm25_score — identical fold order and explicit
    ::DOUBLE casts (DuckDB float literals default to DECIMAL, a
    documented stringify hazard) so doubles match bit-for-bit."""
    toks = toks or tokens_sql("text")
    dfs = ", ".join(
        f"sum((len(list_filter(toks, x -> x = {sql_str(t)})) > 0)::INT) AS df_{i}"
        for i, t in enumerate(terms))
    cte = (f"tf AS (SELECT doc_id, {toks} AS toks FROM documents), "
           f"stats AS (SELECT count(*) AS n_docs, sum(len(toks)) AS sumdl, "
           f"{dfs} FROM tf)")
    avgdl = "(sumdl::DOUBLE / n_docs::DOUBLE)"
    norm = (f"(1.0::DOUBLE - {b!r}::DOUBLE"
            f" + {b!r}::DOUBLE * len(toks)::DOUBLE / {avgdl})")
    score = "0.0" + "".join(
        f" + ln(1.0::DOUBLE + (n_docs - df_{i} + 0.5::DOUBLE)"
        f" / (df_{i} + 0.5::DOUBLE))"
        f" * (len(list_filter(toks, x -> x = {sql_str(t)}))::DOUBLE"
        f" * {k1 + 1.0!r}::DOUBLE)"
        f" / (len(list_filter(toks, x -> x = {sql_str(t)}))::DOUBLE"
        f" + {k1!r}::DOUBLE * {norm})"
        for i, t in enumerate(terms))
    return cte, score


def std_tokens_sql(expr: str) -> str:
    """Lucene-standard-analyzed tokens — twin of
    functions.text.std_tokens (shared STD_TOKEN_DELIM_RE; split then
    drop the '' elements leading/trailing delimiters produce)."""
    return (f"list_filter(regexp_split_to_array(lower({expr}), "
            f"{sql_str(STD_TOKEN_DELIM_RE)}), x -> x <> '')")


def stemmed_tokens_sql(expr: str) -> str:
    """Twin of functions.text.stemmed_tokens: standard tokens, then the
    shared Porter-lite STEM_RULES chain per token (DuckDB replacement
    backref is \\1 where Spark's is $1; the patterns are shared
    verbatim — both engines' regex dialects cover them)."""
    from ..functions.text import STEM_RULES
    x = "x"
    for pat, keep in STEM_RULES:
        x = (f"regexp_replace({x}, {sql_str(pat)}, "
             f"{sql_str(chr(92) + '1' + keep)})")
    return f"list_transform({std_tokens_sql(expr)}, x -> {x})"


def english_tokens_sql(expr: str) -> str:
    """Twin of functions.text.english_tokens: standard tokens, Lucene
    English stop set filter, then the shared stem chain."""
    from ..functions.text import EN_STOPWORDS, STEM_RULES
    stops = ", ".join(sql_str(w) for w in EN_STOPWORDS)
    x = "x"
    for pat, keep in STEM_RULES:
        x = (f"regexp_replace({x}, {sql_str(pat)}, "
             f"{sql_str(chr(92) + '1' + keep)})")
    return (f"list_transform(list_filter({std_tokens_sql(expr)}, "
            f"x -> x NOT IN ({stops})), x -> {x})")


def md5_int32_sql(expr: str) -> str:
    return f"('0x' || substr(md5({expr}), 1, 8))::BIGINT"


def word_shingles_sql(toks: str, k: int = 3) -> str:
    """Distinct word k-shingles; short docs -> whole text as one shingle.
    Mirrors operators.dedup.word_shingles."""
    shingled = (f"list_distinct(list_transform(range(0, len({toks}) - {k} + 1), "
                f"i -> array_to_string(list_slice({toks}, i + 1, i + {k}), ' ')))")
    return (f"(CASE WHEN len({toks}) >= {k} THEN {shingled} "
            f"ELSE [array_to_string({toks}, ' ')] END)")


def dot_sql(a: str, b: str) -> str:
    """Sequential double-precision dot product (same fold order as the
    Spark aggregate expression)."""
    return (f"list_sum(list_transform(list_zip({a}, {b}), "
            f"p -> p[1]::DOUBLE * p[2]::DOUBLE))")


def cosine_sql(a: str, b: str) -> str:
    return (f"({dot_sql(a, b)} / "
            f"(sqrt({dot_sql(a, a)}) * sqrt({dot_sql(b, b)})))")


def vec_lit_sql(vec: list[float]) -> str:
    return "[" + ", ".join(f"{x!r}::DOUBLE" for x in vec) + "]"


def overlap_score_sql(expr: str, query_terms: list[str]) -> str:
    """Text-branch relevance: |distinct tokens ∩ query| / |query|."""
    qlist = "[" + ", ".join(sql_str(t) for t in query_terms) + "]"
    return (f"(len(list_intersect(list_distinct({tokens_sql(expr)}), {qlist}))"
            f"::DOUBLE / {len(query_terms)})")


# ---------------------------------------------------------------------------
# dedup
# ---------------------------------------------------------------------------

def exact_dup_sql() -> str:
    key = f"lower({_strip('text')})"
    return f"""
WITH hashed AS (
  SELECT doc_id, md5({key}) AS content_hash FROM documents
), groups AS (
  SELECT content_hash, min(doc_id) AS keeper_id, count(*) AS group_size
  FROM hashed GROUP BY content_hash
)
SELECT h.doc_id, h.content_hash, g.keeper_id, g.group_size,
       h.doc_id <> g.keeper_id AS is_duplicate
FROM hashed h JOIN groups g USING (content_hash)
"""


def minhash_pairs_sql(threshold: float = 0.8, num_hashes: int = 16,
                      num_bands: int = 4, k: int = 3,
                      min_band_overlap: int = 1,
                      source: str = "documents") -> str:
    """MinHash-LSH candidate pairs + exact-Jaccard verify, replicating
    the banding exactly (an LSH miss is a semantic outcome, not an
    error, so the oracle must band identically).  Universal-hash family
    and constants imported from operators.dedup so both sides compute
    bit-identical signatures.  ``min_band_overlap`` mirrors the
    operator's >= m shared-bucket precision filter (GROUP BY + HAVING
    instead of DISTINCT; identical at 1).  ``source`` names the
    (doc_id, text) relation to band — "documents" by default, or an
    outer CTE (DuckDB resolves outer CTE names inside subqueries),
    which is how composed oracles (cc_ingest_delta) band a derived
    corpus."""
    from ..operators.dedup import HASH_A, HASH_B, MINHASH_PRIME
    rows = num_hashes // num_bands
    toks = tokens_sql("text")
    sh = word_shingles_sql(toks, k)
    sig_cols = ",\n         ".join(
        f"min(({HASH_A[s]} * h + {HASH_B[s]}) % {MINHASH_PRIME}) AS h{s}"
        for s in range(num_hashes))
    band_cases = " ".join(
        "WHEN {b} THEN md5({concat})".format(
            b=b, concat=" || '_' || ".join(
                f"h{s}::VARCHAR" for s in range(b * rows, (b + 1) * rows)))
        for b in range(num_bands))
    return f"""
WITH sh AS (
  SELECT doc_id, {sh} AS sh FROM {source}
), ex AS (
  SELECT doc_id, unnest(sh) AS shingle FROM sh
), h AS (
  SELECT doc_id, {md5_int32_sql('shingle')} AS h FROM ex
), sig AS (
  SELECT doc_id,
         {sig_cols}
  FROM h GROUP BY doc_id
), banded AS (
  SELECT doc_id, band::INT AS band,
         CASE band::INT {band_cases} END AS band_hash
  FROM sig, (SELECT unnest(range(0, {num_bands})) AS band)
), cands AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
  HAVING count(*) >= {min_band_overlap}
)
SELECT c.id_a, c.id_b,
       round(len(list_intersect(sa.sh, sb.sh))::DOUBLE
             / len(list_distinct(sa.sh || sb.sh)), 6) AS jaccard
FROM cands c
JOIN sh sa ON sa.doc_id = c.id_a
JOIN sh sb ON sb.doc_id = c.id_b
WHERE len(list_intersect(sa.sh, sb.sh))::DOUBLE
      / len(list_distinct(sa.sh || sb.sh)) >= {threshold}
"""


def ngram_pairs_sql(threshold: float = 0.5, k: int = 3,
                    source: str = "documents") -> str:
    """``source`` names the (doc_id, text) relation to pair —
    "documents" by default, or an outer CTE (the minhash_pairs_sql
    convention), which is how the release-audit card restricts the
    exact pair set to its sampled stratum."""
    toks = tokens_sql("text")
    sh = word_shingles_sql(toks, k)
    jac = ("len(list_intersect(a.sh, b.sh))::DOUBLE"
           " / len(list_distinct(a.sh || b.sh))")
    return f"""
WITH sh AS (SELECT doc_id, {sh} AS sh FROM {source})
SELECT a.doc_id AS id_a, b.doc_id AS id_b, round({jac}, 6) AS jaccard
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE {jac} >= {threshold}
"""


def ngram_pairs_index_sql(threshold: float = 0.5, k: int = 3,
                          source: str = "documents") -> str:
    """Inverted-index twin of ngram_pairs_sql (the DuckDB side of
    operators.dedup.ngram_jaccard_pairs_index): explode distinct
    shingles, equi-join on the shingle, and derive jaccard from the
    shared-shingle count — sum-of-freq^2 cost instead of the n^2/2
    nested loop.  Exact same result set for threshold > 0 (zero-
    overlap pairs never meet in the index); used by the stratum
    oracles so the 406-entry check doesn't pay a quadratic
    enumeration per sweep."""
    assert threshold > 0, "index form needs threshold > 0"
    toks = tokens_sql("text")
    sh = word_shingles_sql(toks, k)
    return f"""
WITH shx AS (SELECT doc_id, {sh} AS sh FROM {source}),
exx AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS s FROM shx),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n AS n_a, b.n AS n_b,
         count(*) AS i
  FROM exx a JOIN exx b
    ON a.s = b.s AND a.doc_id < b.doc_id
   AND least(a.n, b.n)::DOUBLE / greatest(a.n, b.n) >= {threshold}
  GROUP BY a.doc_id, b.doc_id, a.n, b.n
)
SELECT id_a, id_b,
       round(i::DOUBLE / (n_a + n_b - i), 6) AS jaccard
FROM inter
WHERE i::DOUBLE / (n_a + n_b - i) >= {threshold}
"""


def simhash_sql() -> str:
    """64-bit simhash as (sim_hi, sim_lo): relational formulation —
    unnest tokens x range(32) bit positions, two grouped sums.  Docs
    with zero tokens keep signature 0 via the left join."""
    toks = tokens_sql("text")
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({toks}) AS tok FROM documents
), h AS (
  SELECT doc_id,
         {md5_int32_sql('tok')} AS h_lo,
         ('0x' || substr(md5(tok), 9, 8))::BIGINT AS h_hi
  FROM toks
), bits AS (
  SELECT doc_id, j,
         sum(CASE WHEN (h_lo >> j) & 1 = 1 THEN 1 ELSE -1 END) AS s_lo,
         sum(CASE WHEN (h_hi >> j) & 1 = 1 THEN 1 ELSE -1 END) AS s_hi
  FROM h, (SELECT unnest(range(0, 32))::INT AS j)
  GROUP BY doc_id, j
), sig AS (
  SELECT doc_id,
         sum(CASE WHEN s_hi > 0 THEN 1::BIGINT << j ELSE 0 END) AS sim_hi,
         sum(CASE WHEN s_lo > 0 THEN 1::BIGINT << j ELSE 0 END) AS sim_lo
  FROM bits GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(sig.sim_hi, 0)::BIGINT AS sim_hi,
       coalesce(sig.sim_lo, 0)::BIGINT AS sim_lo
FROM documents d LEFT JOIN sig ON d.doc_id = sig.doc_id
"""


def simhash_pairs_sql(max_hamming: int = 3) -> str:
    """Pigeonhole-blocked simhash pairs (4 x 16-bit blocks), exact
    hamming verify — same plan shape as the Spark operator."""
    return f"""
WITH sig AS (
  SELECT doc_id, sim_hi, sim_lo FROM ({simhash_sql().strip()})
), blocks AS (
  SELECT doc_id, sim_hi, sim_lo, blk,
         CASE blk WHEN 0 THEN sim_lo % 65536
                  WHEN 1 THEN sim_lo >> 16
                  WHEN 2 THEN sim_hi % 65536
                  ELSE sim_hi >> 16 END AS val
  FROM sig, (SELECT unnest(range(0, 4))::INT AS blk)
)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       (bit_count(xor(a.sim_hi, b.sim_hi))
        + bit_count(xor(a.sim_lo, b.sim_lo)))::INT AS hamming
FROM blocks a JOIN blocks b
  ON a.blk = b.blk AND a.val = b.val AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.sim_hi, b.sim_hi))
      + bit_count(xor(a.sim_lo, b.sim_lo)) <= {max_hamming}
"""


def embedding_pairs_sql(threshold: float = 0.95) -> str:
    cos = cosine_sql("a.embedding", "b.embedding")
    return f"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b, round({cos}, 6) AS score
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE {cos} >= {threshold}
"""


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------

def lang_scores_sql(expr: str) -> dict[str, str]:
    toks = f"list_distinct({tokens_sql(expr)})"
    out = {}
    for lang, words in LANG_PROFILES:
        wl = "[" + ", ".join(sql_str(w) for w in words) + "]"
        out[lang] = (f"(CASE WHEN len({tokens_sql(expr)}) = 0 THEN 0.0 "
                     f"ELSE len(list_intersect({toks}, {wl}))::DOUBLE"
                     f" / {len(words)} END)")
    return out


def detect_language_sql(expr: str, min_score: float = 0.05) -> str:
    scores = lang_scores_sql(expr)
    best = "greatest(" + ", ".join(scores.values()) + ")"
    cases = " ".join(
        f"WHEN {scores[lang]} = {best} THEN '{lang}'"
        for lang, _ in LANG_PROFILES)
    return (f"(CASE WHEN {best} < {min_score} THEN 'unknown' "
            f"ELSE (CASE {cases} END) END)")


def bpe_count_sql(expr: str) -> str:
    return f"len(regexp_extract_all({expr}, {sql_str(BPE_TOKEN_RE)}, 0))"


def fingerprint_sql(k: int = 8, mod: int = 16) -> str:
    """Mirrors operators.textstats.fingerprint: char k-grams of the
    whitespace-normalized text, md5-int hash, keep h % mod == 0,
    scalar projection (size/min/max) of the sorted distinct set."""
    t = (f"regexp_replace(lower({_strip('text')}), "
         f"{sql_str(WORD_SPLIT_RE)}, ' ', 'g')")
    grams = (f"(CASE WHEN length({t}) < {k} THEN [{t}] "
             f"ELSE list_transform(range(1, length({t}) - {k} + 2), "
             f"i -> substr({t}, i::INT, {k})) END)")
    kept = (f"list_sort(list_distinct(list_filter("
            f"list_transform({grams}, g -> {md5_int32_sql('g')}), "
            f"h -> h % {mod} = 0)))")
    return f"""
WITH fp AS (SELECT doc_id, {kept} AS fingerprint FROM documents)
SELECT doc_id, len(fingerprint) AS fingerprint_size,
       coalesce(fingerprint[1], -1) AS fp_min,
       coalesce(fingerprint[-1], -1) AS fp_max
FROM fp
"""
