"""Product quantization (PQ) ANN — the memory-bound scale path next to
IVF (similarity.ivf_topk) and scalar quantization (similarity.sq_topk).

Reference scope: the reference's $vectorSearch knob is numCandidates
(vector_search.py:67); its index is external (Atlas).  PQ is the
standard compressed-index answer when the corpus itself is the 100 TB
problem: a d-dim float vector becomes m uint8 codes (m=8 here — 64x
narrower than float64), candidate scoring reads ONLY the code table,
and the full-width vectors are touched for k*rescore rows total.

Split of work:
- TRAIN (offline, metadata-scale): per-subspace k-means codebooks fit
  on a deterministic hash-ordered sample collected to the driver —
  codebook training on a bounded sample is the standard practice (the
  sample is the index metadata, like the IVF centroid table); the
  full corpus never leaves the executors.
- ENCODE (offline, one pass): argmin-to-codebook per subspace as an
  Arrow-batched pandas UDF — O(n * m * k_codes * dsub) float ops,
  vectorized in numpy per batch; output is an array<int> column small
  enough to cache/bucket at 100 TB.
- SEARCH (online, scan of the NARROW code table): asymmetric distance
  computation (ADC) — the query builds one inner-product lookup table
  per subspace (m * k_codes floats, literal arrays), and the
  approximate score is m element_at lookups + adds, pure column
  expressions inside whole-stage codegen; TakeOrderedAndProject picks
  k*rescore candidates, exact cosine rescoring runs on those rows only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vector import cosine, to_double_array


def pq_train(corpus: DataFrame, m: int = 8, k_codes: int = 16,
             sample: int = 4096, iters: int = 10,
             vec_col: str = "embedding",
             id_col: str = "vec_id") -> list[np.ndarray]:
    """Fit per-subspace Lloyd k-means codebooks on a deterministic
    hash-ordered sample (same rows every run/partitioning).  Returns
    ``m`` arrays of shape (k_codes, d/m)."""
    key = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":pq")))
    rows = (corpus
            .select(to_double_array(F.col(vec_col)).alias("__v"), key.alias("__k"))
            .orderBy("__k").limit(sample).collect())
    X = np.asarray([r["__v"] for r in rows], dtype=np.float64)
    n, d = X.shape
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    k_eff = min(k_codes, n)
    rng = np.random.RandomState(42)
    books: list[np.ndarray] = []
    for j in range(m):
        sub = X[:, j * dsub:(j + 1) * dsub]
        C = sub[rng.choice(n, size=k_eff, replace=False)].copy()
        for _ in range(iters):
            d2 = ((sub[:, None, :] - C[None, :, :]) ** 2).sum(-1)
            assign = d2.argmin(1)
            for c in range(k_eff):
                pts = sub[assign == c]
                if len(pts):
                    C[c] = pts.mean(0)
        books.append(C)
    return books


def pq_encode(corpus: DataFrame, codebooks: list[np.ndarray],
              vec_col: str = "embedding",
              code_col: str = "pq_codes") -> DataFrame:
    """One offline pass: nearest-codeword index per subspace.
    Arrow-batched pandas UDF (numpy argmin over (batch, k_codes, dsub));
    the codebooks ride the closure — m*k_codes*dsub floats, broadcast
    metadata."""
    m = len(codebooks)
    dsub = codebooks[0].shape[1]
    books = [np.asarray(cb, dtype=np.float64) for cb in codebooks]

    @F.pandas_udf("array<int>")
    def enc(s: pd.Series) -> pd.Series:
        X = np.asarray([np.asarray(v, dtype=np.float64) for v in s])
        out = np.empty((len(X), m), dtype=np.int32)
        for j in range(m):
            sub = X[:, j * dsub:(j + 1) * dsub]
            d2 = ((sub[:, None, :] - books[j][None, :, :]) ** 2).sum(-1)
            out[:, j] = d2.argmin(1)
        return pd.Series([row for row in out])

    return corpus.withColumn(code_col, enc(to_double_array(F.col(vec_col))))


def pq_topk(encoded: DataFrame, corpus: DataFrame, query_vec: list[float],
            codebooks: list[np.ndarray], k: int = 10, rescore: int = 8,
            vec_col: str = "embedding", id_col: str = "vec_id",
            code_col: str = "pq_codes") -> DataFrame:
    """ADC search + exact rescore.  Candidate ranking maximizes the
    approximate inner product sum_j <q_sub_j, codeword_j> — a pure
    codegen expression over the narrow code table (the corpus'
    float vectors are read for the k*rescore survivors only); final
    scores are exact cosine, deterministic id tiebreak."""
    q = np.asarray(query_vec, dtype=np.float64)
    m = len(codebooks)
    dsub = codebooks[0].shape[1]
    terms = []
    for j in range(m):
        lut = codebooks[j] @ q[j * dsub:(j + 1) * dsub]     # (k_codes,)
        lut_col = F.array(*[F.lit(float(x)) for x in lut])
        terms.append(F.element_at(
            lut_col, F.element_at(F.col(code_col), j + 1) + F.lit(1)))
    approx = terms[0]
    for t in terms[1:]:
        approx = approx + t
    cand = (encoded
            .withColumn("__approx", approx)
            .orderBy(F.desc("__approx"), F.col(id_col))
            .limit(k * rescore)
            .select(id_col))
    qlit = F.array(*[F.lit(float(x)) for x in q])
    exact = (corpus.join(F.broadcast(cand), id_col)
             .withColumn("score",
                         cosine(to_double_array(F.col(vec_col)), qlit)))
    return (exact.orderBy(F.desc("score"), F.col(id_col)).limit(k)
            .select(id_col, F.round("score", 6).alias("score")))
