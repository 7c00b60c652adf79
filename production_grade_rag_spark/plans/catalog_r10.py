"""Round-10 catalog entries.

VERDICT r9 task list: the shared recall-gated kNN-graph store
(g_knn_edges*), the bounded-state KMV distinct sketch (a30/a31), the
approx-percentile knob on the per-domain quality cut
(w10_quality_pernorm_approx), the soft-dedup -> weighted-sampler
composition (t41), the BPE depth-64 curve (t20_bpe_merges64), and the
watermarked streaming sessionize twin (st_sessionize).

Registered after catalog_r9 so the driver's existing correctness
window is unchanged (REGISTRATION ORDER IS LOAD-BEARING — see
plans/catalog.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import _t, register


# ===========================================================================
# The shared kNN-graph store as a driver-visible surface (VERDICT r9
# #1): the exact edge list value-oracled, the IVF build recall-gated
# ===========================================================================

def _und_cte() -> str:
    from . import oracle_vec as OV
    from .catalog_r8b import _LP_K
    cos = OV.cosine_sql("a.embedding", "b.embedding")
    return f"""
WITH e AS (
  SELECT vec_id, embedding FROM embeddings
), nb AS (
  SELECT src, dst FROM (
    SELECT a.vec_id AS src, b.vec_id AS dst,
           row_number() OVER (PARTITION BY a.vec_id
                              ORDER BY {cos} DESC, b.vec_id) AS rn
    FROM e a JOIN e b ON a.vec_id <> b.vec_id) WHERE rn <= {_LP_K}
), und AS (
  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
  FROM nb
)"""


@register("g_knn_edges", oracle=_und_cte() + """
SELECT u, v FROM und ORDER BY u, v
""")
def g_knn_edges(spark: SparkSession, d: str) -> DataFrame:
    """The shared symmetrized 5-NN edge store ITSELF as a
    value-oracled entry: the exact canonical undirected edge list
    every g5–g9 graph entry now reads (operators/knn_graph.py builds
    it once per process/dataset as narrow parquet — the _pca_centered
    pattern applied to the graph, VERDICT r9 #1).  DuckDB recomputes
    the full all-pairs kNN and must reproduce the stored edges
    row-for-row — the store's contents, not just its consumers, are
    driver-checked.

    Scale shape: at 100 TB the exact build never runs — the ivf
    build (g_knn_edges_ivf, recall-gated below) writes the store and
    this entry becomes the spot-audit form."""
    from ..operators.knn_graph import knn_und
    return knn_und(spark, d).orderBy("u", "v")


@register("g_knn_edges_ivf")   # rows-only: approximate by design
def g_knn_edges_ivf(spark: SparkSession, d: str) -> DataFrame:
    """The IVF-built edge store — the 100 TB form of g_knn_edges
    (ivf_knn_join cell-pruned candidates: every vector scores
    n_probe/n_lists of the corpus instead of all of it, so the edge
    build is candidate-bounded where the exact form is a quadratic
    window).  Edge-set recall vs the exact store is gated by
    g_knn_edges_ivf_recall; stress_bench times the census over these
    edges at the 10x tier with the KMeans fit ledgered separately
    from the amortized read."""
    from ..operators.knn_graph import knn_und
    return (knn_und(spark, d, method="ivf", n_probe=_IVF_EDGE_PROBE)
            .orderBy("u", "v"))


# the gated IVF operating point: 16 cells, probe 8 — measured edge
# recall 0.94 (sf0.001) / 0.96 (sf0.01) against floor 0.9; probe 4
# measured 0.82 at both SFs, probe 6 measured 0.91 (too tight a
# margin for a gate).  At scale n_lists grows ~sqrt(n) (the stress
# tier uses 64 lists at 10x) so the probed corpus share FALLS as the
# corpus grows at fixed probe count.
_IVF_EDGE_PROBE = 8


def _knn_recall_oracle() -> str:
    return _und_cte() + """
SELECT count(*)::BIGINT AS n_exact, TRUE AS floor_met
FROM und
"""


@register("g_knn_edges_ivf_recall", oracle=_knn_recall_oracle())
def g_knn_edges_ivf_recall(spark: SparkSession, d: str) -> DataFrame:
    """Recall gate for the IVF edge build with a data-dependent
    oracle: n_exact is DuckDB's own count of the exact undirected
    edge set, and floor_met gates the IVF store's edge recovery at
    >= 0.9 (16 cells, probe 8; measured 0.94 at sf0.001 AND 0.96 at
    sf0.01 — cross-cell neighbors are the designed loss, exactly the
    dd_semdedup_recall trade).  This is the gate the r9 verdict
    asked to pin the g5–g9 family's scale path with: all five
    consumers read the store this entry certifies."""
    from ..operators.knn_graph import knn_und
    from .catalog_more import _recall_summary
    exact = knn_und(spark, d)
    approx = knn_und(spark, d, method="ivf", n_probe=_IVF_EDGE_PROBE)
    return _recall_summary(exact, approx, ["u", "v"], floor=0.9)
