"""The round driver's correctness snapshot checks exactly the FIRST 50
registered catalog entries (verified r6/r7).  This pin freezes that
prefix: a reorder or an insertion ahead of it would silently swap
which entries the driver grades — new entries must append in the
newest catalog_r* module (see plans/catalog.py bottom)."""

from __future__ import annotations

WINDOW = [
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_nation_revenue",
    "w1_top_orders_per_customer",
    "w4_running_customer_spend",
    "w2_order_sequence",
    "u1_union_distinct",
    "a5_corpus_stats_cube",
    "s11_cascading_delete",
    "ev_hourly_event_counts",
    "t1_clean_content",
    "t2_quality_score",
    "t3_quality_filter",
    "t3_quality_filter_030",
    "s4_extract_links_seeded",
    "f3_word_count",
    "f5_intent_classification",
    "f8_token_estimate",
    "s4_extract_links",
    "t7_token_budget_prefix",
    "m1_chunk_fixed",
    "m1_chunk_recursive",
    "r4_knn_topk",
    "r4_knn_filtered",
    "r5_self_similar",
    "r6_label_proxy_similarity",
    "r7_hybrid_bm25",
    "r7_hybrid_bm25_std",
    "r7_hybrid_tfidf",
    "r7_hybrid_fusion",
    "a3_multi_strategy_fusion",
    "r1_attribution_join",
    "a4_best_doc_per_source",
    "a6_source_stats",
    "a7_confidence_score",
    "dd_exact",
    "dd_minhash_lsh",
    "dd_ngram_jaccard",
    "dd_simhash_signatures",
    "dd_simhash_pairs",
    "dd_embedding_neardup",
    "ta_language_id",
    "ta_token_counts",
    "ta_fingerprint",
    "ev_sessionize",
    "ev_rolling_metrics",
    "w6_last_events_per_user",
    "ev_json_props",
    "m2_parent_child",
    "r2_parent_context_recursive",
]


def test_first_50_registrations_are_the_driver_window():
    from production_grade_rag_spark.plans.catalog import CATALOG
    assert list(CATALOG)[:50] == WINDOW


def test_window_is_fully_oracled():
    from production_grade_rag_spark.plans.catalog import CATALOG
    missing = [n for n in WINDOW if CATALOG[n].oracle is None]
    assert not missing, f"window entries without oracle: {missing}"
