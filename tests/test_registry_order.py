"""Pin the grading-order invariants (registry.GRADING_ORDER).

The grading driver checks a PREFIX of the registered query names (rounds
2-10: exactly the first 50), so registration order decides which operators
receive a driver correctness row.  Round-11 contract (VERDICT r10 "Next
round" #2, #3, #4, #5): the prefix first-grades the three queries NEW this
round (incremental NEAR-dup at ingestion, the classifier-gated curation
composite, the chunk-level export capstone), then the three whose
plan/oracle text was REFACTORED through shared helpers (the classifier's
oracle via the prefixable ``_clf_ctes``, the chunker via
``chunk_exploded``, the portable LSH signature family via the module-level
``portable_*`` functions — identity-preserving, the re-grade is the
proof), then the ENTIRE 29-name r7-era stale queue the r10 verdict listed,
then the 14 stalest r8-graded names — after this round no query's latest
grade is older than round 8.  The remaining 33 r8 names lead the
post-prefix queue for round 12 (DEFERRED_R8 below).
"""

from __future__ import annotations

from recsys_mapreduce_mrjob_spark import registry

PREFIX = 50

# New this round, needing their FIRST driver row.
NEW_R11 = {
    "q_stream_neardup_docs_exec",
    "q_corpus_curation_clf",
    "q_export_chunks",
}

# Refactored this round — re-graded to prove the rework is bit-identical.
CHANGED_R11 = {
    "q_text_quality_classifier",
    "q_text_chunks",
    "q_dedup_near_exact",
}

# The full r7-era stale queue VERDICT r10 #4 named (the 29 names the r10
# prefix deferred).
STALE_R7 = {
    "q_text_tfidf",
    "q_pack_shuffled",
    "q_dedup_jaccard_pairs",
    "q_embedding_quantize",
    "q_events_anomaly",
    "q_graph_degree_stats",
    "q_join_agg_q12",
    "q_join_agg_q14",
    "q_join_agg_q18",
    "q_join_agg_q3",
    "q_join_agg_q5",
    "q_join_agg_q7",
    "q_join_agg_q8",
    "q_join_agg_q9",
    "q_join_exists_q4",
    "q_join_inner",
    "q_join_multi_exists_q21",
    "q_join_or_q19",
    "q_multimodal_audio_windows",
    "q_multimodal_features",
    "q_nested_exists_q20",
    "q_notin_distinct_q16",
    "q_outer_agg_q13",
    "q_sample_stratified",
    "q_text_boilerplate",
    "q_text_contamination",
    "q_text_unigram_lm",
    "q_udf_reg_corr",
    "q_window_session",
}

# The round-8-graded cohort members that FIT the remaining 14 slots
# (stalest next era, taken in their r8 registration order).
R8_IN_PREFIX = {
    "q_scan_csv_ratings",
    "q_scan_csv_quoted",
    "q_stream_ann_index_exec",
    "q_corpus_curation",
    "q_export_manifest",
    "q_recommend_als",
    "q_union_all",
    "q_cond_funcs",
    "q_join_salted_skew",
    "q_scan_pruned",
    "q_map_funcs",
    "q_filter_compound",
    "q_topn_orders",
    "q_window_rank",
}

# The 33 r8-graded names the 50-slot prefix could not fit — every one is
# a relational/window/events/recsys shape whose family siblings grade in
# or near the prefix; they lead the round-12 stale queue.
DEFERRED_R8 = {
    "q_histogram",
    "q_agg_distinct",
    "q_agg_grouping_sets",
    "q_agg_percentiles",
    "q_agg_rollup",
    "q_agg_salted_twophase",
    "q_audit_constraints",
    "q_dedup_embedding",
    "q_events_funnel",
    "q_events_retention",
    "q_item_cooccurrence",
    "q_item_rater_counts",
    "q_item_similarity",
    "q_join_anti",
    "q_join_asof",
    "q_join_broadcast",
    "q_join_fuzzy_names",
    "q_join_left",
    "q_join_selfpair",
    "q_join_semi",
    "q_join_theta_range",
    "q_pairwise_stats",
    "q_pivot_events",
    "q_ratings_matrix",
    "q_recommend_topn",
    "q_stateful_dedup_events",
    "q_text_repetition",
    "q_topk_similar_dimsum_exact",
    "q_user_stats",
    "q_window_lag_lead",
    "q_window_range_frame",
    "q_window_topk_per_group",
    "q_window_tumbling",
}


def _loaded_names() -> list[str]:
    registry.load_all()
    return list(registry.QUERIES)


def test_grading_order_matches_registrations_exactly():
    names = set(_loaded_names())
    listed = set(registry.GRADING_ORDER)
    assert listed == names, (
        f"GRADING_ORDER out of sync: missing={sorted(names - listed)} "
        f"stale={sorted(listed - names)}"
    )
    assert len(registry.GRADING_ORDER) == len(set(registry.GRADING_ORDER))


def test_registry_iterates_in_grading_order():
    assert _loaded_names() == registry.GRADING_ORDER


def test_flagship_is_first():
    assert _loaded_names()[0] == "q_topk_similar_items"


def test_new_r11_lead_the_prefix():
    """The never-graded new queries sit in slots 2-4 — graded even if
    the driver's cutoff ever shrinks below 50."""
    head = set(_loaded_names()[1 : 1 + len(NEW_R11)])
    assert head == NEW_R11


def test_changed_r11_precede_the_stale_queue():
    """The three helper-refactored queries re-grade immediately after
    the new ones: their hashes are the proof the shared-helper
    factoring (oracle text + plan construction) changed nothing graded."""
    names = _loaded_names()
    start = 1 + len(NEW_R11)
    assert set(names[start : start + len(CHANGED_R11)]) == CHANGED_R11


def test_stale_r7_queue_precedes_r8_cohort():
    names = _loaded_names()
    start = 1 + len(NEW_R11) + len(CHANGED_R11)
    assert set(names[start : start + len(STALE_R7)]) == STALE_R7


def test_deferred_r8_leads_the_post_prefix_queue():
    assert set(_loaded_names()[PREFIX : PREFIX + len(DEFERRED_R8)]) == DEFERRED_R8


def test_prefix_is_exactly_the_round11_verification_set():
    prefix = set(_loaded_names()[:PREFIX])
    for label, group in (
        ("flagship", {"q_topk_similar_items"}),
        ("new-r11", NEW_R11),
        ("changed-r11", CHANGED_R11),
        ("stale-r7", STALE_R7),
        ("r8-cohort", R8_IN_PREFIX),
    ):
        assert group <= prefix, f"{label} outside prefix: {sorted(group - prefix)}"
    # The prefix is exactly these sets — no slot wasted on redundant variants.
    assert prefix == (
        {"q_topk_similar_items"}
        | NEW_R11
        | CHANGED_R11
        | STALE_R7
        | R8_IN_PREFIX
    )


def test_every_deferred_r8_name_has_a_family_sibling_in_prefix():
    """The deferral rule is auditable, not vibes: each deferred r8 name
    maps to a named sibling that IS in this round's prefix (the family
    query covering the same operator shape)."""
    sibling = {
        # scalar/agg family: histogram/percentile/distinct/grouping-set
        # shapes — the grouped-agg TPC-H rows grade in-prefix
        "q_histogram": "q_outer_agg_q13",
        "q_agg_distinct": "q_notin_distinct_q16",
        "q_agg_grouping_sets": "q_outer_agg_q13",
        "q_agg_percentiles": "q_text_unigram_lm",
        "q_agg_rollup": "q_outer_agg_q13",
        "q_agg_salted_twophase": "q_join_salted_skew",
        "q_audit_constraints": "q_join_exists_q4",
        # embedding pair family: the GEMM tile kernel grades in-prefix
        # via the flagship (same kernel, counts_only=False path)
        "q_dedup_embedding": "q_topk_similar_items",
        # events family: anomaly/session/window shapes grade in-prefix
        "q_events_funnel": "q_events_anomaly",
        "q_events_retention": "q_events_anomaly",
        # recsys family: the full R2-R14 chain grades via the flagship
        "q_item_cooccurrence": "q_topk_similar_items",
        "q_item_rater_counts": "q_topk_similar_items",
        "q_item_similarity": "q_topk_similar_items",
        "q_pairwise_stats": "q_topk_similar_items",
        "q_ratings_matrix": "q_scan_csv_ratings",
        "q_recommend_topn": "q_topk_similar_items",
        "q_topk_similar_dimsum_exact": "q_topk_similar_items",
        "q_user_stats": "q_scan_csv_ratings",
        # join family: inner/left/semi/anti/theta grade via the TPC-H
        # join rows and q_join_inner in-prefix
        "q_join_anti": "q_join_multi_exists_q21",
        "q_join_asof": "q_join_inner",
        "q_join_broadcast": "q_join_inner",
        "q_join_fuzzy_names": "q_join_inner",
        "q_join_left": "q_outer_agg_q13",
        "q_join_selfpair": "q_join_inner",
        "q_join_semi": "q_join_exists_q4",
        "q_join_theta_range": "q_join_inner",
        # pivot: the grouping-set shape via the TPC-H outer agg
        "q_pivot_events": "q_outer_agg_q13",
        # stateful dedup: the ingestion near-dup gate grades in-prefix
        "q_stateful_dedup_events": "q_stream_neardup_docs_exec",
        # text family: repetition shares the n-gram explode+agg shape
        "q_text_repetition": "q_text_unigram_lm",
        # window family: lag/lead/range/topk/tumbling — the session
        # window + rank rows grade in-prefix
        "q_window_lag_lead": "q_window_session",
        "q_window_range_frame": "q_window_session",
        "q_window_topk_per_group": "q_window_rank",
        "q_window_tumbling": "q_window_session",
    }
    assert set(sibling) == DEFERRED_R8
    prefix = set(_loaded_names()[:PREFIX])
    for deferred, sib in sibling.items():
        assert sib in prefix, (deferred, sib)


def test_entry_views_preserve_order():
    import __spark_entry__ as entry

    assert list(entry.queries()) == registry.GRADING_ORDER
    oracle_names = list(entry.oracle_sql())
    assert oracle_names == [n for n in registry.GRADING_ORDER if n in registry.ORACLES]
