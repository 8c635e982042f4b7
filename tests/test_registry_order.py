"""Pin the grading-order invariants (registry.GRADING_ORDER).

The grading driver checks a PREFIX of the registered query names (rounds
2-9: exactly the first 50), so registration order decides which operators
receive a driver correctness row.  Round-10 contract (VERDICT r9 "Next
round" #1, #2, #4, #5, #6): the prefix first-grades the seven queries NEW
this round (the batched ANN probe, the span-rewritten export capstone, the
semantic-dedup keep-one composition, the per-source frequency cap, the
context-window chunker, degree-oriented triangle counting, the
streaming ingestion dedup, the hashed-feature quality classifier, the
graded JSONL source path, and the LSH recall cross-audit),
then the five queries whose plan/oracle/state-layout CHANGED
this round (the hashed/fused span family and the two bucketed-state
execs — same oracles, the hash must prove bit-identity), then the ENTIRE
16-name r6-era stale queue the r9 verdict listed, then 18 of the 47-name
round-7-graded cohort — after this round no query's latest grade is
older than round 7.  The 29 r7 names that did not fit lead the
post-prefix queue for round 11 (DEFERRED_R7 below).
"""

from __future__ import annotations

from recsys_mapreduce_mrjob_spark import registry

PREFIX = 50

# New this round, needing their FIRST driver row.
NEW_R10 = {
    "q_knn_batch_ivf",
    "q_export_manifest_rewritten",
    "q_dedup_semantic",
    "q_sample_source_cap",
    "q_text_chunks",
    "q_graph_triangles",
    "q_stream_dedup_docs_exec",
    "q_text_quality_classifier",
    "q_scan_jsonl_docs",
    "q_dedup_lsh_recall",
}

# Changed this round — re-graded to prove the rework is bit-identical.
CHANGED_R10 = {
    "q_dedup_spans",
    "q_dedup_span_rewrite",
    "q_dedup_span_rewrite_audit",
    "q_stream_incremental_stats_exec",
    "q_stream_scd2_exec",
}

# The full r6-era stale queue VERDICT r9 #6 named (the 16 names the r9
# prefix deferred).
STALE_R6 = {
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

# The round-7-graded cohort members that FIT the remaining 18 slots.
R7_IN_PREFIX = {
    "q_knn_cosine_ivf_indexed",
    "q_sample_temperature",
    "q_dedup_containment",
    "q_text_keywords",
    "q_events_scd2",
    "q_text_bm25",
    "q_global_shuffle",
    "q_text_ccnet_buckets",
    "q_text_pii",
    "q_skew_profile",
    "q_agg_having_q11",
    "q_agg_max_q15",
    "q_agg_pricing_summary",
    "q_agg_q6_forecast",
    "q_anti_scalar_q22",
    "q_corr_min_q2",
    "q_corr_scalar_q17",
    "q_join_agg_q10",
}

# The 29 r7-graded names the 50-slot prefix could not fit — every one is
# a TPC-H/relational/multimodal/embedding/events/text shape whose family
# siblings grade in or near the prefix; they lead the round-11 stale
# queue.  q_embedding_quantize, q_events_anomaly, q_text_tfidf,
# q_pack_shuffled and q_dedup_jaccard_pairs ceded their slots to the
# five late round-10 additions.
DEFERRED_R7 = {
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


def test_new_r10_lead_the_prefix():
    """The never-graded new queries sit in slots 2-11 — graded even if
    the driver's cutoff ever shrinks below 50."""
    head = set(_loaded_names()[1 : 1 + len(NEW_R10)])
    assert head == NEW_R10


def test_changed_r10_precede_the_stale_queue():
    """The five re-worked queries re-grade immediately after the new
    ones: their hashes are the proof the hashed/fused span relation and
    the bucketed state layout changed nothing graded."""
    names = _loaded_names()
    start = 1 + len(NEW_R10)
    assert set(names[start : start + len(CHANGED_R10)]) == CHANGED_R10


def test_stale_r6_queue_precedes_r7_cohort():
    names = _loaded_names()
    start = 1 + len(NEW_R10) + len(CHANGED_R10)
    assert set(names[start : start + len(STALE_R6)]) == STALE_R6


def test_deferred_r7_leads_the_post_prefix_queue():
    assert set(_loaded_names()[PREFIX : PREFIX + len(DEFERRED_R7)]) == DEFERRED_R7


def test_prefix_is_exactly_the_round10_verification_set():
    prefix = set(_loaded_names()[:PREFIX])
    for label, group in (
        ("flagship", {"q_topk_similar_items"}),
        ("new-r10", NEW_R10),
        ("changed-r10", CHANGED_R10),
        ("stale-r6", STALE_R6),
        ("r7-cohort", R7_IN_PREFIX),
    ):
        assert group <= prefix, f"{label} outside prefix: {sorted(group - prefix)}"
    # The prefix is exactly these sets — no slot wasted on redundant variants.
    assert prefix == (
        {"q_topk_similar_items"}
        | NEW_R10
        | CHANGED_R10
        | STALE_R6
        | R7_IN_PREFIX
    )


def test_every_deferred_r7_name_has_a_family_sibling_in_prefix():
    """The deferral rule is auditable, not vibes: each deferred r7 name
    maps to a named sibling that IS in this round's prefix (the family
    query covering the same operator shape)."""
    sibling = {
        # embeddings family: the persisted-IVF query grades in-prefix
        "q_embedding_quantize": "q_knn_cosine_ivf_indexed",
        # events family: the SCD2 compaction grades in-prefix
        "q_events_anomaly": "q_events_scd2",
        # graph family: the pagerank fixpoint (exact twin) grades
        # in-prefix via the r6 set
        "q_graph_degree_stats": "q_pagerank_items",
        # join+agg TPC-H shapes — q10 of the same family grades
        # in-prefix this round
        "q_join_agg_q12": "q_join_agg_q10",
        "q_join_agg_q14": "q_join_agg_q10",
        "q_join_agg_q18": "q_join_agg_q10",
        "q_join_agg_q3": "q_join_agg_q10",
        "q_join_agg_q5": "q_join_agg_q10",
        "q_join_agg_q7": "q_join_agg_q10",
        "q_join_agg_q8": "q_join_agg_q10",
        "q_join_agg_q9": "q_join_agg_q10",
        # EXISTS / NOT-IN / scalar-subquery shapes
        "q_join_exists_q4": "q_anti_scalar_q22",
        "q_join_multi_exists_q21": "q_anti_scalar_q22",
        "q_nested_exists_q20": "q_agg_max_q15",
        "q_notin_distinct_q16": "q_corr_min_q2",
        "q_outer_agg_q13": "q_agg_having_q11",
        "q_join_or_q19": "q_agg_q6_forecast",
        "q_join_inner": "q_join_agg_q10",
        # multimodal family: framesample/resize grade in-prefix (r6 set)
        "q_multimodal_audio_windows": "q_multimodal_framesample",
        "q_multimodal_features": "q_multimodal_resize",
        # sampling / text families
        "q_sample_stratified": "q_sample_weighted",
        "q_text_boilerplate": "q_text_keywords",
        "q_text_contamination": "q_text_bm25",
        # tf-idf family: the per-doc TF-IDF keyword ranking over the
        # SAME shared tf memo grades in-prefix
        "q_text_tfidf": "q_text_keywords",
        # packing family: the same two_phase_rank permutation grades
        # in-prefix via the global-shuffle row
        "q_pack_shuffled": "q_global_shuffle",
        # set-similarity pair family: the same rare-shingle candidate
        # rung grades in-prefix via containment, and the new recall
        # audit contains the jaccard-pairs algebra as its rare side
        "q_dedup_jaccard_pairs": "q_dedup_containment",
        "q_text_unigram_lm": "q_text_ccnet_buckets",
        "q_udf_reg_corr": "q_corr_scalar_q17",
        "q_window_session": "q_events_scd2",
    }
    assert set(sibling) == DEFERRED_R7
    prefix = set(_loaded_names()[:PREFIX])
    for deferred, sib in sibling.items():
        assert sib in prefix, (deferred, sib)


def test_entry_views_preserve_order():
    import __spark_entry__ as entry

    assert list(entry.queries()) == registry.GRADING_ORDER
    oracle_names = list(entry.oracle_sql())
    assert oracle_names == [n for n in registry.GRADING_ORDER if n in registry.ORACLES]
