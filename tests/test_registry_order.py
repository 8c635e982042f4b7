"""Pin the grading-order invariants (registry.GRADING_ORDER).

The grading driver checks a PREFIX of the registered query names (rounds
2-7: exactly the first 50), so registration order decides which operators
receive a driver correctness row.  Round-8 contract (VERDICT r7 "Next
round" #1): the prefix first-grades the three queries NEW this round (the
graded CSV/text source pair + the streaming IVF index maintenance) and the
two queries CHANGED this round (curation keeper semantics → both curation
consumers' graded hashes move), then the ENTIRE 11-name stale queue the r7
verdict listed (all r4-data-era), then 32 of the 46-name round-5 data-era
cohort.  The 14 r5 names that did not fit lead the post-prefix queue for
round 9 (DEFERRED_R5 below — q_agg_cube displaced late-round by q_dedup_spans — each with a fresher-graded sibling covering
its shape this round).
"""

from __future__ import annotations

from recsys_mapreduce_mrjob_spark import registry

PREFIX = 50

# New this round: the reference's native text input path as graded
# queries (pipe `user|item|rating` + quoted Book-Crossing CSV), and the
# foreachBatch-maintained cell-partitioned IVF index.  All need their
# FIRST driver row.
NEW_R8 = {
    "q_scan_csv_ratings",
    "q_scan_csv_quoted",
    "q_stream_ann_index_exec",
    # Late round 8: exact substring-span dedup.  Its prefix slot comes
    # from q_agg_cube (DEFERRED_R5 below) — the grouping-sets family
    # keeps q_agg_grouping_sets and q_agg_rollup as fresh prefix rows.
    "q_dedup_spans",
}

# Changed this round: near-dup cluster keeper = min GATE-SURVIVOR doc_id
# (was: cluster-global min, which dropped a whole cluster when its keeper
# failed an upstream gate).  Plan and oracle moved together; both curation
# consumers re-grade in the change's birth round.
CHANGED_R8 = {"q_corpus_curation", "q_export_manifest"}

# The full stale queue VERDICT r7 #1 named — the 11 rows displaced from
# the r7 prefix, every one r4-data-era.
STALE_R4 = {
    "q_recommend_als",
    "q_union_all",
    "q_cond_funcs",
    "q_join_salted_skew",
    "q_dedup_near_exact",
    "q_scan_pruned",
    "q_map_funcs",
    "q_filter_compound",
    "q_topn_orders",
    "q_window_rank",
    "q_histogram",
}

# The round-5 data-era cohort members that FIT the remaining 32 slots.
R5_IN_PREFIX = {
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

# The 14 r5-era names the 50-slot prefix could not fit — deferred because
# a fresher-graded sibling covers each shape this round (scan family: 3
# fresh r8 rows; scalar packs: q_cond_funcs/q_map_funcs/q_histogram in
# prefix; agg stats/string_agg: six agg siblings in prefix; setops:
# q_union_all in prefix; window/events rows: rank/topn/lag_lead/
# range_frame/topk/tumbling all in prefix).  They lead the round-9 queue.
DEFERRED_R5 = {
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


def test_new_and_changed_lead_the_prefix():
    """The never-graded new queries and the changed queries sit in slots
    2-7 — graded even if the driver's cutoff ever shrinks below 50."""
    head = set(_loaded_names()[1 : 1 + len(NEW_R8) + len(CHANGED_R8)])
    assert head == NEW_R8 | CHANGED_R8


def test_stale_queue_precedes_r5_cohort():
    """The 11 r4-era rows the r7 verdict named occupy slots 8-18, ahead
    of the (one era fresher) r5 cohort."""
    names = _loaded_names()
    start = 1 + len(NEW_R8) + len(CHANGED_R8)
    assert set(names[start : start + len(STALE_R4)]) == STALE_R4


def test_deferred_r5_leads_the_post_prefix_queue():
    assert set(_loaded_names()[PREFIX : PREFIX + len(DEFERRED_R5)]) == DEFERRED_R5


def test_prefix_is_exactly_the_round8_verification_set():
    prefix = set(_loaded_names()[:PREFIX])
    for label, group in (
        ("flagship", {"q_topk_similar_items"}),
        ("new-r8", NEW_R8),
        ("changed-r8", CHANGED_R8),
        ("stale-r4", STALE_R4),
        ("r5-cohort", R5_IN_PREFIX),
    ):
        assert group <= prefix, f"{label} outside prefix: {sorted(group - prefix)}"
    # The prefix is exactly these sets — no slot wasted on redundant variants.
    assert prefix == (
        {"q_topk_similar_items"} | NEW_R8 | CHANGED_R8 | STALE_R4 | R5_IN_PREFIX
    )


def test_entry_views_preserve_order():
    import __spark_entry__ as entry

    assert list(entry.queries()) == registry.GRADING_ORDER
    oracle_names = list(entry.oracle_sql())
    assert oracle_names == [n for n in registry.GRADING_ORDER if n in registry.ORACLES]
