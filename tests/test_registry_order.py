"""Pin the grading-order invariants (registry.GRADING_ORDER).

The grading driver checks a PREFIX of the registered query names (rounds
2-4: exactly the first 50), so registration order decides which operators
receive a driver correctness row.  Round-5 contract: after r2 ∪ r3 ∪ r4
every name has at least one driver row, so the prefix re-verifies what is
stale or changed — the flagship (re-registered as the blocked sparse-Gram
pair stage), q_array_funcs (the single red r4 row, head4 now projected to
scalars), q_dedup_embedding (data-dependent GEMM tile count), the six §J
event queries (the ts reader now converts naive-as-UTC explicitly), and
the 41 names whose latest green row is from the round-2 data era.
"""

from __future__ import annotations

from recsys_mapreduce_mrjob_spark import registry

PREFIX = 50

# Implementation or output shape changed in round 5 — need a fresh row.
CHANGED_R5 = {
    "q_topk_similar_items",  # flagship: blocked sparse-Gram pair stage
    "q_array_funcs",  # head4 array projected to scalar columns
    "q_dedup_embedding",  # GEMM tile count now derived from relation size
}

# Late-round-5 additions that have NEVER had a driver row: a first
# hash-graded row beats another re-verification, so they take the slots
# of q_window_ntile/q_window_first_last (the window family keeps four
# prefix re-grades plus the r4-green q_window_rank).
NEW_R5 = {
    "q_text_repetition",  # duplicate-bigram repetition curation signal
    "q_dedup_components_twostar",  # log-round two-star components backend
}

# §J event queries: load_events/stream_events ts conversion changed to the
# explicit naive-as-UTC form (session-timezone independent).
EVENTS_READER_R5 = {
    "q_window_tumbling",
    "q_window_sliding",
    "q_late_data_filter",
    "q_stateful_dedup_events",
    "q_events_funnel",
    "q_events_retention",
}

# Names whose latest green driver row is from round 2 — before the
# testdata regeneration — per the CORRECTNESS_r02–r04 history
# (VERDICT r4 "Next round" #6).
R2_DATA_ERA = {
    "q_ratings_matrix",
    "q_user_stats",
    "q_item_rater_counts",
    "q_pairwise_stats",
    "q_item_similarity",
    "q_item_cooccurrence",
    # The cohort's two rows-only members are swapped for never-graded
    # round-5 exact twins (see registry.py slots 10-50 comment): a
    # rows-only driver row is a bare row-count recording, worth less
    # than a first hash-graded row.
    "q_topk_similar_dimsum_exact",
    "q_recommend_topn",
    "q_scan_parquet",
    "q_project_expr",
    "q_join_left",
    "q_join_semi",
    "q_join_anti",
    "q_join_broadcast",
    "q_join_theta_range",
    "q_join_selfpair",
    "q_join_asof",
    "q_join_salted_skew",
    "q_join_fuzzy_names",
    "q_audit_constraints",
    "q_agg_distinct",
    "q_agg_rollup",
    "q_agg_cube",
    "q_agg_grouping_sets",
    "q_agg_stats",
    "q_dedup_near_exact",
    "q_agg_percentiles",
    "q_pivot_events",
    "q_agg_string_agg",
    "q_agg_salted_twophase",
    "q_window_running",
    "q_window_lag_lead",
    "q_window_range_frame",
    "q_window_topk_per_group",
    "q_intersect",
    "q_except",
    "q_date_funcs",
    "q_math_funcs",
    "q_json_funcs",
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


def test_prefix_is_exactly_the_round5_reverification_set():
    prefix = set(_loaded_names()[:PREFIX])
    for label, group in (
        ("changed-r5", CHANGED_R5),
        ("new-r5", NEW_R5),
        ("events-reader-r5", EVENTS_READER_R5),
        ("r2-data-era", R2_DATA_ERA),
    ):
        assert group <= prefix, f"{label} outside prefix: {sorted(group - prefix)}"
    # The prefix is exactly these sets — no slot wasted on redundant variants.
    assert prefix == CHANGED_R5 | NEW_R5 | EVENTS_READER_R5 | R2_DATA_ERA


def test_entry_views_preserve_order():
    import __spark_entry__ as entry

    assert list(entry.queries()) == registry.GRADING_ORDER
    oracle_names = list(entry.oracle_sql())
    assert oracle_names == [n for n in registry.GRADING_ORDER if n in registry.ORACLES]
