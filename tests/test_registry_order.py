"""Pin the grading-order invariants (registry.GRADING_ORDER).

The grading driver checks a PREFIX of the registered query names (rounds
2-6: exactly the first 50), so registration order decides which operators
receive a driver correctness row.  Round-7 contract (VERDICT r6 "Next
round" #2): the prefix first-grades the query NEW this round (the
persisted cell-partitioned IVF index) and the query CHANGED this round
(skew profile now NULL-excludes on both sides), then re-grades the FULL
round-4 data-era cohort — after r6 the era census was Counter{r6: 50,
r5: 48, r4: 44}, so rotating all 44 r4 rows in leaves no name's latest
row older than r5 — topped up with stalest-r5 fills.  Amended later in round 7: four new
queries (temperature resampling, containment dedup, keyword extraction,
SCD2) take prefix slots from the two r5 fills and the two
least-informative r4 rows — see DISPLACED below.
"""

from __future__ import annotations

from recsys_mapreduce_mrjob_spark import registry

PREFIX = 50

# New this round: IVF with a PERSISTED cell-partitioned index (the
# shape tools/bench_ann_scale.py measured winning at 200k vectors,
# VERDICT r6 #5) plus the operators added later in round 7 —
# temperature resampling, containment dedup, keyword extraction, the
# CDC→SCD2 compaction, BM25, and the last batch (deterministic global
# training-order shuffle, CCNet perplexity tertiles, PII audit).  All
# need their FIRST driver row.
NEW_R7 = {
    "q_knn_cosine_ivf_indexed",
    "q_sample_temperature",
    "q_dedup_containment",
    "q_text_keywords",
    "q_events_scd2",
    "q_stream_scd2_exec",
    "q_text_bm25",
    "q_global_shuffle",
    "q_text_ccnet_buckets",
    "q_text_pii",
    "q_pack_shuffled",
    "q_export_manifest",
}

# Changed this round: skew profile's NULL keys excluded on both engine
# and oracle side (ADVICE r6 — count(DISTINCT) vs groupBy NULL-group
# divergence); tfidf's idf corpus size became a parquet-footer literal
# (one fewer job/exchange).
CHANGED_R7 = {"q_skew_profile", "q_text_tfidf"}

# The full round-4 data-era cohort: every name whose latest driver row
# is r4 after the r6 grading (VERDICT r6 #2).
R4_DATA_ERA = {
    "q_agg_having_q11",
    "q_agg_max_q15",
    "q_agg_pricing_summary",
    "q_agg_q6_forecast",
    "q_anti_scalar_q22",
    "q_corr_min_q2",
    "q_corr_scalar_q17",
    "q_dedup_jaccard_pairs",
    "q_embedding_quantize",
    "q_events_anomaly",
    "q_graph_degree_stats",
    "q_join_agg_q10",
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

# Displaced by the four later-round-7 queries (4 new names need 4 prefix
# slots): the two r5 fills (q_join_salted_skew's REGISTERED query is
# unchanged — the round only added profile-wiring helpers beside it) and
# the two least-informative r4 rows — q_recommend_als (rows-only by
# design: a re-grade only re-proves it runs) and q_union_all (the most
# trivial operator in the cohort).  They sit immediately past the prefix
# so they lead the stale queue next round.
DISPLACED = {
    "q_recommend_als",
    "q_union_all",
    # q_cond_funcs: trivial scalar pack, unchanged since its r4 green.
    "q_cond_funcs",
    "q_join_salted_skew",
    "q_dedup_near_exact",
    # q_scan_pruned's contract (pushdown + pruning) is plan-audited in
    # CI every run, so a driver re-grade adds the least of the cohort.
    "q_scan_pruned",
    # Displaced by the last round-7 batch (shuffle/ccnet/pii): the three
    # most trivial remaining r4 rows, each from a family with fresher-
    # graded siblings covering the same shapes.
    "q_map_funcs",
    "q_filter_compound",
    "q_topn_orders",
    # Displaced by q_pack_shuffled: the windows family's most basic row
    # (ntile / first_last are r6-green siblings).
    "q_window_rank",
    # Displaced by q_export_manifest: the scalar/agg family's most
    # self-contained remaining r4 row.
    "q_histogram",
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
    2-15 — graded even if the driver's cutoff ever shrinks below 50."""
    head = set(_loaded_names()[1 : 1 + len(NEW_R7) + len(CHANGED_R7)])
    assert head == NEW_R7 | CHANGED_R7


def test_displaced_lead_the_stale_queue():
    assert set(_loaded_names()[PREFIX : PREFIX + len(DISPLACED)]) == DISPLACED


def test_prefix_is_exactly_the_round7_verification_set():
    prefix = set(_loaded_names()[:PREFIX])
    for label, group in (
        ("flagship", {"q_topk_similar_items"}),
        ("new-r7", NEW_R7),
        ("changed-r7", CHANGED_R7),
        ("r4-data-era", R4_DATA_ERA),
    ):
        assert group <= prefix, f"{label} outside prefix: {sorted(group - prefix)}"
    # The prefix is exactly these sets — no slot wasted on redundant variants.
    assert prefix == (
        {"q_topk_similar_items"} | NEW_R7 | CHANGED_R7 | R4_DATA_ERA
    )


def test_entry_views_preserve_order():
    import __spark_entry__ as entry

    assert list(entry.queries()) == registry.GRADING_ORDER
    oracle_names = list(entry.oracle_sql())
    assert oracle_names == [n for n in registry.GRADING_ORDER if n in registry.ORACLES]
