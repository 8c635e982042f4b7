"""Pin the grading-order invariants (registry.GRADING_ORDER).

The grading driver checks a PREFIX of the registered query names (rounds
2-5: exactly the first 50), so registration order decides which operators
receive a driver correctness row.  Round-6 contract (VERDICT r5 "Next
round" #1/#3): the prefix first-grades the nine round-5 names the driver
has never seen (4 streaming-executed queries + 5 exact twins) plus the
new parquet-sink streaming query, then re-grades the r2-data-era rows,
the two round-5 plan rewrites whose latest row is on the r4 plan, the
two queries changed this round, and the full r3-era cohort, topped up
with a stalest-r4 fill.
"""

from __future__ import annotations

from recsys_mapreduce_mrjob_spark import registry

PREFIX = 50

# Never graded by the driver (added late round 5, past the r5 cutoff) —
# a first hash-graded row beats any re-verification (VERDICT r5 #1).
NEVER_GRADED_R5 = {
    "q_stream_tumbling_exec",
    "q_stream_user_counter_exec",
    "q_stream_session_exec",
    "q_stream_attribution_exec",
    "q_dedup_components_exact",
    "q_knn_cosine_lsh_exact",
    "q_dedup_simhash_exact",
    "q_pagerank_exact",
    "q_kmeans_exact",
}

# New this round: the attribution join drained through a real parquet
# file sink (VERDICT r5 #7 — the memory sink was the only graded path),
# the Bloom-prefiltered semi-join, the hot-key skew diagnostic, the
# training-mixture reweighting, and the sequence-packing prefix sum.
NEW_R6 = {
    "q_stream_sink_parquet_exec",
    "q_join_bloom",
    "q_skew_profile",
    "q_mixture_resample",
    "q_pack_blocks",
    "q_stream_incremental_stats_exec",
}

# Latest driver row is from the ROUND-2 data era.
R2_DATA_ERA = {
    "q_window_ntile",
    "q_window_first_last",
    "q_topk_similar_dimsum",
    "q_agg_approx_distinct",
}

# Plans rewritten in round 5 (size-dispatched GEMV knn; single-exchange
# tfidf) but last graded on the r4 plans (VERDICT r5 #2 of "What's
# missing").
REWRITTEN_R5_STALE_ROW = {"q_knn_cosine", "q_text_tfidf"}

# Changed THIS round: curation now drops near-dup component non-keepers
# through the two-star ladder, and two-star itself now iterates to an
# edge-set fixpoint instead of a fixed 6-round budget (ADVICE r5).
CHANGED_R6 = {"q_corpus_curation", "q_dedup_components_twostar"}

# The full round-3 data-era cohort (VERDICT r5 #3: converge every name's
# latest row onto the current data era).
R3_DATA_ERA = {
    "q_dedup_components",
    "q_dedup_exact",
    "q_dedup_near",
    "q_dedup_simhash",
    "q_embedding_label_stats",
    "q_kmeans_embeddings",
    "q_knn_cosine_ivf",
    "q_knn_cosine_lsh",
    "q_knn_per_label",
    "q_multimodal_framesample",
    "q_multimodal_resize",
    "q_pagerank_items",
    "q_sample_reservoir_per_lang",
    "q_sample_split",
    "q_sample_weighted",
    "q_sketch_countmin",
    "q_string_funcs",
    "q_text_bigrams",
    "q_text_bpe_tokens",
    "q_text_doc_stats",
    "q_text_langid",
    "q_text_quality",
    "q_text_token_stats",
    "q_text_winnow_pairs",
    "q_text_wordcount",
    "q_udf_znorm_per_user",
}

# No r4-fill slots remain: every non-re-verification slot went to a
# first-graded round-6 name (a first driver row beats an r4-green
# re-grade under the grading contract).
R4_FILL: set[str] = set()


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


def test_never_graded_names_lead_the_prefix():
    """The nine never-graded names sit in slots 2-10 — graded even if the
    driver's cutoff ever shrinks below 50."""
    head = set(_loaded_names()[1:10])
    assert head == NEVER_GRADED_R5


def test_prefix_is_exactly_the_round6_verification_set():
    prefix = set(_loaded_names()[:PREFIX])
    for label, group in (
        ("flagship", {"q_topk_similar_items"}),
        ("never-graded-r5", NEVER_GRADED_R5),
        ("new-r6", NEW_R6),
        ("r2-data-era", R2_DATA_ERA),
        ("rewritten-r5", REWRITTEN_R5_STALE_ROW),
        ("changed-r6", CHANGED_R6),
        ("r3-data-era", R3_DATA_ERA),
        ("r4-fill", R4_FILL),
    ):
        assert group <= prefix, f"{label} outside prefix: {sorted(group - prefix)}"
    # The prefix is exactly these sets — no slot wasted on redundant variants.
    assert prefix == (
        {"q_topk_similar_items"}
        | NEVER_GRADED_R5
        | NEW_R6
        | R2_DATA_ERA
        | REWRITTEN_R5_STALE_ROW
        | CHANGED_R6
        | R3_DATA_ERA
        | R4_FILL
    )


def test_entry_views_preserve_order():
    import __spark_entry__ as entry

    assert list(entry.queries()) == registry.GRADING_ORDER
    oracle_names = list(entry.oracle_sql())
    assert oracle_names == [n for n in registry.GRADING_ORDER if n in registry.ORACLES]
