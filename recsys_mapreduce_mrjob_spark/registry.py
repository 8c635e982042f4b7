"""Query + oracle registry — the engine's declared surface.

Every operator the engine claims (SURVEY.md §2.2) registers here with:
  - a callable ``(spark, sf_dir) -> DataFrame`` (the Spark-native plan), and
  - optionally an ANSI-SQL oracle string DuckDB can run on the same parquet
    tables (omit for nondeterministic / non-SQL-expressible ops → the
    driver records a weaker rows-only check).

``__spark_entry__.queries()`` / ``oracle_sql()`` are thin views over this.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[["SparkSession", str], "DataFrame"]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

# ---------------------------------------------------------------------------
# Grading order.  The driver grades a PREFIX of the registered names (rounds
# 2–5: exactly the first 50), so registration order is the lever that decides
# which operators get a driver correctness row.  Round-6 rotation (VERDICT r5
# "Next round" #1/#3): flagship first, then the NINE round-5 names the driver
# has never graded (4 streaming-executed + 5 exact twins), the new round-6
# parquet-sink streaming query, the four r2-data-era rows, the two round-5
# plan rewrites last graded on r4 plans, the two queries changed this round
# (curation near-dup recompose, two-star fixpoint), the full r3-era cohort,
# and a stalest-r4 fill.  tests/test_registry_order.py pins this contract.
# ---------------------------------------------------------------------------
GRADING_ORDER: list[str] = [
    # -- slot 1: flagship (always first; re-graded every round) --
    "q_topk_similar_items",
    # -- slots 2-10: the nine round-5 queries the driver has NEVER
    #    graded (VERDICT r5 #1 — highest-leverage fix: a first driver
    #    row closes the only correctness gap): the four streaming-
    #    EXECUTED queries, then the five exact twins --
    "q_stream_tumbling_exec",
    "q_stream_user_counter_exec",
    "q_stream_session_exec",
    "q_stream_attribution_exec",
    "q_dedup_components_exact",
    "q_knn_cosine_lsh_exact",
    "q_dedup_simhash_exact",
    "q_pagerank_exact",
    "q_kmeans_exact",
    # -- slot 11: new round-6 query — the attribution join drained
    #    through a real parquet file sink (VERDICT r5 #7) --
    "q_stream_sink_parquet_exec",
    # -- slots 12-15: the four names whose latest driver row is from
    #    the ROUND-2 data era (two displaced window queries + the two
    #    rows-only sketches) --
    "q_window_ntile",
    "q_window_first_last",
    "q_topk_similar_dimsum",
    "q_agg_approx_distinct",
    # -- slots 16-17: rewritten in round 5 (size-dispatched GEMV knn,
    #    single-exchange tfidf) but last graded on the r4 plans --
    "q_knn_cosine",
    "q_text_tfidf",
    # -- slots 18-19: changed THIS round — curation now drops near-dup
    #    component non-keepers (two-star ladder), and two-star itself
    #    now iterates to an edge-set fixpoint --
    "q_corpus_curation",
    "q_dedup_components_twostar",
    # -- slots 20-45: the full round-3 data-era cohort — every name
    #    whose latest driver row is r3 (VERDICT r5 #3: converge all
    #    rows onto the current data era) --
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
    # -- slots 46-50: new round-6 operators (a first driver row beats an
    #    r4-green re-grade): Bloom-prefiltered semi-join, hot-key skew
    #    diagnostic, mixture reweighting, sequence packing, foreachBatch
    #    incremental maintenance --
    "q_join_bloom",
    "q_skew_profile",
    "q_mixture_resample",
    "q_pack_blocks",
    "q_stream_incremental_stats_exec",
    # ------------------------------------------------------------------
    # Past the 50-slot grading prefix: the displaced r4-green re-grades,
    # then the remaining r4-era rows (freshest-first if the cutoff is
    # time-budgeted), then the round-5 all-green cohort, which needs
    # re-verification least.
    # ------------------------------------------------------------------
    "q_dedup_jaccard_pairs",
    "q_window_session",
    "q_sample_stratified",
    "q_map_funcs",
    "q_cond_funcs",
    "q_agg_having_q11",
    "q_agg_max_q15",
    "q_agg_pricing_summary",
    "q_agg_q6_forecast",
    "q_anti_scalar_q22",
    "q_corr_min_q2",
    "q_corr_scalar_q17",
    "q_embedding_quantize",
    "q_events_anomaly",
    "q_filter_compound",
    "q_graph_degree_stats",
    "q_histogram",
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
    "q_recommend_als",
    "q_scan_pruned",
    "q_text_boilerplate",
    "q_text_contamination",
    "q_text_unigram_lm",
    "q_topn_orders",
    "q_udf_reg_corr",
    "q_union_all",
    "q_window_rank",
    # -- round-5 green cohort --
    "q_agg_cube",
    "q_agg_distinct",
    "q_agg_grouping_sets",
    "q_agg_percentiles",
    "q_agg_rollup",
    "q_agg_salted_twophase",
    "q_agg_stats",
    "q_agg_string_agg",
    "q_array_funcs",
    "q_audit_constraints",
    "q_date_funcs",
    "q_dedup_embedding",
    "q_dedup_near_exact",
    "q_events_funnel",
    "q_events_retention",
    "q_except",
    "q_intersect",
    "q_item_cooccurrence",
    "q_item_rater_counts",
    "q_item_similarity",
    "q_join_anti",
    "q_join_asof",
    "q_join_broadcast",
    "q_join_fuzzy_names",
    "q_join_left",
    "q_join_salted_skew",
    "q_join_selfpair",
    "q_join_semi",
    "q_join_theta_range",
    "q_json_funcs",
    "q_late_data_filter",
    "q_math_funcs",
    "q_pairwise_stats",
    "q_pivot_events",
    "q_project_expr",
    "q_ratings_matrix",
    "q_recommend_topn",
    "q_scan_parquet",
    "q_stateful_dedup_events",
    "q_text_repetition",
    "q_topk_similar_dimsum_exact",
    "q_user_stats",
    "q_window_lag_lead",
    "q_window_range_frame",
    "q_window_running",
    "q_window_sliding",
    "q_window_topk_per_group",
    "q_window_tumbling",
]


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: declare a query (and its DuckDB oracle) under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query registration: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every operator module so registrations run, then rebuild the
    registry dicts in :data:`GRADING_ORDER` (idempotent).

    Names missing from ``GRADING_ORDER`` are appended in registration order
    rather than dropped — the strict both-ways equality lives in
    tests/test_registry_order.py so a forgotten entry fails CI, not the
    grading driver.
    """
    from .operators import (  # noqa: F401
        recsys,
        relational,
        aggregates,
        windows,
        setops,
        scalars,
        events,
        text,
        dedup,
        embeddings,
        graph,
        multimodal,
        sampling,
        udfs,
    )
    from . import sql  # noqa: F401
    from .streaming import queries  # noqa: F401

    ordered = [n for n in GRADING_ORDER if n in QUERIES]
    ordered += [n for n in QUERIES if n not in GRADING_ORDER]
    reordered = {n: QUERIES[n] for n in ordered}
    QUERIES.clear()
    QUERIES.update(reordered)
    oracles = {n: ORACLES[n] for n in ordered if n in ORACLES}
    ORACLES.clear()
    ORACLES.update(oracles)
