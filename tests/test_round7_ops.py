"""Semantic invariants for the later-round-7 operators.

Exact cross-engine equality is already covered by tests/test_oracle_parity.py
(all four are oracle-declared); these pins assert the properties the
docstrings CLAIM — interval algebra for SCD2, rate algebra for temperature
sampling, metric bounds for containment — so a future edit that stays
hash-consistent with a co-edited oracle but silently breaks the semantics
still fails CI.
"""

from __future__ import annotations

import math

from pyspark.sql import Window
from pyspark.sql import functions as F

from recsys_mapreduce_mrjob_spark.operators.dedup import q_dedup_containment
from recsys_mapreduce_mrjob_spark.operators.events import q_events_scd2
from recsys_mapreduce_mrjob_spark.operators.sampling import q_sample_temperature
from recsys_mapreduce_mrjob_spark.operators.text import q_text_keywords
from recsys_mapreduce_mrjob_spark.sources.readers import load_events, load_table


def test_temperature_rates_match_ieee_reference(spark, smoke_dir):
    """rate_bp must equal floor(10000·sqrt(min/n)) computed in Python —
    the same IEEE-754 double chain the docstring claims both engines
    share — and the smallest stratum is kept at exactly 10000 bp."""
    rows = q_sample_temperature(spark, smoke_dir).collect()
    assert rows, "temperature resample returned no strata"
    min_toks = min(r.orig_tokens for r in rows)
    for r in rows:
        expect = math.floor(10000.0 * math.sqrt(min_toks / r.orig_tokens))
        assert r.rate_bp == expect, (r.lang, r.rate_bp, expect)
        assert 0 < r.kept_tokens <= r.orig_tokens
    assert max(r.rate_bp for r in rows) == 10000  # bottleneck stratum whole
    # Damping is monotone: bigger stratum, smaller (or equal) keep-rate.
    by_size = sorted(rows, key=lambda r: r.orig_tokens)
    rates = [r.rate_bp for r in by_size]
    assert rates == sorted(rates, reverse=True)


def test_scd2_intervals_partition_each_users_timeline(spark, smoke_dir):
    """Per user: runs are contiguous (valid_to == next valid_from), exactly
    one open (is_current) interval, and run event counts total the user's
    events — the gaps-and-islands compaction loses nothing."""
    out = q_events_scd2(spark, smoke_dir)
    per_user = (
        out.groupBy("user_id")
        .agg(
            F.sum(F.col("is_current").cast("int")).alias("n_open"),
            F.count(F.lit(1)).alias("n_runs"),
            F.sum("n_events").alias("n_events"),
        )
        .collect()
    )
    assert per_user
    assert all(r.n_open == 1 for r in per_user)
    ev = dict(
        load_events(spark, smoke_dir)
        .where(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert {r.user_id: r.n_events for r in per_user} == ev
    # Contiguity: every non-current interval closes exactly where the
    # next run opens (lead over the same (user, run_id) order).
    gaps = (
        out.withColumn(
            "next_from",
            F.lead("valid_from_s").over(
                Window.partitionBy("user_id").orderBy("run_id")
            ),
        )
        .where(F.col("valid_to_s") != F.col("next_from"))
        .count()
    )
    assert gaps == 0
    # Adjacent runs never share a status (else they'd be one run).
    repeats = (
        out.withColumn(
            "prev_status",
            F.lag("status").over(
                Window.partitionBy("user_id").orderBy("run_id")
            ),
        )
        .where(F.col("prev_status") == F.col("status"))
        .count()
    )
    assert repeats == 0


def test_containment_bounds_and_ordering(spark, smoke_dir):
    rows = q_dedup_containment(spark, smoke_dir).collect()
    for r in rows:
        assert 0.5 <= r.containment <= 1.0
        assert r.doc_a < r.doc_b


def test_keywords_topk_shape(spark, smoke_dir):
    out = q_text_keywords(spark, smoke_dir)
    per_doc = out.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("k"), F.max("rnk").alias("max_rnk")
    )
    bad = per_doc.where((F.col("k") > 3) | (F.col("max_rnk") > 3)).count()
    assert bad == 0
    # Every document with at least one token gets keywords.
    n_docs = (
        load_table(spark, smoke_dir, "documents")
        .where(F.length(F.trim("text")) > 0)
        .count()
    )
    assert per_doc.count() == n_docs
