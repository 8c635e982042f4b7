"""Pin reference semantics with the docstring micro-fixture.

The reference threads one worked example through every mapper/reducer
docstring (moviesSimilarities.py:≈55–175, reconstructed — FIXTURES.md §B.4).
These tests assert our dataflow functions reproduce those numbers exactly,
independent of the star-schema testdata.
"""

from __future__ import annotations

import math

import pytest

from recsys_mapreduce_mrjob_spark.operators import recsys as R
from recsys_mapreduce_mrjob_spark.sources.readers import RATING_SCHEMA

FIXTURE = [
    (17, 70, 3.0),
    (35, 21, 1.0),
    (49, 19, 2.0),
    (49, 21, 1.0),
    (49, 70, 4.0),
    (87, 19, 1.0),
    (87, 21, 2.0),
    (98, 19, 2.0),
]


@pytest.fixture(scope="module")
def ratings(spark):
    return spark.createDataFrame(FIXTURE, schema=RATING_SCHEMA).cache()


def test_user_stats_docstring(ratings):
    # docstring: user 49 → (3 items, sum 7)
    rows = {r.user_id: r for r in R.user_stats(ratings).collect()}
    assert rows[49].item_count == 3
    assert rows[49].rating_sum == 7.0
    assert rows[17].item_count == 1 and rows[17].rating_sum == 3.0


def test_pairwise_stats_docstring(ratings):
    # docstring pairs: (19,21)→{(2,1),(1,2)} is the only pair with n>=2
    rows = {(r.item_x, r.item_y): r for r in R.pairwise_stats(ratings).collect()}
    assert set(rows) == {(19, 21)}
    p = rows[(19, 21)]
    assert p.n == 2
    assert p.sxy == 2 * 1 + 1 * 2
    assert p.sx == 3.0 and p.sy == 3.0
    assert p.sxx == 5.0 and p.syy == 5.0
    # with min_support=1 the (19,70) and (21,70) singles appear too
    all_pairs = {
        (r.item_x, r.item_y): r
        for r in R.pairwise_stats(ratings, min_support=1).collect()
    }
    assert set(all_pairs) == {(19, 21), (19, 70), (21, 70)}
    assert all_pairs[(19, 70)].sxy == 8.0  # (2,4)
    assert all_pairs[(21, 70)].sxy == 4.0  # (1,4)


def test_item_similarity_reference_math(ratings):
    rows = {(r.item_x, r.item_y): r for r in R.item_similarity(ratings).collect()}
    p = rows[(19, 21)]
    # Pearson of {(2,1),(1,2)} = -1; reference formula with n=2
    assert p.corr == -1.0
    # cosine = sxy/(sqrt(sxx)*sqrt(syy)) = 4/5
    assert p.cos == round(4 / 5, 6)
    # reg_corr = (n/(n+10))*corr = (2/12)*-1  (PRIOR_COUNT=10, PRIOR=0)
    assert p.reg_corr == round(2 / 12 * -1, 6)
    # jaccard: raters(19)={49,87,98}, raters(21)={35,49,87} → 2/(3+3-2)
    assert p.jaccard == 0.5
    # norm_corr = (corr+1)/2
    assert p.norm_corr == 0.0


def test_topk_is_deterministic(ratings):
    rows = R.topk_similar_items(ratings, k=10).collect()
    assert [(r.item_x, r.item_y, r.rank) for r in rows] == [(19, 21, 1)]


def test_corr_matches_builtin(spark, ratings):
    """Self-consistency: sufficient-stats corr == Spark's builtin F.corr."""
    from pyspark.sql import functions as F

    a, b = ratings.alias("a"), ratings.alias("b")
    joined = a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("a.item_id") < F.col("b.item_id")),
    )
    builtin = (
        joined.groupBy(F.col("a.item_id").alias("x"), F.col("b.item_id").alias("y"))
        .agg(F.corr("a.rating", "b.rating").alias("c"), F.count("*").alias("n"))
        .where(F.col("n") >= 2)
        .collect()
    )
    ours = {(r.item_x, r.item_y): r.corr for r in R.item_similarity(ratings).collect()}
    for r in builtin:
        assert math.isclose(ours[(r.x, r.y)], r.c, abs_tol=1e-6)
