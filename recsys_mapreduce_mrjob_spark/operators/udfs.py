"""UDF surface: Arrow-vectorized Python where Catalyst can't go
(SURVEY.md §2.2.L).

The reference computes every metric row-at-a-time in CPython
(``metrics.py``, reconstructed — SURVEY §2.1); the engine's rule is the
opposite: built-in expressions first, and when Python is genuinely needed,
*vectorized* ``pandas_udf`` over Arrow batches — ~10–100× the throughput
of row-at-a-time ``F.udf``, the only acceptable Python at 100 TB.

``q_udf_reg_corr`` reimplements R10's regularized correlation
(``metrics.py:≈62–80``: ``w·corr + (1−w)·prior``, ``w = n/(n+10)``) as a
pandas_udf over the pair sufficient statistics and is declared with an
EXACT oracle — deterministic double arithmetic, so the UDF must agree
bit-for-bit (after round-6) with both the Catalyst expression form
(``q_item_similarity.reg_corr``) and DuckDB.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..functions.similarity import PRIOR_CORRELATION, PRIOR_COUNT
from ..registry import register
from .recsys import _PAIR_STATS_CTE, _cached_ratings, pairwise_stats
from ..sources.readers import RATINGS_ORACLE_CTE


def _reg_corr_fn(
    n: pd.Series, sxy: pd.Series, sx: pd.Series, sy: pd.Series,
    sxx: pd.Series, syy: pd.Series,
) -> pd.Series:
    """Vectorized regularized Pearson correlation from sufficient stats.

    Mirrors functions/similarity.py exactly: variance terms clamped at 0
    before sqrt, 0.0 on zero denominator, prior shrinkage w·corr with
    PRIOR_COUNT=10, PRIOR_CORRELATION=0 (ref moviesSimilarities.py:≈22).
    NumPy ufuncs over the whole Arrow batch — no per-row Python.
    """
    n = n.astype("float64")
    num = n * sxy - sx * sy
    den = np.sqrt(np.maximum(n * sxx - sx * sx, 0.0)) * np.sqrt(
        np.maximum(n * syy - sy * sy, 0.0)
    )
    corr = np.where(den != 0.0, num / np.where(den != 0.0, den, 1.0), 0.0)
    w = n / (n + PRIOR_COUNT)
    return pd.Series(w * corr + (1.0 - w) * PRIOR_CORRELATION)


def _reg_corr_udf():
    # Built lazily: pandas_udf return-type parsing requires an active
    # SparkSession, which doesn't exist at registry-import time.
    return pandas_udf(_reg_corr_fn, "double")


@register(
    "q_udf_reg_corr",
    oracle=f"""
WITH {RATINGS_ORACLE_CTE}, {_PAIR_STATS_CTE}
SELECT item_x, item_y, n,
       round((n / (n + 10.0)) *
             (CASE WHEN sqrt(greatest(n*sxx - sx*sx, 0)) * sqrt(greatest(n*syy - sy*sy, 0)) <> 0
                   THEN (n*sxy - sx*sy)
                        / (sqrt(greatest(n*sxx - sx*sx, 0)) * sqrt(greatest(n*syy - sy*sy, 0)))
                   ELSE 0.0 END), 6) + 0.0 AS reg_corr
FROM pair_stats
""",
)
def q_udf_reg_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R10 as an Arrow-vectorized pandas_udf with an exact oracle — proves
    the Python escape hatch reproduces engine arithmetic bit-for-bit."""
    stats = pairwise_stats(_cached_ratings(spark, sf_dir))
    return stats.select(
        "item_x",
        "item_y",
        "n",
        (
            F.round(
                _reg_corr_udf()(
                    F.col("n"), F.col("sxy"), F.col("sx"),
                    F.col("sy"), F.col("sxx"), F.col("syy"),
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("reg_corr"),
    )


def _znorm_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Grouped-map kernel: z-score one user's ratings (Arrow batch in,
    Arrow batch out; sample stddev, 0.0 for constant/singleton users —
    the same convention as the SQL oracle)."""
    sd = pdf["rating"].std(ddof=1)
    mu = pdf["rating"].mean()
    if pd.isna(sd) or sd == 0.0:
        z = np.zeros(len(pdf))
    else:
        z = (pdf["rating"] - mu) / sd
    out = pdf[["user_id", "item_id"]].copy()
    out["z"] = np.round(z, 6) + 0.0
    return out


@register(
    "q_udf_znorm_per_user",
    oracle=f"""
WITH {RATINGS_ORACLE_CTE},
stats AS (
    SELECT user_id, avg(rating) AS mu, stddev_samp(rating) AS sd
    FROM ratings GROUP BY user_id
)
SELECT r.user_id, r.item_id,
       round(CASE WHEN sd IS NULL OR sd = 0.0 THEN 0.0
                  ELSE (r.rating - mu) / sd END, 6) + 0.0 AS z
FROM ratings r JOIN stats USING (user_id)
""",
)
def q_udf_znorm_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user rating z-normalization via ``applyInPandas`` — the
    grouped-map UDF surface (SURVEY §2.2.L), exact-oracle-checked: the
    pandas kernel must reproduce the window-function SQL bit-for-bit
    after round-6.  One shuffle on user_id; each group is a small Arrow
    batch (a user's ratings), so executor memory is bounded by the
    biggest user, which the pair-join pruning knob already caps at scale."""
    ratings = _cached_ratings(spark, sf_dir)
    return ratings.groupBy("user_id").applyInPandas(
        _znorm_group, "user_id long, item_id long, z double"
    )
