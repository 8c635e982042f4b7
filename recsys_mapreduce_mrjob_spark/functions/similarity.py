"""Scalar similarity metrics as Catalyst column expressions.

Re-expression of the reference's ``metrics.py`` (reconstructed — SURVEY.md
§2.1 R7–R11): correlation, cosine, jaccard, regularized correlation,
normalized correlation.  The reference computed these row-at-a-time in
CPython over sufficient-statistic tuples; here each is a pure column
expression over the aggregate columns ``(n, sxy, sx, sy, sxx, syy)`` so the
whole similarity stage stays inside whole-stage codegen — no Python in the
hot path.

All functions honor the reference's 0.0-on-zero-denominator convention
(metrics.py:≈10–60).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Reference constants (moviesSimilarities.py:≈22, reconstructed).
PRIOR_COUNT = 10.0
PRIOR_CORRELATION = 0.0


def _zero_safe(num: Column, den: Column) -> Column:
    """``num / den`` with the reference's 0.0-on-zero-denominator rule."""
    return F.when(den != 0.0, num / den).otherwise(F.lit(0.0))


def correlation(n: Column, sxy: Column, sx: Column, sy: Column, sxx: Column, syy: Column) -> Column:
    """Pearson correlation from sufficient statistics (ref metrics.py:≈10–25).

    ``(n·Σxy − Σx·Σy) / (√(n·Σx²−(Σx)²) · √(n·Σy²−(Σy)²))``

    The variance terms are mathematically ≥ 0 but can go slightly negative
    in floating point for near-constant rating vectors; clamp at 0 before
    the sqrt so Spark never emits NaN and the DuckDB oracle (which raises
    on sqrt of a negative) encodes the identical convention.
    """
    num = n * sxy - sx * sy
    den = F.sqrt(F.greatest(n * sxx - sx * sx, F.lit(0.0))) * F.sqrt(
        F.greatest(n * syy - sy * sy, F.lit(0.0))
    )
    return _zero_safe(num, den)


def cosine(sxy: Column, sxx: Column, syy: Column) -> Column:
    """Cosine similarity ``Σxy / (‖x‖·‖y‖)`` (ref metrics.py:≈50–60)."""
    den = F.sqrt(sxx) * F.sqrt(syy)
    return _zero_safe(sxy, den)


def jaccard(n_common: Column, n_x: Column, n_y: Column) -> Column:
    """``|A∩B| / |A∪B|`` over rater sets (ref metrics.py:≈28–38).

    The reference's movies job passes a 0.0 placeholder; the vector job
    threads per-item rater counts through the pairs to make it real
    (SURVEY.md §2.1 R9).  The engine always computes the real value.
    """
    den = n_x + n_y - n_common
    return _zero_safe(n_common, den)


def regularized_correlation(
    corr: Column,
    n: Column,
    virtual_count: float = PRIOR_COUNT,
    prior_correlation: float = PRIOR_CORRELATION,
) -> Column:
    """Shrink correlation toward a prior for low-support pairs
    (ref metrics.py:≈62–80): ``w·corr + (1−w)·prior``, ``w = n/(n+virtual)``.
    """
    w = n / (n + F.lit(virtual_count))
    return w * corr + (1.0 - w) * F.lit(prior_correlation)


def normalized_correlation(corr: Column) -> Column:
    """Map correlation into [0, 1] (ref metrics.py:≈40–48): ``(corr+1)/2``."""
    return (corr + 1.0) / 2.0
