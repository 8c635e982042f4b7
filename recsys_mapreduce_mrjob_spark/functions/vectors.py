"""Vector (embedding) column expressions via higher-order functions.

Operates on ``array<float>`` columns (the ``embeddings.embedding``
testdata column) entirely JVM-side: ``zip_with`` + ``aggregate`` keep the
dot product / norms inside whole-stage codegen — no Python, no UDF, scales
linearly with partition count.  This is the brute-force baseline path for
similarity search; the LSH-bucketed scale path lives in
``operators/embeddings.py``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ via zip_with + aggregate (JVM higher-order fns).

    Components cast to DOUBLE before multiplying: float32 products
    accumulate visible error over 64 dims and diverge from any engine
    (DuckDB included) that does the math in double.
    """
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    """‖a‖₂."""
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v)
    )


def cosine_sim(a: Column, b: Column) -> Column:
    """cos(a, b) with 0.0 on zero-norm (same convention as
    :func:`..functions.similarity.cosine`)."""
    den = l2_norm(a) * l2_norm(b)
    return F.when(den != 0.0, dot(a, b) / den).otherwise(F.lit(0.0))


def cosine_sim_pre(dot_ab: Column, norm_a: Column, norm_b: Column) -> Column:
    """cos from a precomputed dot product and prehoisted norms.

    Higher-order folds are interpreted per element (no whole-stage codegen
    inside the lambda), so :func:`cosine_sim` pays THREE 64-step folds per
    pair.  When one side of a similarity join is small (a centroid table, a
    single query vector) or a side is reused across many pairs, hoist each
    side's ``l2_norm`` to a column computed once per ROW and fold only the
    dot per PAIR — 3× fewer interpreted steps on the pair hot path,
    bit-identical results (same folds, same order, computed once instead of
    per pair)."""
    den = norm_a * norm_b
    return F.when(den != 0.0, dot_ab / den).otherwise(F.lit(0.0))
