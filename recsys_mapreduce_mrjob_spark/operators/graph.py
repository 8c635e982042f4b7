"""Iterative graph analytics over relational edge lists.

Third member of the iterative family (with k-means in
:mod:`.embeddings` and connected components in :mod:`.dedup`):
PageRank over the item co-occurrence graph — "centrality" of an item in
the co-consumption network, the classic graph signal a recommender or
curation pipeline derives from the same pair relation the similarity
flagship builds.

Scale pattern shared by all three: per-round work is a join + aggregate
shuffled on the vertex id; the transition matrix is normalized ONCE and
persisted; per-round state (one row per vertex) is
``localCheckpoint``-ed so lineage stays flat no matter how many rounds
run.  Nothing collects edge data to the driver — only scalar counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.readers import RATINGS_ORACLE_CTE
from .recsys import _cached_ratings, item_cooccurrence


def pagerank(
    edges: DataFrame, d: float = 0.85, n_iter: int = 5, scaled: bool = False
) -> DataFrame:
    """Weighted PageRank over directed (src, dst, weight) edges.

    ``pr(v) = (1-d)/N + d * Σ_u pr(u) · w(u,v)/wdeg(u)`` iterated
    ``n_iter`` rounds from the uniform vector.  Assumes no dangling
    nodes (callers pass symmetrized edges, so every node has
    out-degree); total mass then stays 1, which the unit test pins.

    ``scaled=True`` returns ``pr · N`` (mean-relative centrality, ~O(1)
    per node) instead of the raw probability — the numerically robust
    form for cross-engine rounding (see :func:`q_pagerank_exact`).
    """
    wdeg = edges.groupBy("src").agg(F.sum("weight").alias("wdeg"))
    # Normalized transition edges: reused every round — persist once.
    norm = (
        edges.join(wdeg, "src")
        .select("src", "dst", (F.col("weight") / F.col("wdeg")).alias("p"))
        .persist()
    )
    nodes = edges.select(F.col("src").alias("id")).distinct()
    n = nodes.count()
    pr = nodes.select("id", F.lit(1.0 / n).alias("pr"))
    for _ in range(n_iter):
        contribs = norm.join(pr, norm.src == pr.id).select(
            F.col("dst").alias("id"), (F.col("p") * F.col("pr")).alias("c")
        )
        pr = contribs.groupBy("id").agg(
            (F.lit((1.0 - d) / n) + F.lit(d) * F.sum("c")).alias("pr")
        )
        pr = pr.localCheckpoint(eager=True)  # flat lineage per round
    if scaled:
        pr = pr.select("id", (F.col("pr") * F.lit(float(n))).alias("pr"))
    return pr


@register("q_pagerank_items")  # rows-only: iterative fixpoint, not SQL-expressible
def q_pagerank_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank centrality of every item in the co-occurrence graph
    (edge weight = co-rating count, symmetrized, min_support 2) —
    5 rounds, d = 0.85.  Deterministic up to float summation order;
    scores rounded to 8 for stable display.  Mass conservation and
    rank differentiation are pinned by unit tests."""
    pairs = item_cooccurrence(_cached_ratings(spark, sf_dir), min_support=2)
    edges = (
        pairs.select(
            F.col("item_x").alias("src"),
            F.col("item_y").alias("dst"),
            F.col("n_common").cast("double").alias("weight"),
        )
        .unionByName(
            pairs.select(
                F.col("item_y").alias("src"),
                F.col("item_x").alias("dst"),
                F.col("n_common").cast("double").alias("weight"),
            )
        )
    )
    pr = pagerank(edges, d=0.85, n_iter=5)
    return pr.select(
        F.col("id").alias("item_id"),
        (F.round("pr", 8) + F.lit(0.0)).alias("pagerank"),
    )


# ---------------------------------------------------------------------------
# Exact-oracle PageRank (round 5): a FIXED iteration count is just an
# unrolled chain of join+aggregate CTEs, so the "iterative fixpoint, not
# SQL-expressible" caveat on q_pagerank_items only covers convergence-
# -tested loops — the 5-round power iteration itself is fully oracle-
# gradeable.  Float discipline: every literal is written identically on
# both engines ((1.0 - 0.85)/n, NOT 0.15/n — the two differ in the last
# ulp), and the graded score is pr·N (~O(1) per node) rounded to 6, so
# the ~1e-15 cross-engine summation-order noise sits ~8 orders of
# magnitude below the rounding step.
# ---------------------------------------------------------------------------

_PR_D = 0.85
_PR_ITER = 5

_PR_ITER_CTES = ",\n".join(
    f"""pr{k + 1} AS (
    SELECT e.dst AS id,
           (1.0 - {_PR_D}) / (SELECT n FROM nn)
             + {_PR_D} * sum(e.p * p.pr) AS pr
    FROM norm e JOIN pr{k} p ON e.src = p.id GROUP BY e.dst
)"""
    for k in range(_PR_ITER)
)

_PAGERANK_EXACT_ORACLE = f"""
WITH {RATINGS_ORACLE_CTE},
pairs AS MATERIALIZED (
    SELECT a.item_id AS item_x, b.item_id AS item_y, count(*) AS n_common
    FROM ratings a JOIN ratings b
      ON a.user_id = b.user_id AND a.item_id < b.item_id
    GROUP BY a.item_id, b.item_id
    HAVING count(*) >= 2
),
sym AS (
    SELECT item_x AS src, item_y AS dst, CAST(n_common AS DOUBLE) AS w FROM pairs
    UNION ALL
    SELECT item_y AS src, item_x AS dst, CAST(n_common AS DOUBLE) AS w FROM pairs
),
wdeg AS (SELECT src, sum(w) AS wd FROM sym GROUP BY src),
-- MATERIALIZED: the 5 unrolled iterations reference norm once each; an
-- inlining planner would otherwise recompute the ratings pair join per
-- iteration (measured: OOM at sf0.1 under co-tenant memory pressure).
norm AS MATERIALIZED (
    SELECT s.src, s.dst, s.w / d.wd AS p FROM sym s JOIN wdeg d ON d.src = s.src
),
nn AS (SELECT CAST(count(DISTINCT src) AS DOUBLE) AS n FROM norm),
pr0 AS (SELECT DISTINCT src AS id, 1.0 / (SELECT n FROM nn) AS pr FROM norm),
{_PR_ITER_CTES}
SELECT id AS item_id,
       round(pr * (SELECT n FROM nn), 6) + 0.0 AS centrality
FROM pr{_PR_ITER}
"""


@register("q_pagerank_exact", oracle=_PAGERANK_EXACT_ORACLE)
def q_pagerank_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank with a full DuckDB oracle — the exact-graded companion to
    :func:`q_pagerank_items` (see the unrolled-iteration note above).
    Identical engine path (same :func:`pagerank`, same co-occurrence
    edges, d = 0.85, 5 rounds); the only differences are the graded
    output scale (``pr · N``, the mean-relative centrality) and 6-decimal
    rounding.  q_pagerank_items stays the convergence-tested rows-only
    registration."""
    pairs = item_cooccurrence(_cached_ratings(spark, sf_dir), min_support=2)
    edges = pairs.select(
        F.col("item_x").alias("src"),
        F.col("item_y").alias("dst"),
        F.col("n_common").cast("double").alias("weight"),
    ).unionByName(
        pairs.select(
            F.col("item_y").alias("src"),
            F.col("item_x").alias("dst"),
            F.col("n_common").cast("double").alias("weight"),
        )
    )
    pr = pagerank(edges, d=_PR_D, n_iter=_PR_ITER, scaled=True)
    return pr.select(
        F.col("id").alias("item_id"),
        (F.round("pr", 6) + F.lit(0.0)).alias("centrality"),
    )


@register(
    "q_graph_degree_stats",
    oracle=f"""
WITH {RATINGS_ORACLE_CTE},
pairs AS (
    SELECT a.item_id AS item_x, b.item_id AS item_y, count(*) AS n_common
    FROM ratings a JOIN ratings b
      ON a.user_id = b.user_id AND a.item_id < b.item_id
    GROUP BY a.item_id, b.item_id
    HAVING count(*) >= 2
),
sym AS (
    SELECT item_x AS id, n_common FROM pairs
    UNION ALL
    SELECT item_y AS id, n_common FROM pairs
),
deg AS (
    SELECT id, count(*) AS degree,
           CAST(sum(n_common) AS BIGINT) AS wdegree
    FROM sym GROUP BY id
)
SELECT count(*) AS n_nodes,
       CAST(sum(degree) / 2 AS BIGINT) AS n_edges,
       round(avg(degree), 6) + 0.0 AS avg_degree,
       CAST(max(degree) AS BIGINT) AS max_degree,
       round(avg(wdegree), 6) + 0.0 AS avg_wdegree,
       CAST(max(wdegree) AS BIGINT) AS max_wdegree
FROM deg
""",
)
def q_graph_degree_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree/strength profile of the co-occurrence graph — the structural
    health check run before any iterative graph algorithm (a max_degree
    explosion here is the early warning for PageRank/components cost, the
    same signal ``prune_degenerate_users`` caps on the pair side).

    One aggregation over the symmetrized edge list: degree and weighted
    degree per node, then corpus-level stats — never materializes more
    than one row per node past the edge relation the flagship already
    builds.  Exact oracle (counts + round-6 averages).
    """
    edges = item_cooccurrence(_cached_ratings(spark, sf_dir), min_support=2)
    sym = edges.select(F.col("item_x").alias("id"), "n_common").unionAll(
        edges.select(F.col("item_y").alias("id"), "n_common")
    )
    deg = sym.groupBy("id").agg(
        F.count(F.lit(1)).alias("degree"),
        F.sum("n_common").alias("wdegree"),
    )
    return deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        (F.sum("degree") / F.lit(2)).cast("long").alias("n_edges"),
        (F.round(F.avg("degree"), 6) + F.lit(0.0)).alias("avg_degree"),
        F.max("degree").alias("max_degree"),
        (F.round(F.avg("wdegree"), 6) + F.lit(0.0)).alias("avg_wdegree"),
        F.max("wdegree").alias("max_wdegree"),
    )
