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


def pagerank(edges: DataFrame, d: float = 0.85, n_iter: int = 5) -> DataFrame:
    """Weighted PageRank over directed (src, dst, weight) edges.

    ``pr(v) = (1-d)/N + d * Σ_u pr(u) · w(u,v)/wdeg(u)`` iterated
    ``n_iter`` rounds from the uniform vector.  Assumes no dangling
    nodes (callers pass symmetrized edges, so every node has
    out-degree); total mass then stays 1, which the unit test pins.
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
