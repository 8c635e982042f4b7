"""Scale-hardening knobs and the dedup/ANN ladders at bench scale.

- Degenerate-user pruning (the 100 TB pair-explosion cap) leaves results
  unchanged when no user exceeds the cap, and strictly shrinks the pair
  space when one does.
- MinHash-LSH near-dup finds the 8 planted duplicate texts at sf0.1
  (FIXTURES.md §A) with jaccard 1.0 — recall evidence for the banded join.
- The LSH ANN candidate path ranks a meaningful fraction of the exact
  brute-force top-10 (sanity floor; recall is tunable via bands/bits).
"""

from __future__ import annotations

import pytest

from recsys_mapreduce_mrjob_spark import registry
from recsys_mapreduce_mrjob_spark.operators.recsys import (
    dimsum_cosine,
    pairwise_stats,
    prune_degenerate_users,
    topk_similar_dimsum,
)

registry.load_all()

SF01 = "/root/testdata/sf0.1"


@pytest.fixture()
def tiny_ratings(spark):
    rows = [
        (1, 10, 3.0), (1, 11, 4.0), (1, 12, 5.0),
        (2, 10, 2.0), (2, 11, 1.0),
        (3, 10, 4.0), (3, 11, 5.0),
        # power user rating everything
        (9, 10, 1.0), (9, 11, 2.0), (9, 12, 3.0), (9, 13, 4.0), (9, 14, 5.0),
    ]
    return spark.createDataFrame(rows, "user_id long, item_id long, rating double")


def test_pruning_off_is_identity(tiny_ratings):
    base = {tuple(r) for r in pairwise_stats(tiny_ratings, 1).collect()}
    capped = {
        tuple(r) for r in pairwise_stats(tiny_ratings, 1, max_user_items=100).collect()
    }
    assert base == capped


def test_pruning_drops_power_user_pairs(tiny_ratings):
    pruned = prune_degenerate_users(tiny_ratings, 3)
    assert pruned.where("user_id = 9").count() == 0
    assert pruned.where("user_id != 9").count() == tiny_ratings.where(
        "user_id != 9"
    ).count()
    base_pairs = pairwise_stats(tiny_ratings, 1).count()
    capped_pairs = pairwise_stats(tiny_ratings, 1, max_user_items=3).count()
    assert capped_pairs < base_pairs


def test_minhash_lsh_finds_planted_dupes_sf01(spark):
    """sf0.1 plants 8 exact-duplicate texts (5000 rows, 4992 distinct);
    identical texts collide in every band, so near-dup must surface all of
    them with jaccard 1.0."""
    exact = registry.QUERIES["q_dedup_exact"](spark, SF01)
    dup_groups = exact.where("n_docs > 1").collect()
    assert len(dup_groups) == 8
    near = registry.QUERIES["q_dedup_near"](spark, SF01)
    perfect = {
        (r.doc_a, r.doc_b) for r in near.where("jaccard = 1.0").collect()
    }
    expected = {
        (g.keeper_doc_id, g.max_doc_id) for g in dup_groups
    }
    assert expected <= perfect


def test_als_recommender_is_seeded_deterministic(spark, sf_dir):
    """MLlib ALS with a fixed seed over the derived ratings must refit to
    the identical top-5 set within a session (the rows-only declaration
    leans on this), recommend only unseen items, and cover most users."""
    from recsys_mapreduce_mrjob_spark.caching import memo_unpersist
    from recsys_mapreduce_mrjob_spark.sources.readers import derive_ratings

    first = registry.QUERIES["q_recommend_als"](spark, sf_dir).collect()
    # Drop the round-12 memo so the second call genuinely REFITS the
    # factorization — same-session refit determinism is the property
    # the rows-only declaration leans on, not cache identity.
    memo_unpersist("als_recs")
    second = registry.QUERIES["q_recommend_als"](spark, sf_dir).collect()
    as_set = lambda rows: {(r.user_id, r.item_id, r.pred, r.rank) for r in rows}
    assert as_set(first) == as_set(second)
    assert all(1 <= r.rank <= 5 for r in first)
    seen = {
        (r.user_id, r.item_id)
        for r in derive_ratings(spark, sf_dir).select("user_id", "item_id").collect()
    }
    assert all((r.user_id, r.item_id) not in seen for r in first)
    n_users = derive_ratings(spark, sf_dir).select("user_id").distinct().count()
    assert len({r.user_id for r in first}) >= 0.9 * n_users


def test_blocked_gemm_dedup_matches_allpairs_sf01(spark):
    """The blocked-GEMM q_dedup_embedding (round 4) must reproduce the
    exact all-pairs result at sf0.1 — the SF the oracle parity suite does
    not cover (it runs sf0.001/sf0.01).  Checked against the same
    Catalyst-fold all-pairs formulation the oracle encodes."""
    from pyspark.sql import functions as F
    from recsys_mapreduce_mrjob_spark.functions.vectors import dot, l2_norm
    from recsys_mapreduce_mrjob_spark.sources.readers import load_table

    blocked = {
        (r.vec_a, r.vec_b, r.cos_sim)
        for r in registry.QUERIES["q_dedup_embedding"](spark, SF01).collect()
    }
    emb = load_table(spark, SF01, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    ).withColumn("norm", l2_norm(F.col("v")))
    a, b = emb.alias("a"), emb.alias("b")
    cos = dot(F.col("a.v"), F.col("b.v")) / (F.col("a.norm") * F.col("b.norm"))
    exact = {
        (r.vec_a, r.vec_b, r.cos_sim)
        for r in a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .where(cos >= 0.45)
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            (F.round(cos, 5) + F.lit(0.0)).alias("cos_sim"),
        )
        .collect()
    }
    assert blocked == exact
    assert len(blocked) > 0

    # ADVICE r4: the ≥1.8e-8 margin to the .xxxxx5 round-to-5 boundary is
    # an empirical property of THIS testdata — GEMM-order vs fold-order
    # float noise (~1e-16) only stays invisible while it holds.  Assert a
    # floor on both margins so a regenerated dataset that collapses them
    # fails HERE, loudly, instead of as an opaque driver hash-FAIL.
    pairs = a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
    thr_margin = (
        pairs.where(cos >= 0.4)  # near-threshold pairs on BOTH sides of the cut
        .select(F.min(F.abs(cos - F.lit(0.45))).alias("m"))
        .first()["m"]
    )
    round_margin_e5 = (
        pairs.where(cos >= 0.45)  # only emitted pairs get rounded
        .select(
            F.min(
                F.abs((cos * 1e5) - F.floor(cos * 1e5) - F.lit(0.5))
            ).alias("m")
        )
        .first()["m"]
    )
    assert thr_margin > 1e-6, thr_margin
    assert round_margin_e5 > 1e-4, round_margin_e5  # ≥1e-9 on raw cos


def test_pairwise_gemm_matches_join_and_is_block_invariant(spark, sf_dir):
    """The blocked sparse-Gram pair stage (round 5) must reproduce the
    relational self-join's relation exactly in keys/counts and to float
    precision in the sums, at TWO block counts (results are B-invariant:
    every unordered pair lands in exactly one tile for any B), with the
    in-kernel rater counts equal to :func:`item_rater_counts`."""
    from recsys_mapreduce_mrjob_spark.operators.recsys import (
        _cached_ratings,
        item_rater_counts,
        pairwise_stats_gemm,
    )

    r = _cached_ratings(spark, sf_dir)
    base = {
        (x.item_x, x.item_y): x for x in pairwise_stats(r, 2).collect()
    }
    raters = {x.item_id: x.n_raters for x in item_rater_counts(r).collect()}
    for nb in (4, 7):
        got = pairwise_stats_gemm(
            r, 2, n_blocks=nb, with_rater_counts=True
        ).collect()
        assert len(got) == len(base), (nb, len(got), len(base))
        for g in got:
            b = base[(g.item_x, g.item_y)]
            assert g.n == b.n, (nb, g, b)
            for c in ("sxy", "sx", "sy", "sxx", "syy"):
                assert abs(g[c] - b[c]) <= 1e-9 * max(abs(b[c]), 1.0), (nb, g, b)
            assert g.nx == raters[g.item_x] and g.ny == raters[g.item_y], g


def test_counts_only_gemm_matches_join(spark, sf_dir):
    """The counts_only kernel form (round 10: no rating column in the
    replicate shuffle, no gram bincounts) must emit exactly the
    relational co-occurrence relation, on BOTH its input shapes — the
    fused pre_aggregate raw path and the pre-aggregated ratings path —
    and refuse the with_rater_counts combination."""
    import pytest as _pytest

    from recsys_mapreduce_mrjob_spark.operators.recsys import (
        _cached_ratings,
        item_cooccurrence,
        pairwise_stats_gemm,
        raw_ratings,
    )

    expected = {
        (r.item_x, r.item_y): r.n_common
        for r in item_cooccurrence(_cached_ratings(spark, sf_dir), 3).collect()
    }
    fused = {
        (r.item_x, r.item_y): r.n
        for r in pairwise_stats_gemm(
            raw_ratings(spark, sf_dir), 3, pre_aggregate=True, counts_only=True
        ).collect()
    }
    assert fused == expected
    plain = {
        (r.item_x, r.item_y): r.n
        for r in pairwise_stats_gemm(
            _cached_ratings(spark, sf_dir), 3, counts_only=True
        ).collect()
    }
    assert plain == expected
    with _pytest.raises(ValueError, match="mutually exclusive"):
        pairwise_stats_gemm(
            _cached_ratings(spark, sf_dir),
            3,
            counts_only=True,
            with_rater_counts=True,
        )


def test_flagship_fused_matches_relational(spark, sf_dir):
    """The registered flagship (derivation + rater counts fused into the
    GEMM kernel, exact integer HALF_UP rounding) must return the
    IDENTICAL rounded relation as the relational fallback — full row
    equality, not approximate."""
    from recsys_mapreduce_mrjob_spark.operators.recsys import (
        _cached_ratings,
        topk_similar_items,
    )

    want = sorted(
        map(tuple, topk_similar_items(_cached_ratings(spark, sf_dir), 10).collect())
    )
    got = sorted(
        map(tuple, registry.QUERIES["q_topk_similar_items"](spark, sf_dir).collect())
    )
    assert want == got


def test_gemm_block_count_scales_with_rows():
    """B must grow once the two-block tile would exceed the target, and
    never fall below the operator floor."""
    from recsys_mapreduce_mrjob_spark.functions.blocking import (
        TARGET_TILE_BYTES,
        gemm_block_count,
    )

    assert gemm_block_count(0, 32) == 4
    assert gemm_block_count(600_000, 32) == 4  # sf0.1 stays at the floor
    big = gemm_block_count(10_000_000_000, 32, floor=4)
    assert big > 4
    assert 2 * 10_000_000_000 * 32 / big <= TARGET_TILE_BYTES
    assert gemm_block_count(10, 32, floor=8) == 8


def test_lsh_ann_overlaps_exact_topk(spark, sf_dir):
    exact = [r.vec_id for r in registry.QUERIES["q_knn_cosine"](spark, sf_dir).collect()]
    approx = [
        r.vec_id for r in registry.QUERIES["q_knn_cosine_lsh"](spark, sf_dir).collect()
    ]
    assert approx, "LSH ANN returned no candidates"
    # Sanity floor: sign-LSH with 4 bands of 4 bits should recover a
    # meaningful share of the true top-10 on 500 unit-ish vectors.
    assert len(set(exact) & set(approx)) >= 3


def test_simhash_finds_planted_dupes_sf01(spark):
    """Identical texts must land at Hamming distance 0; all 8 planted
    sf0.1 duplicate pairs surface through the chunk-band candidate join."""
    exact = registry.QUERIES["q_dedup_exact"](spark, SF01)
    expected = {
        (g.keeper_doc_id, g.max_doc_id)
        for g in exact.where("n_docs > 1").collect()
    }
    sim = registry.QUERIES["q_dedup_simhash"](spark, SF01)
    zero = {(r.doc_a, r.doc_b) for r in sim.where("hamming = 0").collect()}
    assert expected <= zero


def test_kmeans_converges_monotonically(spark, sf_dir):
    """Lloyd's algorithm must not increase total within-cluster SSE from
    one iteration to the next (deterministic init → exact reproducibility)."""
    from recsys_mapreduce_mrjob_spark.operators.embeddings import kmeans
    from recsys_mapreduce_mrjob_spark.sources.readers import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    sses = []
    for it in range(4):
        out = kmeans(emb, k=8, n_iter=it)
        sses.append(out.agg({"dist2": "sum"}).collect()[0][0])
    assert all(b <= a * (1 + 1e-9) for a, b in zip(sses, sses[1:])), sses
    clusters = kmeans(emb, k=8, n_iter=3).select("cluster").distinct().count()
    assert 2 <= clusters <= 8


def test_dimsum_infinite_gamma_is_exact_cosine(tiny_ratings):
    """With γ=∞ every keep-probability is 1 and min(γ,‖x‖‖y‖)=‖x‖‖y‖, so
    the DIMSUM estimate must equal the exact FULL-NORM matrix cosine
    Σxy/(‖x‖·‖y‖) to float precision.  (Distinct from the reference's
    co-rater cosine in ``item_similarity``, whose norms are restricted to
    co-rating users — DIMSUM estimates the AᵀA Gramian.)"""
    rows = tiny_ratings.collect()
    import math
    from collections import defaultdict

    by_item = defaultdict(dict)
    for r in rows:
        by_item[r.item_id][r.user_id] = r.rating
    items = sorted(by_item)
    exact = {}
    for i, x in enumerate(items):
        for y in items[i + 1 :]:
            sxy = sum(
                v * by_item[y][u] for u, v in by_item[x].items() if u in by_item[y]
            )
            if not sxy:
                continue
            nx = math.sqrt(sum(v * v for v in by_item[x].values()))
            ny = math.sqrt(sum(v * v for v in by_item[y].values()))
            exact[(x, y)] = sxy / (nx * ny)
    est = {
        (r.item_x, r.item_y): r.cos_est
        for r in dimsum_cosine(tiny_ratings, gamma=1e18).collect()
    }
    assert set(exact) == set(est)
    for pair, cos in exact.items():
        assert abs(est[pair] - cos) < 1e-6, (pair, est[pair], cos)


def test_dimsum_sampled_gamma_error_profile(spark, sf_dir):
    """At a γ that actually samples (keep-prob < 1 for most pairs):
    (a) every un-sampled pair (‖x‖‖y‖ ≤ γ → p=1) is error-free,
    (b) mean |error| over surviving pairs stays small (estimator
        concentration), and
    (c) the sampled per-item top-10 overlaps the exact (γ=∞) top-10 well
        above chance.
    The overlap floor is deliberately modest: the derived-ratings data has
    MEDIAN per-pair support 1 at sf0.01, so near-tied cosines reorder
    under any sampling — the knob's value at scale is the proportional
    pair-shuffle reduction, with ranking fidelity growing with support
    (measured here: γ=15000 ⇒ keep-prob ≈0.6, overlap ≈0.47, MAE ≈0.02,
    2.9k exactly-kept pairs all error-free)."""
    from pyspark.sql import functions as F

    ratings = (
        registry.QUERIES["q_ratings_matrix"](spark, sf_dir)
        .select("user_id", "item_id", "rating")
        .cache()
    )
    gamma = 15000.0
    est = dimsum_cosine(ratings, gamma=gamma).cache()
    exact = dimsum_cosine(ratings, gamma=1e18).cache()  # p=1 everywhere

    joined = est.join(
        exact.select("item_x", "item_y", F.col("cos_est").alias("cos_true")),
        ["item_x", "item_y"],
    ).cache()

    # (a) zero sampling error on the un-sampled (p=1) pairs
    norms = ratings.groupBy("item_id").agg(
        F.sqrt(F.sum(F.col("rating") * F.col("rating"))).alias("norm")
    )
    unsampled = (
        joined.join(
            norms.select(F.col("item_id").alias("item_x"), F.col("norm").alias("nx")),
            "item_x",
        )
        .join(
            norms.select(F.col("item_id").alias("item_y"), F.col("norm").alias("ny")),
            "item_y",
        )
        .where(F.col("nx") * F.col("ny") <= gamma)
    )
    n_unsampled = unsampled.count()
    bad = unsampled.where(F.abs(F.col("cos_est") - F.col("cos_true")) > 1e-6).count()
    assert n_unsampled > 0
    assert bad == 0

    # (b) estimator concentration
    mae = joined.select(
        F.avg(F.abs(F.col("cos_est") - F.col("cos_true")))
    ).first()[0]
    assert mae < 0.05, mae

    # (c) top-K overlap above chance
    exact_topk = topk_similar_dimsum(ratings, k=10, gamma=1e18).select(
        "item_x", "item_y"
    )
    approx_topk = topk_similar_dimsum(ratings, k=10, gamma=gamma).select(
        "item_x", "item_y"
    )
    n_exact = exact_topk.count()
    n_hit = exact_topk.intersect(approx_topk).count()
    assert n_exact > 0
    overlap = n_hit / n_exact
    assert overlap >= 0.35, f"top-K overlap {overlap:.2f} below floor"
    ratings.unpersist()
    est.unpersist()
    exact.unpersist()
    joined.unpersist()


def _union_find_labels(n_vertices, edges):
    parent = list(range(n_vertices))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component label = min member id
    labels = {}
    for v in range(n_vertices):
        r = find(v)
        labels.setdefault(r, min(labels.get(r, v), v))
    return {v: labels[find(v)] for v in range(n_vertices)}


@pytest.mark.parametrize(
    "n,edges",
    [
        # long path: diameter 39 — min-label prop would need 39 rounds,
        # two-star closes it in O(log² n) alternations to its fixpoint
        (40, [(i, i + 1) for i in range(39)]),
        # two cliques bridged + isolated vertices + self-loop noise
        (12, [(0, 1), (1, 2), (0, 2), (5, 6), (6, 7), (2, 5), (9, 9)]),
        # star + disjoint pair, reversed orientations
        (8, [(4, 0), (5, 0), (6, 0), (7, 6), (2, 1)]),
        # empty graph
        (5, []),
    ],
)
def test_twostar_components_match_union_find(spark, n, edges):
    """connected_components_twostar converges to the exact union-find
    labels within its fixed alternation budget — including on a path
    graph whose diameter far exceeds the round count, the case where
    plain min-label propagation would still be mid-flight."""
    from recsys_mapreduce_mrjob_spark.operators.dedup import (
        connected_components,
        connected_components_twostar,
    )

    vertices = spark.createDataFrame([(i,) for i in range(n)], "id long")
    edges_df = spark.createDataFrame(
        edges or [(0, 0)], "src long, dst long"
    )
    if not edges:
        edges_df = edges_df.where("src != src")  # genuinely empty
    expected = _union_find_labels(n, edges)
    got = {
        r.id: r.label
        for r in connected_components_twostar(vertices, edges_df).collect()
    }
    assert got == expected
    # on small-diameter graphs both backends agree (path graph excluded:
    # label-prop's 10 rounds can't close a 39-hop chain — that gap is the
    # point of two-star)
    if n != 40:
        lp = {
            r.id: r.label
            for r in connected_components(vertices, edges_df, max_iter=10).collect()
        }
        assert lp == expected


def test_twostar_runs_to_fixpoint_on_long_path(spark):
    """ADVICE r5 regression: a fixed 6-round budget silently mislabeled
    1935/2000 vertices of a 2000-node path graph.  The loop now iterates
    until the edge set reaches its fixpoint (one round rewires nothing),
    so every vertex of the single path component must carry label 0."""
    from pyspark.sql import functions as F

    from recsys_mapreduce_mrjob_spark.operators.dedup import (
        connected_components_twostar,
    )

    n = 2000
    vertices = spark.range(n).select(F.col("id"))
    edges = spark.range(n - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    labels = connected_components_twostar(vertices, edges).collect()
    assert len(labels) == n
    assert all(r.label == 0 for r in labels)


def test_twostar_exhausted_cap_raises_not_silent(spark):
    """The safety cap must RAISE when exhausted pre-fixpoint — never
    return non-converged labels (the r5 silent-wrong failure mode)."""
    from pyspark.sql import functions as F

    from recsys_mapreduce_mrjob_spark.operators.dedup import (
        connected_components_twostar,
    )

    vertices = spark.range(64).select(F.col("id"))
    edges = spark.range(63).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    with pytest.raises(RuntimeError, match="no fixpoint"):
        connected_components_twostar(vertices, edges, max_rounds=1)


def test_dedup_components_cluster_planted_dupes_sf01(spark):
    """Every planted sf0.1 duplicate pair must land in the same component
    with the keeper (min doc_id) as the component id."""
    exact = registry.QUERIES["q_dedup_exact"](spark, SF01)
    dup_groups = exact.where("n_docs > 1").collect()
    comp = {
        r.doc_id: r.component_id
        for r in registry.QUERIES["q_dedup_components"](spark, SF01).collect()
    }
    for g in dup_groups:
        assert comp.get(g.keeper_doc_id) == comp.get(g.max_doc_id), g
        assert comp.get(g.keeper_doc_id) is not None


def test_ivf_ann_recall_vs_exact_topk(spark, sf_dir):
    """IVF with K=16 cells / nprobe=4 recovers most of the exact top-10
    (measured: 10/10 at sf0.01 — the true neighbors concentrate in the
    probed cells; floor kept conservative against re-generated data)."""
    exact = [r.vec_id for r in registry.QUERIES["q_knn_cosine"](spark, sf_dir).collect()]
    approx = [
        r.vec_id for r in registry.QUERIES["q_knn_cosine_ivf"](spark, sf_dir).collect()
    ]
    assert approx, "IVF ANN returned no candidates"
    assert len(set(exact) & set(approx)) >= 6


def test_pagerank_mass_conserved_and_differentiated(spark, sf_dir):
    """Symmetrized co-occurrence graph has no dangling nodes, so total
    PageRank mass must stay 1.0 through the iterations; and 5 rounds on
    a non-regular graph must separate the ranks (max > uniform)."""
    pr = registry.QUERIES["q_pagerank_items"](spark, sf_dir)
    rows = pr.collect()
    n = len(rows)
    total = sum(r.pagerank for r in rows)
    assert abs(total - 1.0) < 1e-4, total
    assert max(r.pagerank for r in rows) > 1.5 / n


def test_winnowing_guarantee_on_planted_overlaps(spark):
    """The winnowing theorem (Schleimer et al. 2003): any shared substring
    of length >= k + w - 1 (here 23) chars must leave at least one common
    fingerprint in both documents.  Planted-overlap fixture: doc pairs
    sharing a passage well over the threshold must collide; a pair of
    disjoint random-alphabet docs must not."""
    import random

    from recsys_mapreduce_mrjob_spark.operators.text import winnow_fingerprints

    rng = random.Random(7)

    def rand_text(n, alphabet="abcdefghij "):
        return "".join(rng.choice(alphabet) for _ in range(n))

    shared = rand_text(60)  # >> k + w - 1 = 23
    docs = [
        (0, rand_text(80) + shared + rand_text(90)),
        (1, rand_text(120) + shared + rand_text(40)),
        # disjoint alphabets -> no 16-gram can coincide
        (2, "".join(rng.choice("klmnopqrst ") for _ in range(200))),
        (3, "".join(rng.choice("uvwxyz0123 ") for _ in range(200))),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    fps = winnow_fingerprints(df)
    a = {r.fp for r in fps.where("doc_id = 0").collect()}
    b = {r.fp for r in fps.where("doc_id = 1").collect()}
    c = {r.fp for r in fps.where("doc_id = 2").collect()}
    d = {r.fp for r in fps.where("doc_id = 3").collect()}
    assert a & b, "planted 60-char overlap left no common fingerprint"
    assert not (c & d), "disjoint-alphabet docs shared a fingerprint"


def test_observe_metrics_ride_the_flagship_pass(spark, sf_dir):
    """Operational accounting via ``Observation``: row count and mean
    rating are collected DURING the ratings derivation pass — at 100 TB
    you can't afford a second scan just to know what you processed."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F
    from recsys_mapreduce_mrjob_spark.sources.readers import derive_ratings

    obs = Observation("ratings_obs")
    ratings = derive_ratings(spark, sf_dir).observe(
        obs,
        F.count(F.lit(1)).alias("n_ratings"),
        F.round(F.avg("rating"), 6).alias("avg_rating"),
    )
    n = ratings.count()
    got = obs.get
    assert got["n_ratings"] == n
    assert 0 < got["avg_rating"] < 60


def test_countmin_never_underestimates(spark, sf_dir):
    """The Count-Min guarantee: a point estimate is min over d buckets
    each >= the true count, so estimate >= truth for every probe token
    (equality when no collision landed in all 4 rows)."""
    rows = registry.QUERIES["q_sketch_countmin"](spark, sf_dir).collect()
    assert rows, "no probe estimates returned"
    for r in rows:
        assert r.cms_estimate >= r.true_count, r


def test_quantize_rmse_within_theoretical_bound(spark, sf_dir):
    """Symmetric int8 quantization error is at most half a quantization
    step per component: |x − deq(x)| ≤ 0.5·(amax/127), so per-vector RMSE
    ≤ amax/254 — and therefore per-label max_rmse ≤ avg_amax·(1/254)·
    (1 + tolerance for amax spread within the label).  Check the hard
    per-row bound directly instead: recompute per-vector RMSE and compare
    against that vector's own amax/254."""
    from pyspark.sql import functions as F
    from recsys_mapreduce_mrjob_spark.functions.vectors import dot
    from recsys_mapreduce_mrjob_spark.sources.readers import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    v = F.transform("embedding", lambda x: x.cast("double"))
    prep = emb.select(v.alias("v")).withColumn(
        "amax", F.array_max(F.transform("v", lambda x: F.abs(x)))
    )
    scale = F.lit(127.0) / F.col("amax")
    errvec = F.transform("v", lambda x: x - F.floor(x * scale + F.lit(0.5)) / scale)
    rmse = F.sqrt(dot(errvec, errvec) / F.size("v"))
    bad = prep.where(F.col("amax") > 0).where(
        rmse > F.col("amax") / F.lit(254.0) * F.lit(1.0 + 1e-9)
    )
    assert bad.count() == 0


def test_unigram_lm_scores_are_log_probabilities(spark, sf_dir):
    """Every per-lang average log-probability is strictly negative (no
    token has probability 1 in a multi-token corpus) and the worst doc is
    never better than the language average."""
    rows = registry.QUERIES["q_text_unigram_lm"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.lang_avg_logp < 0, r
        assert r.worst_doc_logp <= r.lang_avg_logp, r


def test_degree_stats_consistent_with_edge_list(spark, sf_dir):
    """n_edges equals the pair count of the same (min_support=2)
    co-occurrence relation, and handshake arithmetic holds:
    avg_degree·n_nodes = 2·n_edges (within the round-6 display
    tolerance)."""
    from recsys_mapreduce_mrjob_spark.operators.recsys import (
        _cached_ratings,
        item_cooccurrence,
    )

    stats = registry.QUERIES["q_graph_degree_stats"](spark, sf_dir).collect()[0]
    n_pairs = item_cooccurrence(
        _cached_ratings(spark, sf_dir), min_support=2
    ).count()
    assert stats.n_edges == n_pairs
    assert abs(stats.avg_degree * stats.n_nodes - 2 * stats.n_edges) < 1e-2


def test_triangles_match_bruteforce_and_handshake(spark, smoke_dir):
    """The degree-oriented wedge closure counts exactly the triangles an
    independent adjacency-set brute force finds (per node, not just in
    total — orientation bugs typically miscredit vertices while keeping
    the global count plausible), and the clustering coefficient obeys
    its bounds: 0 ≤ c ≤ 1, with c = 0 forced wherever degree < 2 or no
    triangle exists."""
    from recsys_mapreduce_mrjob_spark.operators.graph import _TRI_MIN_SUPPORT
    from recsys_mapreduce_mrjob_spark.operators.recsys import (
        _cached_ratings,
        item_cooccurrence,
    )

    edges = [
        (r.item_x, r.item_y)
        for r in item_cooccurrence(
            _cached_ratings(spark, smoke_dir), min_support=_TRI_MIN_SUPPORT
        ).collect()
    ]
    assert edges, "smoke graph is empty — the test would pass vacuously"
    adj: dict[int, set[int]] = {}
    for x, y in edges:
        adj.setdefault(x, set()).add(y)
        adj.setdefault(y, set()).add(x)
    # A triangle {a,b,c} is seen once per edge, at the opposite vertex —
    # (a,b) credits c, (a,c) credits b, (b,c) credits a — so this tally
    # IS the per-vertex triangle count.
    expected = {v: 0 for v in adj}
    for x, y in edges:
        for z in adj[x] & adj[y]:
            expected[z] += 1
    rows = registry.QUERIES["q_graph_triangles"](spark, smoke_dir).collect()
    got = {r.item_id: r.n_triangles for r in rows}
    assert got == expected
    for r in rows:
        assert len(adj[r.item_id]) == r.degree
        assert 0.0 <= r.clustering <= 1.0, r
        if r.degree < 2 or r.n_triangles == 0:
            assert r.clustering == 0.0, r


def test_anomaly_alerts_exceed_threshold(spark, sf_dir):
    """Every emitted alert satisfies the |z| ≥ 2.5 contract, and alerts
    are a small fraction of the bucket space (an alarm that fires on
    >10% of hours is a broken detector, not an anomaly signal)."""
    alerts = registry.QUERIES["q_events_anomaly"](spark, sf_dir).collect()
    for r in alerts:
        assert abs(r.zscore) >= 2.5 - 1e-4, r
    from pyspark.sql import functions as F
    from recsys_mapreduce_mrjob_spark.sources.readers import load_events

    e = load_events(spark, sf_dir)
    n_buckets = (
        e.groupBy(F.window("ts", "1 hour"), "event_type").count().count()
    )
    assert len(alerts) <= max(1, n_buckets // 10)


def test_als_heldout_rmse_within_constant_baseline_factor(spark, sf_dir):
    """Held-out quality gate for the rows-only ALS recommender (VERDICT
    r4 #8): train on a hash split of the derived ratings, evaluate RMSE
    on the held-out 10%.  The derived TPC-H-ish ratings carry no
    learnable low-rank structure, so no factorization beats the constant
    global-mean predictor here (round-5 sweep: best 1.08×, the old
    reg=0.1 overfit to 1.51×) — the guarantee worth pinning is that the
    registered hyperparameters GENERALIZE: within 1.15× of the constant
    baseline, i.e. regularization keeps the model sane on structureless
    data instead of memorizing noise."""
    from pyspark.ml.recommendation import ALS
    from pyspark.sql import functions as F

    from recsys_mapreduce_mrjob_spark.sources.readers import derive_ratings

    ratings = derive_ratings(spark, sf_dir)
    is_test = F.pmod(F.xxhash64("user_id", "item_id"), F.lit(10)) == 9
    train = ratings.where(~is_test)
    test = ratings.where(is_test)

    # Same hyperparameters as q_recommend_als (recsys.py).
    model = ALS(
        rank=8,
        maxIter=10,
        regParam=5.0,
        seed=42,
        userCol="user_id",
        itemCol="item_id",
        ratingCol="rating",
        coldStartStrategy="drop",
    ).fit(train)
    rmse = (
        model.transform(test)
        .select(
            F.sqrt(F.avg((F.col("prediction") - F.col("rating")) ** 2)).alias("x")
        )
        .first()["x"]
    )
    mean = train.select(F.avg("rating")).first()[0]
    baseline = test.select(
        F.sqrt(F.avg((F.lit(mean) - F.col("rating")) ** 2)).alias("x")
    ).first()["x"]
    assert rmse <= 1.15 * baseline, (rmse, baseline)


def test_knn_kernel_matches_fold_with_margins(spark):
    """The Arrow GEMV q_knn_cosine (round 5) must reproduce the Catalyst
    fold formulation exactly at sf0.1 — same contract as the GEMM dedup:
    rounded-score equality plus an explicit floor on the distance to the
    round-to-5 boundary, so a regenerated dataset that collapses the
    float margin fails HERE instead of as an opaque driver hash-FAIL."""
    from pyspark.sql import functions as F
    from recsys_mapreduce_mrjob_spark.functions.vectors import dot, l2_norm
    from recsys_mapreduce_mrjob_spark.operators.embeddings import (
        knn_cosine_fold,
        knn_cosine_kernel,
    )
    from recsys_mapreduce_mrjob_spark.sources.readers import load_table

    # Force the kernel path (the registered query dispatches to the fold
    # below _KNN_KERNEL_MIN_ROWS, so the bench corpus never exercises it).
    kernel = [
        (r.vec_id, r.label, r.cos_sim)
        for r in knn_cosine_kernel(spark, SF01).collect()
    ]
    fold = [
        (r.vec_id, r.label, r.cos_sim)
        for r in knn_cosine_fold(spark, SF01).collect()
    ]
    assert kernel == fold
    assert len(kernel) == 10

    # Margin floor over the WHOLE corpus (top-k membership depends on
    # every row's rounded score, not just the winners').
    emb = load_table(spark, SF01, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    q = F.broadcast(
        emb.where(F.col("vec_id") == 0)
        .select(F.col("v").alias("qv"))
        .withColumn("qn", l2_norm(F.col("qv")))
    )
    cos = dot(F.col("v"), F.col("qv")) / (l2_norm(F.col("v")) * F.col("qn"))
    margin = (
        emb.where(F.col("vec_id") != 0)
        .join(q)
        .select(
            F.min(
                F.abs((cos * 1e5) - F.floor(cos * 1e5) - F.lit(0.5))
            ).alias("m")
        )
        .first()["m"]
    )
    assert margin > 1e-4, margin  # ≥1e-9 on the raw cosine


def test_exact_twin_rounding_margins(spark):
    """The round-5 float-sensitive exact twins (pagerank, k-means, DIMSUM)
    grade rounded doubles whose cross-engine noise is ~1e-15; like the
    GEMM dedup margin test above, assert the testdata keeps a wide berth
    to every rounding boundary so a regenerated dataset that collapses a
    margin fails HERE, loudly, not as an opaque driver hash-FAIL."""
    from pyspark.sql import functions as F

    def min_boundary_margin(df, col, scale):
        """Distance of col·scale to the nearest .5 (the round() decision
        boundary), minimized over the relation."""
        x = F.col(col) * F.lit(float(scale))
        return df.select(
            F.min(F.abs(x - F.floor(x) - F.lit(0.5))).alias("m")
        ).first()["m"]

    # PageRank: graded value is round(pr·N, 6) — re-derive the unrounded
    # pr·N and check its 1e6-scaled distance to the boundary.
    from recsys_mapreduce_mrjob_spark.operators.graph import (
        _PR_D,
        _PR_ITER,
        pagerank,
    )
    from recsys_mapreduce_mrjob_spark.operators.recsys import (
        _cached_ratings,
        item_cooccurrence,
    )

    pairs = item_cooccurrence(_cached_ratings(spark, SF01), min_support=2)
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
    m_pr = min_boundary_margin(pr, "pr", 1e6)
    # Floor calibrated empirically: the MEASURED max Spark-vs-DuckDB
    # delta on unrounded pr·N at sf0.1 is 2.2e-15 (20k nodes, this
    # session); the sf0.1 data margin is 5.7e-12.  1e-6 scaled = 1e-12
    # raw keeps a ≥450× berth over measured noise.
    assert m_pr > 1e-6, m_pr

    # k-means: the DISCRETE assignment ranks on round(d2, 6).  Check the
    # raw squared distances of the GRADED trajectory (rounded=True — the
    # rounded and raw trajectories can diverge, so measuring the raw one
    # would guard centroids the graded query never produces), over ALL
    # (vector, centroid) candidates of the final model: any candidate
    # near a boundary could flip its rounded value and hence the argmin.
    # Earlier iterations' margins are evidenced by the 3-SF oracle
    # parity; the final model decides every graded output row.
    from recsys_mapreduce_mrjob_spark.operators.embeddings import (
        _KMX_ITER,
        _KMX_K,
        _dist2_to,
        kmeans,
    )
    from recsys_mapreduce_mrjob_spark.sources.readers import load_table

    emb = load_table(spark, SF01, "embeddings")
    _, cents = kmeans(
        emb, k=_KMX_K, n_iter=_KMX_ITER, rounded=True, return_model=True
    )
    all_d2 = emb.select(
        F.explode(
            F.array(*[_dist2_to(c, F.col("embedding")) for c in cents])
        ).alias("d2")
    )
    m_km = min_boundary_margin(all_d2, "d2", 1e6)
    assert m_km > 1e-5, m_km  # ≥1e-11 margin on the raw d2

    # DIMSUM: the keep decision compares the 1e-6-granular portable
    # uniform against p = γ/(‖x‖·‖y‖); a cross-engine flip needs
    # |u − p| within float noise of 0.  Assert the minimum gap over all
    # sampled pairs (p < 1 side only — p ≥ 1 keeps everything).
    from recsys_mapreduce_mrjob_spark.operators.recsys import (
        _DIMX_GAMMA,
        _DIMX_SEED,
    )

    ratings = _cached_ratings(spark, SF01)
    norms = ratings.groupBy("item_id").agg(
        F.sqrt(F.sum(F.col("rating") * F.col("rating"))).alias("norm")
    )
    r = ratings.join(norms, "item_id")
    a = r.select(
        "user_id",
        F.col("item_id").alias("item_x"),
        F.col("rating").alias("rx"),
        F.col("norm").alias("nx"),
    )
    b = r.select(
        "user_id",
        F.col("item_id").alias("item_y"),
        F.col("rating").alias("ry"),
        F.col("norm").alias("ny"),
    )
    pr_pairs = a.join(b, "user_id").where(F.col("item_x") < F.col("item_y"))
    p_keep = F.lit(_DIMX_GAMMA) / (F.col("nx") * F.col("ny"))
    u = (
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            ":",
                            F.col("user_id"),
                            F.col("item_x"),
                            F.col("item_y"),
                            F.lit(str(_DIMX_SEED)),
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long"),
            F.lit(1_000_000),
        ).cast("double")
        / 1e6
    )
    m_dx = (
        pr_pairs.where(p_keep < 1.0)
        .select(F.min(F.abs(u - p_keep)).alias("m"))
        .first()["m"]
    )
    assert m_dx is None or m_dx > 1e-9, m_dx

    # ...and the GRADED value's own rounding boundary: cos_est =
    # round(Σ rx·ry / denom, 6) over the kept sample — the sum's
    # cross-engine accumulation-order noise (~1e-13 relative) must sit
    # far below the 1e-6 step for every emitted pair.
    denom = F.least(F.lit(_DIMX_GAMMA), F.col("nx") * F.col("ny"))
    est_raw = (
        pr_pairs.where(u < F.least(F.lit(1.0), p_keep))
        .groupBy("item_x", "item_y")
        .agg((F.sum(F.col("rx") * F.col("ry")) / F.min(denom)).alias("cos_raw"))
    )
    # Floor calibrated empirically: the MEASURED Spark-vs-DuckDB delta on
    # the unrounded estimates at sf0.1 is exactly 0.0 over all 7.6M
    # sampled pairs (few-term sums of identical doubles are
    # order-insensitive); the sf0.1 data margin is 1.9e-11.  1e-5 scaled
    # = 1e-11 raw — any nonzero cross-engine noise appearing on
    # regenerated data trips this alarm long before a hash-FAIL.
    m_ce = min_boundary_margin(est_raw, "cos_raw", 1e6)
    assert m_ce > 1e-5, m_ce


def test_bloom_prefilter_is_selective_and_lossless(spark, sf_dir):
    """q_join_bloom's bucket-set digest must actually FILTER (the scale
    payoff is fact rows kept out of the join shuffle) while never
    dropping a true match (zero false negatives by construction: a
    matching key hashes to an occupied bucket)."""
    from pyspark.sql import functions as F

    from recsys_mapreduce_mrjob_spark.operators.relational import (
        _BLOOM_BUCKETS,
    )
    from recsys_mapreduce_mrjob_spark.sources.readers import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    dim = (
        load_table(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_orderstatus") == "F")
        )
        .select("o_orderkey")
    )
    buckets = F.broadcast(
        dim.select(
            F.pmod(F.xxhash64("o_orderkey"), F.lit(_BLOOM_BUCKETS)).alias("bkt")
        ).distinct()
    )
    pre = (
        li.withColumn(
            "bkt", F.pmod(F.xxhash64("l_orderkey"), F.lit(_BLOOM_BUCKETS))
        )
        .join(buckets, "bkt", "left_semi")
        .count()
    )
    true_semi = li.join(
        dim, li.l_orderkey == dim.o_orderkey, "left_semi"
    ).count()
    total = li.count()
    assert true_semi <= pre, "bloom prefilter dropped a true match"
    # The digest must remove the bulk of the non-matching fact side —
    # the dim predicate keeps ~7% of orders, so FP-rate ≈ occupied/65536
    # stays small at test scale.
    assert pre < 0.5 * total, (pre, total)


def test_skew_profile_flags_the_hot_keys(spark, sf_dir):
    """The diagnostic's top key must be genuinely skewed (factor > 1)
    and shares must be consistent with the relation size."""
    rows = registry.QUERIES["q_skew_profile"](spark, sf_dir).collect()
    assert len(rows) == 20
    assert rows[0].skew_factor > 1.0
    assert rows[0].n_rows >= rows[-1].n_rows
    assert all(0.0 < r.share < 1.0 for r in rows)


def test_prefix_sum_matches_sequential_scan_property(spark):
    """Property: the two-phase distributed prefix sum equals a plain
    sequential scan for arbitrary (sparse, duplicate-free, unordered)
    doc_id spaces and token counts — including range buckets left empty
    by id gaps and a bucket width forced to its minimum."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from recsys_mapreduce_mrjob_spark.operators.text import (
        distributed_prefix_sum,
    )

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        st.dictionaries(
            st.integers(min_value=0, max_value=10_000_000),
            st.integers(min_value=1, max_value=5_000),
            min_size=1,
            max_size=60,
        ),
        st.integers(min_value=1, max_value=16),
    )
    def check(doc_tokens, n_ranges):
        rows = list(doc_tokens.items())
        df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
        got = {
            r.doc_id: r.start_offset
            for r in distributed_prefix_sum(df, n_ranges=n_ranges).collect()
        }
        expect, acc = {}, 0
        for doc_id, n in sorted(rows):
            expect[doc_id] = acc
            acc += n
        assert got == expect

    check()


def test_mixture_rates_match_fraction_arithmetic_property(spark):
    """Property: the int64 basis-point rates equal
    floor(10000 · min_m(toks_m/w_m) · w_l / toks_l) computed in exact
    Fraction arithmetic, and the bottleneck stratum's rate is exactly
    10000 (kept whole)."""
    from fractions import Fraction

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from recsys_mapreduce_mrjob_spark.operators.sampling import mixture_rates

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        st.lists(
            st.tuples(
                # past ~9.2e10 an int64 product of 10000·toks·w_bp wraps;
                # the decimal(38,0) arithmetic must stay exact well beyond
                st.integers(min_value=1, max_value=5_000_000_000_000_000),
                st.integers(min_value=1, max_value=10_000),  # w_bp
            ),
            min_size=1,
            max_size=6,
        )
    )
    def check(strata):
        rows = [(f"l{i}", t, w) for i, (t, w) in enumerate(strata)]
        df = spark.createDataFrame(rows, "lang string, toks long, w_bp long")
        got = {r.lang: r.rate_bp for r in mixture_rates(df).collect()}
        t_over_w = {lang: Fraction(t, w) for lang, t, w in rows}
        bottleneck = min(t_over_w.values())
        expect = {
            lang: int(10000 * bottleneck * w / t)  # int() == floor (positive)
            for lang, t, w in rows
        }
        assert got == expect
        assert max(got.values()) == 10000
        for lang, t, w in rows:
            if t_over_w[lang] == bottleneck:
                assert got[lang] == 10000

    check()


def test_memo_unpersist_releases_storage(spark, smoke_dir):
    """The memo release path (ADVICE r6 knob): persist a relation through
    the memo, unpersist it by name, and the handle's storage level must
    drop to NONE (a later memo_persist call re-registers it)."""
    from pyspark.storagelevel import StorageLevel

    from recsys_mapreduce_mrjob_spark.caching import memo_persist, memo_unpersist
    from recsys_mapreduce_mrjob_spark.sources.readers import load_table

    df = memo_persist(
        spark,
        "unpersist_probe",
        smoke_dir,
        lambda: load_table(spark, smoke_dir, "region"),
    )
    df.count()
    assert df.storageLevel != StorageLevel.NONE
    n = memo_unpersist("unpersist_probe")
    assert n >= 1
    assert df.storageLevel == StorageLevel.NONE
    # Re-memoizing after release re-persists cleanly.
    df2 = memo_persist(
        spark,
        "unpersist_probe",
        smoke_dir,
        lambda: load_table(spark, smoke_dir, "region"),
    )
    df2.count()
    assert df2.storageLevel != StorageLevel.NONE
    memo_unpersist("unpersist_probe")


def test_pairwise_gemm_drops_self_pairs_on_duplicate_input(spark):
    """Diagonal guard (code-review r7): a duplicate (user, item) rating
    row must NOT surface as an item_x == item_y self-pair — the pre-
    rewrite kernel filtered those via its `ida < idb` pass, and the
    direct-triangle rewrite has to keep that robustness for callers that
    skip the pre-aggregation step."""
    from recsys_mapreduce_mrjob_spark.operators.recsys import pairwise_stats_gemm

    r = spark.createDataFrame(
        [
            (1, 10, 3.0),
            (1, 10, 4.0),  # duplicate (user, item)
            (1, 20, 5.0),
            (2, 10, 2.0),
            (2, 20, 1.0),
        ],
        "user_id long, item_id long, rating double",
    )
    got = pairwise_stats_gemm(r, min_support=1, n_blocks=2).collect()
    assert got, "expected cross-item pairs"
    assert all(g.item_x != g.item_y for g in got), got
    assert all(g.item_x < g.item_y for g in got), got


def test_two_phase_rank_matches_sequential_rank_property(spark):
    """Property: two_phase_rank equals the plain sequential row_number
    for arbitrary (partition, bucket, order-key) data — ragged partition
    sizes, empty buckets, duplicate order keys broken by id — provided
    the bucket is coarser than the order (enforced here by making the
    bucket the integer prefix of the order key, exactly how
    q_global_shuffle and q_text_ccnet_buckets derive theirs)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from pyspark.sql import functions as F

    from recsys_mapreduce_mrjob_spark.operators.sampling import two_phase_rank

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=2),      # partition key
                st.integers(min_value=0, max_value=1000),   # order key
            ),
            min_size=1,
            max_size=80,
        )
    )
    def check(rows):
        data = [(i, p, k, k // 100) for i, (p, k) in enumerate(rows)]
        df = spark.createDataFrame(
            data, "id long, part long, k long, bkt long"
        )
        got = {
            (r.part, r.id): r.rnk
            for r in two_phase_rank(
                df, ["part"], "bkt", [F.col("k"), F.col("id")], rank_col="rnk"
            ).collect()
        }
        expect = {}
        for p in {p for _, p, _, _ in data}:
            members = sorted(
                ((k, i) for i, pp, k, _ in data if pp == p)
            )
            for rank, (_, i) in enumerate(members, start=1):
                expect[(p, i)] = rank
        assert got == expect

    check()


def test_approx_distinct_error_is_bounded(spark, sf_dir):
    """Stronger-than-rows check for the irreducibly rows-only HLL query
    (VERDICT r7 #7): the relation already carries the exact count next to
    the estimate, so pin the estimator's contract — relative error within
    3× the default rsd (0.05) on every group.  The exact column is graded
    nowhere else at this grain, so this also re-proves it against
    approx's independent path."""
    rows = registry.QUERIES["q_agg_approx_distinct"](spark, sf_dir).collect()
    assert rows, "no groups returned"
    for r in rows:
        assert r.exact_parts > 0
        rel_err = abs(r.approx_parts - r.exact_parts) / r.exact_parts
        assert rel_err <= 0.15, (r.l_returnflag, r.approx_parts, r.exact_parts)


def test_als_and_neighborhood_recover_planted_blocks(spark):
    """Rank-overlap invariant for the rows-only ALS recommender (VERDICT
    r7 #7): on a PLANTED two-block preference matrix (users 0-4 × items
    0-4 high, users 5-9 × items 5-9 high, sparse low cross-block ratings,
    one held-out in-block item per user), the registered ALS pipeline
    (same hyperparameters + unseen-filter + rounded-pred ranking as
    q_recommend_als) and the neighborhood recommender must BOTH surface
    the held-out in-block item at rank 1, and their top-3 sets must
    overlap — the two model families agree where the data has real
    structure, which the derived TPC-H ratings (no low-rank structure,
    held-out-RMSE test above) cannot show."""
    from pyspark.ml.recommendation import ALS
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from recsys_mapreduce_mrjob_spark.operators.recsys import recommend_topn

    rows = []
    for u in range(10):
        blk = 0 if u < 5 else 1
        items_in = range(0, 5) if blk == 0 else range(5, 10)
        for i in items_in:
            if (u + i) % 5 == 0:
                continue  # the held-out in-block item
            rows.append((u, i, float(35 + ((u * 7 + i * 3) % 11))))
        for i in [
            (u * 3) % 5 + (5 if blk == 0 else 0),
            (u * 3 + 1) % 5 + (5 if blk == 0 else 0),
        ]:
            rows.append((u, i, float(3 + ((u + i) % 3))))
    ratings = spark.createDataFrame(rows, "user_id long, item_id long, rating double")
    held = {
        u: next(
            i
            for i in (range(0, 5) if u < 5 else range(5, 10))
            if (u + i) % 5 == 0
        )
        for u in range(10)
    }

    nb = recommend_topn(ratings, k=5, n=3).collect()
    nb_top = {}
    for r in nb:
        nb_top.setdefault(r.user_id, {})[r.rank] = r.item_id

    # The registered ALS pipeline shape (recsys.py q_recommend_als) on the
    # fixture: same hyperparameters, unseen anti-join, rounded-pred rank.
    model = ALS(
        rank=8,
        maxIter=10,
        regParam=5.0,
        seed=42,
        userCol="user_id",
        itemCol="item_id",
        ratingCol="rating",
        coldStartStrategy="drop",
    ).fit(ratings)
    recs = (
        model.recommendForAllUsers(10)
        .select("user_id", F.explode("recommendations").alias("r"))
        .select(
            "user_id",
            F.col("r.item_id").alias("item_id"),
            F.col("r.rating").cast("double").alias("pred"),
        )
        .join(ratings.select("user_id", "item_id"), ["user_id", "item_id"], "left_anti")
    )
    w = Window.partitionBy("user_id").orderBy(
        F.desc(F.round("pred", 6)), F.asc("item_id")
    )
    als_rows = (
        recs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .collect()
    )
    als_top = {}
    for r in als_rows:
        als_top.setdefault(r.user_id, {})[r.rank] = r.item_id

    # Neighborhood is pure relational algebra on the planted structure:
    # rank 1 must be the held-out in-block item for every user.
    assert all(nb_top[u][1] == held[u] for u in range(10)), nb_top
    # ALS is iterative: allow one user of slack on the exact-item claim,
    # but every top-1 must stay in-block (measured 10/10 exact).
    in_block = lambda u, i: (u < 5) == (i < 5)
    exact_hits = sum(als_top[u][1] == held[u] for u in range(10))
    assert exact_hits >= 9, als_top
    assert all(in_block(u, als_top[u][1]) for u in range(10)), als_top
    # Rank overlap between the two families (measured 2.5 mean @3).
    overlaps = [
        len(set(als_top[u].values()) & set(nb_top[u].values())) for u in range(10)
    ]
    assert min(overlaps) >= 1 and sum(overlaps) >= 15, overlaps


def test_dedup_spans_finds_planted_full_doc_spans_sf01(spark):
    """The span-level dedup (round 8) must report every planted exact
    sf0.1 duplicate as a FULL-document shared span starting at position
    1 in both docs — the span report is what an exact-substring removal
    pass consumes, so missing or truncating a verbatim copy is the
    failure mode that matters."""
    from pyspark.sql import functions as F
    from recsys_mapreduce_mrjob_spark.sources.readers import load_table

    # Keep the FIRST span per pair explicitly (min start_a): a pair can
    # report several spans when a frequent shingle splits the run, and a
    # dict comprehension would keep an arbitrary collect()-order row
    # (code-review r8).
    spans: dict = {}
    for r in registry.QUERIES["q_dedup_spans"](spark, SF01).collect():
        k = (r.doc_a, r.doc_b)
        if k not in spans or r.start_a < spans[k][0]:
            spans[k] = (r.start_a, r.start_b, r.span_tokens)
    docs = load_table(spark, SF01, "documents")
    dup_pairs = (
        docs.alias("a")
        .join(
            docs.alias("b"),
            (F.md5(F.col("a.text")) == F.md5(F.col("b.text")))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.size(F.split(F.col("a.text"), " ")).alias("n_toks"),
        )
        .collect()
    )
    assert dup_pairs, "no planted exact duplicates at sf0.1?"
    for r in dup_pairs:
        if r.n_toks < 10:
            continue  # below the reporting threshold by design
        got = spans.get((r.doc_a, r.doc_b))
        assert got is not None, (r.doc_a, r.doc_b)
        start_a, start_b, span = got
        assert (start_a, start_b) == (1, 1), got
        # A frequent-shingle (occ > cap) interruption may split the span;
        # the FIRST reported span must still cover most of the doc.
        assert span >= 0.5 * r.n_toks, (got, r.n_toks)


def test_dedup_spans_match_bruteforce_property(spark):
    """Property: the span-dedup pipeline (positional shingles →
    occurrence-capped match join → diagonal gaps-and-islands) equals an
    independent brute-force maximal-common-run computation, for corpora
    built as a shared chunk embedded at arbitrary offsets inside noise —
    including docs shorter than the shingle width, chunks shared by >2
    docs, and runs split by the occurrence cap."""
    import tempfile
    import shutil
    from collections import Counter, defaultdict

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    K, CAP, MIN = 5, 8, 10
    VOCAB = ["aa", "bb", "cc", "dd", "ee", "ff"]
    tok = st.sampled_from(VOCAB)

    def brute(docs):
        grams = {
            d: [(" ".join(t[i : i + K]), i + 1) for i in range(len(t) - K + 1)]
            for d, t in docs.items()
            if len(t) >= K
        }
        occ = Counter(g for gs in grams.values() for g, _ in gs)
        kept = {
            d: [(g, p) for g, p in gs if 2 <= occ[g] <= CAP]
            for d, gs in grams.items()
        }
        out = set()
        ids = sorted(kept)
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                gb = defaultdict(list)
                for g, p in kept[b]:
                    gb[g].append(p)
                diag = defaultdict(set)
                for g, pa in kept[a]:
                    for pb in gb.get(g, ()):
                        diag[pa - pb].add(pa)
                for d_, pas in diag.items():
                    pas = sorted(pas)
                    start = prev = pas[0]
                    for p in pas[1:] + [None]:
                        if p is not None and p == prev + 1:
                            prev = p
                            continue
                        span = prev - start + K
                        if span >= MIN:
                            out.add((a, b, start, start - d_, span))
                        if p is not None:
                            start = prev = p
        return out

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
    )
    @given(
        chunk=st.lists(tok, min_size=8, max_size=18),
        affixes=st.lists(
            st.tuples(
                st.lists(tok, max_size=10),  # prefix
                st.lists(tok, max_size=10),  # suffix
                st.booleans(),  # embed the shared chunk?
            ),
            min_size=2,
            max_size=4,
        ),
    )
    def check(chunk, affixes):
        docs = {}
        for i, (pre, suf, embed) in enumerate(affixes):
            docs[i] = pre + (chunk if embed else []) + suf
        rows = [(d, " ".join(t)) for d, t in docs.items()]
        base = tempfile.mkdtemp(prefix="span_prop_")
        try:
            spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
                f"{base}/documents.parquet"
            )
            from recsys_mapreduce_mrjob_spark.caching import memo_unpersist

            memo_unpersist("span_pos_shingles")
            got = {
                (r.doc_a, r.doc_b, r.start_a, r.start_b, r.span_tokens)
                for r in registry.QUERIES["q_dedup_spans"](spark, base).collect()
            }
            assert got == brute(docs), (docs, got, brute(docs))
        finally:
            shutil.rmtree(base, ignore_errors=True)

    check()
