#!/usr/bin/env python
"""Profile the flagship pair stage at sf0.1 (VERDICT r3 #4, round-5 GEMM).

Times the registered flagship (round 5: fused blocked sparse-Gram kernel)
against the relational fallback and its historical plan variants, plus
the GEMM stage alone at several tile counts, so the recorded BENCH
number can be attributed.  Every lambda builds a FRESH DataFrame per
timed run — re-collecting a captured DataFrame reuses shuffle outputs
and reports ~0.1 s fantasy numbers.  Prints one line per variant; run on
an otherwise idle box (co-tenant noise here is +/-50%).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from recsys_mapreduce_mrjob_spark.operators.recsys import (
    _cached_ratings,
    pairwise_stats_gemm,
    topk_similar_items,
)
from recsys_mapreduce_mrjob_spark.session import get_session

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def timed(label, fn, runs=3):
    fn()  # warmup
    best = min(_once(fn) for _ in range(runs))
    print(f"{label:55s} {best:7.3f} s", flush=True)
    return best


def _once(fn):
    t0 = time.monotonic()
    fn()
    return time.monotonic() - t0


def pairs_joined(ratings, how=None):
    a = ratings.alias("a")
    b = ratings.alias("b")
    if how:
        b = b.hint(how)
    return a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("a.item_id") < F.col("b.item_id")),
    ).select(
        F.col("a.item_id").alias("item_x"),
        F.col("b.item_id").alias("item_y"),
        F.col("a.rating").alias("rx"),
        F.col("b.rating").alias("ry"),
    )


def pairs_postinglist(ratings):
    lists = ratings.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("item_id", "rating"))).alias("arr")
    )
    pair = F.explode(
        F.flatten(
            F.transform(
                F.col("arr"),
                lambda x, i: F.transform(
                    F.slice(F.col("arr"), i + 2, F.size(F.col("arr"))),
                    lambda y: F.struct(
                        x["item_id"].alias("item_x"),
                        y["item_id"].alias("item_y"),
                        x["rating"].alias("rx"),
                        y["rating"].alias("ry"),
                    ),
                ),
            )
        )
    ).alias("p")
    return lists.select(pair).select("p.item_x", "p.item_y", "p.rx", "p.ry")


def agg_stats(pairs, repartition=True):
    if repartition:
        pairs = pairs.repartition("item_x", "item_y")
    return (
        pairs.groupBy("item_x", "item_y")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("rx") * F.col("ry")).alias("sxy"),
            F.sum("rx").alias("sx"),
            F.sum("ry").alias("sy"),
            F.sum(F.col("rx") * F.col("rx")).alias("sxx"),
            F.sum(F.col("ry") * F.col("ry")).alias("syy"),
        )
        .where(F.col("n") >= 2)
    )


def main():
    spark = get_session()
    spark.sparkContext.setLogLevel("ERROR")
    ratings = _cached_ratings(spark, SF_DIR)
    n = ratings.count()  # materialize the persist
    print(f"ratings rows: {n}")

    from recsys_mapreduce_mrjob_spark import registry

    registry.load_all()
    timed("flagship (registered: fused GEMM, end-to-end)",
          lambda: registry.QUERIES["q_topk_similar_items"](spark, SF_DIR).toPandas())
    timed("flagship (relational fallback, end-to-end)",
          lambda: topk_similar_items(ratings, impl="join").toPandas())
    for B in (4, 5, 8):
        timed(f"GEMM pair stage alone, B={B} (+rater counts)",
              lambda B=B: pairwise_stats_gemm(
                  ratings, 2, n_blocks=B, with_rater_counts=True
              ).count())
    timed("pair stats: SMJ/AQE default + repartition",
          lambda: agg_stats(pairs_joined(ratings)).count())
    timed("pair stats: shuffle_hash hint + repartition",
          lambda: agg_stats(pairs_joined(ratings, "shuffle_hash")).count())
    timed("pair stats: SMJ/AQE default, direct agg",
          lambda: agg_stats(pairs_joined(ratings), repartition=False).count())
    timed("pair stats: posting-list expansion + repartition",
          lambda: agg_stats(pairs_postinglist(ratings)).count())
    timed("pair stats: posting-list, direct agg",
          lambda: agg_stats(pairs_postinglist(ratings), repartition=False).count())
    timed("pair EXCHANGE only (write side): count pairs",
          lambda: pairs_joined(ratings).count())
    timed("posting-list pairs only: count",
          lambda: pairs_postinglist(ratings).count())

    print("\n-- registered flagship plan --")
    registry.QUERIES["q_topk_similar_items"](spark, SF_DIR).explain("formatted")


if __name__ == "__main__":
    main()
