"""Semantic-dedup ingestion probe ladder (VERDICT r12 #5).

Measures ``incremental_semantic_dedup``'s per-batch probe wall against
accumulated state size, WITH the round-13 exact ANN screen (per-cell
centroid-angle hulls pushed into the state scan) and WITHOUT it (the
round-12 full-state GEMM), and asserts the two probes discover the
IDENTICAL pair set — the screen is lossless by the triangle inequality,
so this is a speed ladder, not an accuracy trade.

State shape: CLUSTERED vectors (16 seeded unit centroids, members =
centroid + Gaussian noise, renormalized) — the regime real embedding
corpora live in and the one where an exact geometric screen can prune.
``--uniform`` switches to i.i.d. random vectors, the adversarial regime
where no exact screen at cos 0.45 can prune anything (pairwise angles
concentrate at 90°, every cell hull covers every row) — the screened
probe must then match the unscreened wall (small constant overhead),
never miss pairs.

Usage:  python tools/bench_semdedup_probe.py [--rungs 20000,80000,320000]
        python tools/bench_semdedup_probe.py --uniform
One JSON line per rung on stdout.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from recsys_mapreduce_mrjob_spark.session import session_builder  # noqa: E402

DIM = 64
BATCH = 500
REPS = 3
K_CLUSTERS = 16


def gen_vectors(
    n: int, seed: int, uniform: bool, clusters: list[int] | None = None
) -> np.ndarray:
    """Clustered regime: 16 tight topic clusters (σ=0.05 noise — members
    sit ~20° from their centroid, the shape a topical embedding corpus
    has); ``clusters`` restricts membership (a streaming batch arrives
    topic-local — a crawl shard, a submission burst — while the STATE
    spans every topic).  Uniform regime: i.i.d. Gaussian directions, the
    adversarial no-structure case."""
    rng = np.random.default_rng(seed)
    if uniform:
        v = rng.standard_normal((n, DIM))
    else:
        crng = np.random.default_rng(4242)
        cents = crng.standard_normal((K_CLUSTERS, DIM))
        cents /= np.linalg.norm(cents, axis=1, keepdims=True)
        pool = clusters if clusters is not None else list(range(K_CLUSTERS))
        idx = np.array(pool)[rng.integers(0, len(pool), n)]
        v = cents[idx] + 0.05 * rng.standard_normal((n, DIM))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return v.astype("float32")


def main() -> None:
    rungs = [20_000, 80_000, 320_000]
    uniform = "--uniform" in sys.argv
    for a in sys.argv[1:]:
        if a.startswith("--rungs"):
            rungs = [int(x) for x in a.split("=", 1)[1].split(",")]

    spark = (
        session_builder(
            master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    import recsys_mapreduce_mrjob_spark.streaming.twins as tw

    base = tempfile.mkdtemp(prefix="semdedup_ladder_")
    try:
        for n_state in rungs:
            work = f"{base}/s{n_state}"
            os.makedirs(work)
            state = gen_vectors(n_state, seed=7, uniform=uniform)
            batch = gen_vectors(BATCH, seed=99, uniform=uniform, clusters=None if uniform else [3, 11])

            sdf = spark.createDataFrame(
                [(int(i), v.tolist(), 0) for i, v in enumerate(state)],
                "vec_id long, embedding array<float>, label int",
            )
            bdf = spark.createDataFrame(
                [
                    (int(n_state + i), v.tolist(), 0)
                    for i, v in enumerate(batch)
                ],
                "vec_id long, embedding array<float>, label int",
            )
            # Seed the state through the REAL fold (writes the pinned
            # centroids + the (cell, tcc)-sorted vecs version), then
            # time just the cross probe the way the r12 ladder did: the
            # fold's own kernel + layout, no writes in the loop.
            src = f"{work}/src"
            sdf.coalesce(1).write.parquet(src)
            st = f"{work}/state"
            tw.incremental_semantic_dedup(spark, src, st)

            cents = spark.read.parquet(f"{st}/cents").collect()
            cents = [
                (int(r["cid"]), [float(x) for x in r["cvec"]]) for r in cents
            ]
            vecs = [
                os.path.join(f"{st}/vecs", d)
                for d in sorted(os.listdir(f"{st}/vecs"))
            ]
            from recsys_mapreduce_mrjob_spark.functions.vectors import (
                dot,
                l2_norm,
            )

            T = math.acos(0.45)
            MARGIN = 1e-4
            nrm = l2_norm(F.col("embedding"))
            angles = F.array(
                *[
                    F.struct(
                        F.acos(
                            F.least(
                                F.lit(1.0),
                                F.greatest(
                                    F.lit(-1.0),
                                    dot(
                                        F.col("embedding"),
                                        F.array(*[F.lit(x) for x in cv]),
                                    )
                                    / nrm,
                                ),
                            )
                        ).alias("t"),
                        F.lit(cid).alias("cid"),
                    )
                    for cid, cv in cents
                ]
            )
            bdf_p = bdf.select("vec_id", "embedding").persist()
            bdf_p.count()
            hulls = (
                bdf_p.select(F.explode(angles).alias("ct"))
                .groupBy(F.col("ct.cid").alias("cell"))
                .agg(F.min("ct.t").alias("lo"), F.max("ct.t").alias("hi"))
                .collect()
            )
            screen = None
            for r in hulls:
                c = (F.col("cell") == int(r["cell"])) & F.col("tcc").between(
                    float(r["lo"]) - T - MARGIN, float(r["hi"]) + T + MARGIN
                )
                screen = c if screen is None else screen | c

            def probe(screened: bool):
                vstate = spark.read.parquet(*vecs)
                if screened:
                    vstate = vstate.where(screen)
                vstate = vstate.select(
                    "vec_id",
                    "embedding",
                    F.pmod(F.xxhash64("vec_id"), F.lit(8)).alias("blk"),
                    F.lit(0).alias("side"),
                )
                vb = bdf_p.select(
                    "vec_id",
                    "embedding",
                    F.explode(F.array(*[F.lit(p) for p in range(8)])).alias(
                        "blk"
                    ),
                    F.lit(1).alias("side"),
                )
                return (
                    vstate.unionByName(vb)
                    .groupBy("blk")
                    .applyInArrow(
                        tw._semantic_pair_kernel("cross"),
                        schema="vec_a long, vec_b long",
                    )
                )

            pairs_full = {tuple(r) for r in probe(False).collect()}
            pairs_scr = {tuple(r) for r in probe(True).collect()}
            assert pairs_scr == pairs_full, (
                f"screen lost pairs at S={n_state}: "
                f"{len(pairs_scr)} vs {len(pairs_full)}"
            )

            def times(screened: bool) -> list[float]:
                out = []
                for _ in range(REPS):
                    t0 = time.monotonic()
                    probe(screened).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    out.append(round(time.monotonic() - t0, 3))
                return out

            t_full = times(False)
            t_scr = times(True)
            kept = spark.read.parquet(*vecs).where(screen).count()
            print(
                json.dumps(
                    {
                        "mode": "uniform" if uniform else "clustered",
                        "seen": n_state,
                        "pairs": len(pairs_full),
                        "state_rows_kept_by_screen": kept,
                        "probe_full_med": sorted(t_full)[len(t_full) // 2],
                        "probe_screened_med": sorted(t_scr)[len(t_scr) // 2],
                        "probe_full_all": t_full,
                        "probe_screened_all": t_scr,
                    }
                ),
                flush=True,
            )
            bdf_p.unpersist()
            shutil.rmtree(work, ignore_errors=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
