#!/usr/bin/env python
"""ANN at honest scale (VERDICT r5 #5): measure, don't assert.

The three registered ANN paths (q_knn_cosine_ivf, q_knn_cosine_lsh,
q_knn_cosine_lsh_exact) index the 2,000-vector bench table, where every
query is fixed-cost-bound and sub-linearity is invisible.  This tool
builds a deterministic synthetic corpus (default 200k × 64 float32,
seeded numpy — ~20 s one-time) and times:

  1. exact GEMV scan        — the brute-force baseline
     (operators/embeddings.knn_cosine_kernel: one mapInArrow float64
     GEMV pass over the corpus, top-10 on the rounded score);
  2. query-time IVF         — the registered q_knn_cosine_ivf shape
     (assignment recomputed per query: corpus × K broadcast argmax →
     probe filter).  EXPECTED to lose to (1): assignment itself scans
     the corpus K-fold — this row exists to show why an index must be
     PERSISTED;
  3. persisted-IVF probe    — the production shape the operator's
     docstring claims: cell assignment written once as a parquet table
     partitioned by cell id, query = K-row centroid probe (driver-side
     metadata) + partition-pruned scan of the nprobe nearest cells +
     exact GEMV re-rank of ~nprobe/K of the corpus.

Also reports recall@10 of (3) vs (1) and the per-path scan fractions, at
two corpus rungs so the crossover is measured rather than claimed.
Results are recorded in BASELINE.md ("ANN scale rung", round 6).

Usage: python tools/bench_ann_scale.py [n_vectors ...]   (default 20000 200000)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from recsys_mapreduce_mrjob_spark.operators.embeddings import knn_cosine_kernel
from recsys_mapreduce_mrjob_spark.session import session_builder

DIM = 64
SEED = 20260814
K_CELLS = 64
N_PROBE = 4
TOPK = 10


def build_corpus(spark, n: int, out_dir: str) -> None:
    """Deterministic synthetic embeddings with the testdata's schema
    (vec_id long, label int, embedding array<float>).  Mild cluster
    structure (32 Gaussian lobes) so IVF cells are non-degenerate."""
    rng = np.random.default_rng(SEED)
    lobes = rng.standard_normal((32, DIM)).astype("float32") * 2.0
    ids = np.arange(n, dtype="int64")
    assign = rng.integers(0, 32, n)
    vecs = (
        lobes[assign] + rng.standard_normal((n, DIM)).astype("float32")
    ).astype("float32")
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "vec_id": ids,
            "label": assign.astype("int32"),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(vecs.reshape(-1), type=pa.float32()), DIM
            ).cast(pa.list_(pa.float32())),
        }
    )
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(tbl, os.path.join(out_dir, "embeddings.parquet"),
                   row_group_size=50_000)


def centroids_and_query(spark, sf_dir: str):
    """First K_CELLS vectors are the coarse centroids; vec_id 0 is the
    query (mirroring the registered operator's conventions)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = (
        emb.where(F.col("vec_id") < K_CELLS)
        .select("vec_id", "embedding")
        .collect()
    )
    cents = np.array(
        [r["embedding"] for r in sorted(rows, key=lambda r: r["vec_id"])],
        dtype="float64",
    )
    return cents, cents[0]


def build_ivf_index(spark, sf_dir: str, index_dir: str) -> None:
    """One-time index build: broadcast-argmax cell assignment (the
    registered operator's exact plan shape) written as parquet
    PARTITIONED BY cell id — the literal probe filter then prunes
    partitions at scan time."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = F.broadcast(
        emb.where(F.col("vec_id") < K_CELLS).select(
            F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
        )
    )
    dot = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    nrm = lambda a: F.sqrt(dot(a, a))  # noqa: E731
    scored = (
        emb.withColumn("n1", nrm(F.col("embedding")))
        .join(cents.withColumn("n2", nrm(F.col("cvec"))))
        .select(
            "vec_id",
            "label",
            "embedding",
            "cid",
            F.round(
                dot(F.col("embedding"), F.col("cvec"))
                / (F.col("n1") * F.col("n2")),
                6,
            ).alias("score"),
        )
    )
    assign = (
        scored.groupBy("vec_id")
        .agg(
            F.max(
                F.struct(
                    "score", (-F.col("cid")).alias("neg_cid"),
                    "label", "embedding",
                )
            ).alias("b")
        )
        .select(
            "vec_id",
            (-F.col("b.neg_cid")).alias("cid"),
            F.col("b.label").alias("label"),
            F.col("b.embedding").alias("embedding"),
        )
    )
    assign.write.mode("overwrite").partitionBy("cid").parquet(index_dir)


def probe_cells(cents: np.ndarray, q: np.ndarray) -> list[int]:
    """Driver-side index metadata: K cosine scores, nprobe nearest."""
    s = (cents @ q) / (np.linalg.norm(cents, axis=1) * np.linalg.norm(q))
    s = np.round(s, 6)
    order = np.lexsort((np.arange(len(s)), -s))
    return [int(c) for c in order[:N_PROBE]]


def ivf_query(spark, index_dir: str, cents: np.ndarray, q: np.ndarray):
    """Persisted-index query: partition-pruned scan of the probed cells,
    exact float64 GEMV re-rank (same kernel math as the exact path)."""
    probes = probe_cells(cents, q)
    cand = spark.read.parquet(index_dir).where(F.col("cid").isin(probes))
    qarr = q.astype("float64")
    qnrm = float(np.sqrt(qarr @ qarr))

    def score(batches):
        import pyarrow as pa

        for rb in batches:
            mat = (
                rb.column("embedding")
                .flatten()
                .to_numpy(zero_copy_only=False)
                .astype("float64", copy=False)
                .reshape(rb.num_rows, -1)
            )
            nrm_ = np.sqrt((mat * mat).sum(axis=1))
            cos = (mat @ qarr) / (nrm_ * qnrm)
            yield pa.RecordBatch.from_arrays(
                [rb.column("vec_id"), pa.array(cos, type=pa.float64())],
                names=["vec_id", "cos_raw"],
            )

    scored = cand.where(F.col("vec_id") != 0).select(
        "vec_id", "embedding"
    ).mapInArrow(score, "vec_id long, cos_raw double")
    return (
        scored.select("vec_id", (F.round("cos_raw", 5) + F.lit(0.0)).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(TOPK)
    )


def timed(fn, runs: int = 5) -> float:
    fn()
    return min(
        (lambda t0=time.monotonic(): (fn(), time.monotonic() - t0)[1])()
        for _ in range(runs)
    )


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [20_000, 200_000]
    spark = (
        session_builder(
            master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
            shuffle_partitions=32,
        )
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    results = {}
    for n in sizes:
        base = tempfile.mkdtemp(prefix=f"ann_scale_{n}_")
        corpus = os.path.join(base, "corpus")
        index = os.path.join(base, "ivf_index")
        build_corpus(spark, n, corpus)
        cents, q = centroids_and_query(spark, corpus)

        t_build = timed(lambda: build_ivf_index(spark, corpus, index), runs=1)

        exact_df = lambda: knn_cosine_kernel(spark, corpus).toPandas()  # noqa: E731
        t_exact = timed(exact_df)
        exact_ids = set(knn_cosine_kernel(spark, corpus).toPandas()["vec_id"])

        ivf_df = lambda: ivf_query(spark, index, cents, q).toPandas()  # noqa: E731
        t_ivf = timed(ivf_df)
        got = ivf_query(spark, index, cents, q).toPandas()
        recall = len(set(got["vec_id"]) & exact_ids) / TOPK
        scanned = spark.read.parquet(index).where(
            F.col("cid").isin(probe_cells(cents, q))
        ).count()

        # Partition pruning must be real, not assumed: the plan must
        # contain a PartitionFilters section AND the cid predicate must
        # sit INSIDE it (code-review r6: a fallback that greps the whole
        # plan for 'cid#' reports pruned=true for a full scan whose cid
        # filter is an ordinary post-scan Filter — vacuously passing in
        # exactly the broken case this check exists to catch).
        plan = spark.read.parquet(index).where(
            F.col("cid").isin(probe_cells(cents, q))
        )._jdf.queryExecution().executedPlan().toString()
        pruned = False
        if "PartitionFilters" in plan:
            section = plan.split("PartitionFilters", 1)[1]
            section = section.split("]", 1)[0]  # just the filter list
            pruned = "cid" in section

        results[n] = {
            "exact_gemv_sec": round(t_exact, 3),
            "ivf_persisted_query_sec": round(t_ivf, 3),
            "ivf_index_build_sec": round(t_build, 3),
            "recall_at_10": recall,
            "scan_fraction": round(scanned / n, 4),
            "partition_pruned": bool(pruned),
            "k_cells": K_CELLS,
            "n_probe": N_PROBE,
        }
        print(f"n={n}: {json.dumps(results[n])}", flush=True)
        shutil.rmtree(base, ignore_errors=True)
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
