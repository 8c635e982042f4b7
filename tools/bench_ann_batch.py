#!/usr/bin/env python
"""Batched ANN probe rung: total wall vs probe-set size N.

VERDICT r9 "what's missing" #2: the single-probe IVF plan answers ONE
query vector per driver round-trip, so N probes cost N scans.
`batch_probe_ivf` (round 10) answers all N probes from ONE
partition-pruned index scan.  This rung times the batch query over the
persisted index at N ∈ {1, 8, 32} (best-of-3, cache cleared between
runs, index build amortized into the warmup like bench.py's
`q_knn_cosine_ivf_indexed` contract) and prints per-probe cost next to
the extrapolated N-single-probe path (N × the measured single-probe
wall) — the claim is total wall ~flat in N, so per-probe falls ~1/N
while the naive path is constant per probe.

Usage: python tools/bench_ann_batch.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from recsys_mapreduce_mrjob_spark.session import session_builder

    spark = (
        session_builder(
            master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
            shuffle_partitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        )
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from recsys_mapreduce_mrjob_spark.operators.embeddings import (
        batch_probe_ivf,
        ivf_index_dir,
        probe_ivf,
    )

    index_path = ivf_index_dir(spark, sf_dir)  # built once, like production

    def best_of(fn, runs: int = 3) -> float:
        fn()  # warmup
        samples = []
        for _ in range(runs):
            spark.catalog.clearCache()
            t0 = time.monotonic()
            fn()
            samples.append(time.monotonic() - t0)
        return round(min(samples), 3)

    single = best_of(
        lambda: probe_ivf(
            spark, sf_dir, spark.read.parquet(index_path)
        ).toPandas()
    )
    out = {"single_probe_sec": single, "rungs": {}}
    for n in (1, 8, 32):
        wall = best_of(
            lambda n=n: batch_probe_ivf(
                spark, sf_dir, spark.read.parquet(index_path), n
            ).toPandas()
        )
        out["rungs"][str(n)] = {
            "batch_total_sec": wall,
            "batch_per_probe_sec": round(wall / n, 3),
            "naive_n_singles_sec": round(single * n, 3),
        }
        print(f"N={n}: {json.dumps(out['rungs'][str(n)])}", flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
