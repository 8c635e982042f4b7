#!/usr/bin/env python
"""Near-dup LSH at honest scale: measure where the banded shape flips.

At sf0.1 `q_dedup_near` already sits at ~1.2× its DuckDB twin adjusted
(BASELINE.md).  The scale question the plan shape argues — candidates
come from band-signature equi-joins, so cost grows ~linearly in docs,
never quadratically — deserves the same measured treatment the flagship
and ANN got (BASELINE.md rungs).  This tool builds a deterministic
synthetic corpus scale-up — K copies of the sf0.1 `documents` table with
every token TAGGED per copy (`tok` → `tok_kI`), so copies are fully
content-disjoint: shingle vocabulary, LSH buckets, and the near-dup pair
population each scale ~K× with NO cross-copy pairs — and times the
engine's LSH pipeline against the DuckDB twin of the same shape
(tools/bench_duckdb_twins.py DEDUP_NEAR_TWIN: identical
signature/banding/verification strategy, engine-native hash) under the
same best-of-N fetch contract as bench.py.

Row-count parity is reported per rung (the two engines hash differently,
so candidate sets can differ at the margin; the planted duplicate
population is what both must find — counts landing within a few rows of
K× the sf0.1 count is the expected signature).

Usage: python tools/bench_dedup_scale.py [K ...]   (default 3 10)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from tools.bench_duckdb_twins import DEDUP_NEAR_TWIN

SRC = "/root/testdata/sf0.1"
DOC_OFF = 10_000_000
RUNS = 3


def build_scaled(k: int, out_dir: str) -> None:
    """K content-disjoint copies: doc_ids shift to disjoint ranges and
    every token gets a per-copy suffix (vocabularies never collide, so
    no cross-copy shingle — the pair space scales K×, not K²)."""
    docs = pq.read_table(f"{SRC}/documents.parquet")
    parts = []
    for i in range(k):
        tag = f"_k{i}"
        text = docs.column("text")
        tagged = pc.binary_join_element_wise(
            pc.replace_substring(text, " ", f"{tag} "), "", f"{tag}"
        )
        parts.append(
            pa.table(
                {
                    "doc_id": pc.add(docs.column("doc_id"), i * DOC_OFF),
                    "text": tagged,
                    "lang": docs.column("lang"),
                    "source": docs.column("source"),
                    "n_chars": docs.column("n_chars"),
                }
            )
        )
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(
        pa.concat_tables(parts),
        f"{out_dir}/documents.parquet",
        row_group_size=5_000,
    )


def timed(fn, runs: int = RUNS) -> tuple[float, list[float]]:
    fn()  # warmup
    samples = []
    for _ in range(runs):
        t0 = time.monotonic()
        fn()
        samples.append(round(time.monotonic() - t0, 3))
    return min(samples), samples


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [3, 10]

    from recsys_mapreduce_mrjob_spark import registry
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
    registry.load_all()
    fn = registry.QUERIES["q_dedup_near"]

    results = {}
    for k in ks:
        base = tempfile.mkdtemp(prefix=f"dedup_scale_{k}_")
        try:
            build_scaled(k, base)

            con = duckdb.connect()
            con.execute(
                "CREATE VIEW documents AS SELECT * "
                f"FROM read_parquet('{base}/documents.parquet')"
            )

            duck_rows = len(con.execute(DEDUP_NEAR_TWIN).fetchdf())
            spark_rows = len(fn(spark, base).toPandas())

            t_duck, duck_runs = timed(
                lambda: con.execute(DEDUP_NEAR_TWIN).fetchdf()
            )
            con.close()

            def run_spark():
                spark.catalog.clearCache()
                fn(spark, base).toPandas()

            t_spark, spark_runs = timed(run_spark)

            results[k] = {
                "docs": 5000 * k,
                "duck_rows": duck_rows,
                "spark_rows": spark_rows,
                "duckdb_sec": t_duck,
                "spark_sec": t_spark,
                "spark_vs_duckdb": round(t_spark / t_duck, 3),
                "duck_runs": duck_runs,
                "spark_runs": spark_runs,
            }
            print(f"K={k}: {json.dumps(results[k])}", flush=True)
        finally:
            shutil.rmtree(base, ignore_errors=True)
    print(json.dumps({"src": SRC, "duckdb": duckdb.__version__, "rungs": results}))
    spark.stop()


if __name__ == "__main__":
    main()
