#!/usr/bin/env python
"""Connected-components at honest scale: measure how the two-star win GROWS.

At sf0.1 `q_dedup_components_twostar` beats its DuckDB twin ~4×
(BENCH_r06: 0.24× raw).  The scale question: the twin is a recursive-CTE
reachability walk (per-component sequential frontier expansion) while
the engine runs O(log² n) alternating two-star rounds of parallel
groupBy-min — so the gap should WIDEN with corpus size, not hold.  This
tool measures that on the same content-disjoint ladder as
tools/bench_dedup_scale.py (K copy-tagged copies of the sf0.1 documents
— the dup-cluster population scales K×), running the REGISTERED query
against its REGISTERED oracle (both portable-hash exact, so row counts
must match exactly — and do, at every rung).

Usage: python tools/bench_components_scale.py [K ...]   (default 3 10)
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

from tools.bench_dedup_scale import build_scaled

RUNS = 2  # the K=10 DuckDB run is ~2 min; best-of-2 keeps the sweep tractable


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
    name = "q_dedup_components_twostar"
    fn = registry.QUERIES[name]
    sql = registry.ORACLES[name]

    results = {}
    for k in ks:
        base = tempfile.mkdtemp(prefix=f"cc_scale_{k}_")
        try:
            build_scaled(k, base)
            con = duckdb.connect()
            con.execute(
                "CREATE VIEW documents AS SELECT * "
                f"FROM read_parquet('{base}/documents.parquet')"
            )
            duck_runs, duck_rows = [], None
            for _ in range(RUNS):
                t0 = time.monotonic()
                duck_rows = len(con.execute(sql).fetchdf())
                duck_runs.append(round(time.monotonic() - t0, 2))
            con.close()

            spark_runs, spark_rows = [], None
            for _ in range(RUNS):
                spark.catalog.clearCache()
                t0 = time.monotonic()
                spark_rows = len(fn(spark, base).toPandas())
                spark_runs.append(round(time.monotonic() - t0, 2))

            results[k] = {
                "docs": 5000 * k,
                "rows_match": duck_rows == spark_rows,
                "rows": spark_rows,
                "duckdb_sec": min(duck_runs),
                "spark_sec": min(spark_runs),
                "spark_vs_duckdb": round(min(spark_runs) / min(duck_runs), 3),
                "duck_runs": duck_runs,
                "spark_runs": spark_runs,
            }
            print(f"K={k}: {json.dumps(results[k])}", flush=True)
        finally:
            shutil.rmtree(base, ignore_errors=True)
    print(json.dumps({"duckdb": duckdb.__version__, "rungs": results}))
    spark.stop()


if __name__ == "__main__":
    main()
