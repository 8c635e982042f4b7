#!/usr/bin/env python
"""Flagship at honest scale (VERDICT r6 #1): measure the regime flip.

At sf0.1 the flagship (`q_topk_similar_items`) loses to its DuckDB twin
on raw wall (~5×): the committed floor profile says the gap is local-mode
fixed cost plus a 13 M-pair exchange that 32 threads cannot amortize at
sub-second scale.  Curation and two-star already flipped at sf0.1; the
flagship should flip as the pair count grows.  This tool builds a
deterministic synthetic scale-up — K shifted copies of the sf0.1
`lineitem`/`orders` tables (disjoint order/customer key ranges, shared
item catalog), so the co-rating pair count scales ~K× while the rating
distribution per user is EXACTLY the sf0.1 one — and times both engines
on the same data with the same best-of-N fetch-a-DataFrame contract as
bench.py / tools/bench_duckdb_twins.py.

Cross-engine exactness at each rung is verified with the same
normalization as the grading harness (tests/parity.py) before timing is
trusted.  Results → BASELINE.md ("Flagship scale rung", round 7).

Usage: python tools/bench_flagship_scale.py [K ...]   (default 3 10)
       K = how many shifted sf0.1 copies (K=10 ≈ sf1 for this query).
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

SRC = "/root/testdata/sf0.1"
ORDERKEY_OFF = 10_000_000
CUSTKEY_OFF = 1_000_000
RUNS = 3


def build_scaled(k: int, out_dir: str) -> None:
    """K shifted copies: order/customer keys move to disjoint ranges per
    copy (so no cross-copy co-rating exists), items stay shared (so the
    similarity output keys stay the sf0.1 catalog)."""
    li = pq.read_table(
        f"{SRC}/lineitem.parquet", columns=["l_orderkey", "l_partkey", "l_quantity"]
    )
    od = pq.read_table(f"{SRC}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    li_parts, od_parts = [], []
    for i in range(k):
        li_parts.append(
            li.set_column(
                0, "l_orderkey", pc.add(li.column("l_orderkey"), i * ORDERKEY_OFF)
            )
        )
        od_parts.append(
            pa.table(
                {
                    "o_orderkey": pc.add(od.column("o_orderkey"), i * ORDERKEY_OFF),
                    "o_custkey": pc.add(od.column("o_custkey"), i * CUSTKEY_OFF),
                }
            )
        )
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(
        pa.concat_tables(li_parts),
        f"{out_dir}/lineitem.parquet",
        row_group_size=256_000,
    )
    pq.write_table(
        pa.concat_tables(od_parts),
        f"{out_dir}/orders.parquet",
        row_group_size=256_000,
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
    from tests.parity import _rows_to_multiset

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
    fn = registry.QUERIES["q_topk_similar_items"]
    sql = registry.ORACLES["q_topk_similar_items"]

    results = {}
    for k in ks:
        base = tempfile.mkdtemp(prefix=f"flagship_scale_{k}_")
        try:
            build_scaled(k, base)

            con = duckdb.connect()
            con.execute("SET TimeZone='UTC'")
            for t in ("lineitem", "orders"):
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * "
                    f"FROM read_parquet('{base}/{t}.parquet')"
                )

            # Exactness first: both engines must produce the identical
            # multiset at this rung before the timings mean anything.
            spark_df = fn(spark, base).toPandas()
            duck_df = con.execute(sql).fetchdf()
            cols = sorted(spark_df.columns)
            ms_s = _rows_to_multiset(
                list(spark_df.itertuples(index=False, name=None)),
                list(spark_df.columns),
            )
            ms_d = _rows_to_multiset(
                list(duck_df.itertuples(index=False, name=None)),
                list(duck_df.columns),
            )
            assert sorted(duck_df.columns) == cols, (cols, sorted(duck_df.columns))
            match = ms_s == ms_d

            t_duck, duck_runs = timed(lambda: con.execute(sql).fetchdf())
            con.close()

            def run_spark():
                spark.catalog.clearCache()
                fn(spark, base).toPandas()

            t_spark, spark_runs = timed(run_spark)

            results[k] = {
                "rows": len(spark_df),
                "hash_match": bool(match),
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
