#!/usr/bin/env python
"""Interleaved one-process flagship A/B: Spark vs the DuckDB twin.

VERDICT r7 #2: the box's co-tenant noise waves OUTLAST a bench run, so a
Spark wall from one pass compared against a DuckDB wall from another pass
mostly measures which pass caught a wave (the method that exposed the r6
−45 % "win" as wave luck).  The only valid measurement is to ALTERNATE the
two engines inside one process — each round times DuckDB's `fetchdf()` of
the registered flagship oracle, then Spark's `toPandas()` of the
registered flagship plan (fresh DataFrame per run, `clearCache()` first,
matching bench.py's contract), so every Spark sample has a same-wave
DuckDB sample next to it and the per-round RATIO cancels the wave.

Prints one line per round plus min/median walls and the min/median of the
per-round ratios; optionally also brackets the fixed floor by timing the
same plan at sf0.001 inside the same interleave.

Run:  python tools/bench_flagship_interleaved.py [sf_dir] [rounds]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from recsys_mapreduce_mrjob_spark import registry  # noqa: E402
from recsys_mapreduce_mrjob_spark.session import get_session  # noqa: E402
from recsys_mapreduce_mrjob_spark.sources.readers import (  # noqa: E402
    TESTDATA_TABLES,
)

NAME = "q_topk_similar_items"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    small_dir = "/root/testdata/sf0.001"

    registry.load_all()
    spark = get_session(app_name="flagship_interleaved")

    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    sql = registry.ORACLES[NAME]

    def duck_once() -> float:
        t0 = time.monotonic()
        con.execute(sql).fetchdf()
        return time.monotonic() - t0

    def spark_once(data_dir: str) -> float:
        spark.catalog.clearCache()
        t0 = time.monotonic()
        registry.QUERIES[NAME](spark, data_dir).toPandas()
        return time.monotonic() - t0

    # Warm both engines (JIT/codegen/file cache) outside the timed rounds.
    duck_once()
    spark_once(sf_dir)
    spark_once(small_dir)

    d_walls, s_walls, f_walls, ratios = [], [], [], []
    for i in range(rounds):
        d = duck_once()
        s = spark_once(sf_dir)
        f = spark_once(small_dir)  # same-wave fixed-floor bracket
        d_walls.append(d)
        s_walls.append(s)
        f_walls.append(f)
        ratios.append(s / d)
        print(
            f"round {i}: duck {d:6.3f}s  spark {s:6.3f}s  floor {f:6.3f}s  "
            f"raw {s / d:5.2f}x  adj {max(s - f, 0) / d:5.2f}x",
            flush=True,
        )

    med = statistics.median
    out = {
        "query": NAME,
        "sf_dir": sf_dir,
        "rounds": rounds,
        "duck_min": round(min(d_walls), 3),
        "duck_med": round(med(d_walls), 3),
        "spark_min": round(min(s_walls), 3),
        "spark_med": round(med(s_walls), 3),
        "floor_min": round(min(f_walls), 3),
        "floor_med": round(med(f_walls), 3),
        "ratio_min": round(min(ratios), 2),
        "ratio_med": round(med(ratios), 2),
        "ratio_adj_med": round(
            med(
                [max(s - f, 0) / d for d, s, f in zip(d_walls, s_walls, f_walls)]
            ),
            2,
        ),
    }
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
