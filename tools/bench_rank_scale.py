"""Scale rung for two_phase_rank (q_global_shuffle's engine shape).

Question the sf0.1 bench row cannot answer (5k docs, DuckDB 7 ms — pure
fixed cost): does the two-phase distributed rank actually BEAT the
single-reducer window as rows grow, and by how much?  This ladder ranks
a synthetic N-row relation by md5(seed‖id) three ways at each rung:

  - spark-window: ``row_number() OVER (ORDER BY h, id)`` — the oracle
    shape; Spark executes it by moving EVERY row through one partition
    (the WindowExec "No Partition Defined" warning is the plan telling
    on itself).
  - spark-2phase: ``two_phase_rank`` — 256 hash-prefix buckets ranked in
    parallel + a 256-row offset window + broadcast join-back.
  - duckdb: the same single window in DuckDB (its in-process sort is
    parallel and cache-resident — the strong single-node baseline).

Consistency: at every rung all three compute the SAME permutation; we
pin it with an order-insensitive checksum Σ rank·(id+1) mod 2^61-1
(exact integer, engine-portable) rather than fetching N rows.

Rows are generated in-engine (spark.range / generate_series) — no
testdata files involved, fully deterministic.

Run:  python tools/bench_rank_scale.py            # 100k / 1M / 4M
      python tools/bench_rank_scale.py 50000 200000   # custom rungs
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from recsys_mapreduce_mrjob_spark.session import session_builder  # noqa: E402
from recsys_mapreduce_mrjob_spark.operators.sampling import (  # noqa: E402
    two_phase_rank,
)

MOD = (1 << 61) - 1
SEED = "42:"


def hashed(spark, n: int):
    return spark.range(n).select(
        F.col("id"),
        F.md5(F.concat(F.lit(SEED), F.col("id").cast("string"))).alias("h"),
    )


def checksum_spark(ranked) -> int:
    # Σ rank·(id+1) mod M in exact integer arithmetic.  The PRODUCT must
    # be computed in DECIMAL — r*(id+1) reaches n², past int64 at
    # n ≈ 3e9 (ANSI mode would throw; non-ANSI would silently wrap and
    # fire the cross-engine assert — code-review r7); the DuckDB twin
    # promotes to HUGEINT the same way.  The pmod bounds each term under
    # 2^61 so the DECIMAL(38) running sum stays exact.
    return int(
        ranked.select(
            F.sum(
                F.pmod(
                    F.col("r").cast("decimal(38,0)") * (F.col("id") + 1),
                    F.lit(MOD).cast("decimal(38,0)"),
                )
            ).alias("c")
        ).first()["c"]
        % MOD
    )


def best_of(k, fn):
    samples = []
    for _ in range(k):
        t0 = time.monotonic()
        fn()
        samples.append(round(time.monotonic() - t0, 3))
    return min(samples), samples


def main() -> None:
    rungs = [int(a) for a in sys.argv[1:]] or [100_000, 1_000_000, 4_000_000]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        session_builder(master=f"local[{cpus}]", shuffle_partitions=int(cpus))
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()

    out = []
    for n in rungs:
        base = hashed(spark, n)

        def window_form():
            r = base.withColumn(
                "r", F.row_number().over(Window.orderBy("h", "id")).cast("long")
            )
            return checksum_spark(r)

        def two_phase_form():
            b = base.withColumn("bkt", F.substring("h", 1, 2))
            r = two_phase_rank(
                b, [], "bkt", [F.col("h"), F.col("id")], rank_col="r"
            )
            return checksum_spark(r)

        duck_sql = f"""
WITH h AS (
    SELECT i AS id, md5(concat('{SEED}', CAST(i AS VARCHAR))) AS h
    FROM generate_series(0, {n - 1}) t(i)
),
r AS (SELECT id, CAST(row_number() OVER (ORDER BY h, id) AS BIGINT) AS r
      FROM h)
SELECT CAST(sum((CAST(r AS HUGEINT) * (id + 1)) % {MOD}) AS HUGEINT)
       % {MOD} AS c FROM r
"""

        def duck_form():
            return int(con.execute(duck_sql).fetchone()[0])

        cks = {"window": window_form(), "2phase": two_phase_form(),
               "duckdb": duck_form()}  # warmups double as consistency probe
        assert len(set(cks.values())) == 1, f"checksum mismatch at n={n}: {cks}"

        w, w_s = best_of(3, window_form)
        p, p_s = best_of(3, two_phase_form)
        d, d_s = best_of(3, duck_form)
        row = {
            "n": n,
            "spark_window_sec": w,
            "spark_2phase_sec": p,
            "duckdb_sec": d,
            "checksum": cks["window"],
            "samples": {"window": w_s, "2phase": p_s, "duckdb": d_s},
        }
        out.append(row)
        print(json.dumps(row), flush=True)

    print(json.dumps({"ladder": out}))
    spark.stop()


if __name__ == "__main__":
    main()
