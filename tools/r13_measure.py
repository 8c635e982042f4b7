"""Round-13 measurement harness (guide §1): isolate queries with the
noop sink, label jobs, dump `.explain("formatted")` to plans/r13/.

Usage:
    python tools/r13_measure.py plans  <before|after> q_a q_b ...
    python tools/r13_measure.py time   [--sf DIR] [--runs N] q_a q_b ...
    python tools/r13_measure.py jobs   [--sf DIR] q_a ...   # job/stage counts

`time` mirrors bench.py's contract per query (clearCache between runs,
warmup once, best/median of N) but sinks to noop so the computation is
timed, not the toPandas fetch — used for A/B deltas only; the committed
bench numbers stay bench.py's.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from recsys_mapreduce_mrjob_spark import registry  # noqa: E402
from recsys_mapreduce_mrjob_spark.session import session_builder  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def get_spark():
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        session_builder(master=f"local[{cpus}]", shuffle_partitions=int(cpus))
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def dump_plans(spark, sf_dir: str, names: list[str], tag: str) -> None:
    outdir = os.path.join(REPO, "plans", "r13")
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = registry.QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        n_ex = plan.count("Exchange")
        n_win = plan.count(" Window")
        print(f"{name}: {len(plan)} chars, Exchange~{n_ex}, Window~{n_win} -> {path}")


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def time_queries(spark, sf_dir: str, names: list[str], runs: int) -> None:
    for name in names:
        spark.sparkContext.setJobDescription(f"r13:{name}")
        spark.catalog.clearCache()
        noop(registry.QUERIES[name](spark, sf_dir))  # warmup
        samples = []
        for _ in range(runs):
            spark.catalog.clearCache()
            t0 = time.monotonic()
            noop(registry.QUERIES[name](spark, sf_dir))
            samples.append(round(time.monotonic() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        s = sorted(samples)
        print(
            f"{name}: min={s[0]} med={s[len(s) // 2]} all={samples}",
            flush=True,
        )


def job_counts(spark, sf_dir: str, names: list[str]) -> None:
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    for name in names:
        spark.catalog.clearCache()
        before = set(tracker.getJobIdsForGroup(None) or [])
        sc.setJobGroup(f"r13jc:{name}", name)
        t0 = time.monotonic()
        noop(registry.QUERIES[name](spark, sf_dir))
        wall = round(time.monotonic() - t0, 3)
        jobs = tracker.getJobIdsForGroup(f"r13jc:{name}") or []
        sc.setJobGroup(None, None)
        print(f"{name}: jobs={len(jobs)} wall={wall}", flush=True)


def main() -> None:
    mode = sys.argv[1]
    args = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = 5
    out = []
    i = 0
    tag = None
    while i < len(args):
        if args[i] == "--sf":
            sf_dir = args[i + 1]
            i += 2
        elif args[i] == "--runs":
            runs = int(args[i + 1])
            i += 2
        elif mode == "plans" and tag is None and args[i] in ("before", "after"):
            tag = args[i]
            i += 1
        else:
            out.append(args[i])
            i += 1
    spark = get_spark()
    registry.load_all()
    if mode == "plans":
        dump_plans(spark, sf_dir, out, tag or "before")
    elif mode == "time":
        time_queries(spark, sf_dir, out, runs)
    elif mode == "jobs":
        job_counts(spark, sf_dir, out)
    else:
        raise SystemExit(f"unknown mode {mode}")
    spark.stop()


if __name__ == "__main__":
    main()
