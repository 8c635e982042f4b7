#!/usr/bin/env python
"""Scale ladders for the round-7-born operators that lacked one
(VERDICT r7 #6): containment dedup, keyword extraction, BM25, SCD2
compaction, PII audit — each justified so far only by sub-second sf0.1
walls + fixed-floor brackets.

Reuses tools/bench_dedup_scale.py's content-disjoint K-copy machinery:
  - documents-table ops get K copies with every token TAGGED per copy
    (`tok` → `tok_kI`), so shingle vocabularies never collide — the
    candidate/pair population scales K×, never K²;
  - the SCD2 ladder gets K copies of `events` with user_id/event_id
    shifted to disjoint ranges (ts unchanged), so each user's run
    structure replicates and the dimension scales K×.

Each rung times the ENGINE (fresh plan per run, clearCache first — the
bench.py contract) against the registered DuckDB oracle (the exact twin
by construction) under the same best-of-N fetch contract, and reports
row-count parity per rung — linear-or-better growth plus matching counts
is the signature the BASELINE.md tables record.

Usage: python tools/bench_r7ops_scale.py [K ...]    (default 3 10)
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
DOC_OFF = 10_000_000
USER_OFF = 10_000_000
EV_OFF = 100_000_000
RUNS = 3

QUERIES = {
    "q_dedup_containment": "documents",
    "q_text_keywords": "documents",
    "q_text_bm25": "documents",
    "q_text_pii": "documents",
    "q_events_scd2": "events",
    # round-8-born: substring-span dedup — tagged copies keep shingle
    # vocabularies disjoint, so kept-shingle matches scale K×, never K².
    "q_dedup_spans": "documents",
    # round-9-born: the substring-REMOVAL pass.  clearCache between runs
    # means each timed run recomputes the FULL report → merge → cut
    # chain (the honest end-to-end cost, same convention as its input).
    "q_dedup_span_rewrite": "documents",
    # round-10-born: the hashed-feature quality classifier (the tagged
    # copies keep token vocabularies disjoint but the hashing trick folds
    # them into the SAME fixed 4096-bucket model — exactly the production
    # property the ladder should hold under) and the context-window
    # chunker (pure scan-side transform; the ladder pins zero-shuffle
    # linearity).
    "q_text_quality_classifier": "documents",
    "q_text_chunks": "documents",
}

# Optional single-query focus: bench_r7ops_scale.py K ... --only name



def build_scaled_documents(k: int, out_dir: str) -> None:
    """K content-disjoint document copies (see bench_dedup_scale.py)."""
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
    pq.write_table(
        pa.concat_tables(parts),
        f"{out_dir}/documents.parquet",
        row_group_size=5_000,
    )


def build_scaled_events(k: int, out_dir: str) -> None:
    """K user-disjoint event copies: user_id/event_id shift to disjoint
    ranges, ts unchanged — every user's run structure replicates, so the
    SCD2 dimension scales exactly K×."""
    ev = pq.read_table(f"{SRC}/events.parquet")
    parts = []
    for i in range(k):
        parts.append(
            pa.table(
                {
                    "event_id": pc.add(ev.column("event_id"), i * EV_OFF),
                    "ts": ev.column("ts"),
                    "user_id": pc.add(ev.column("user_id"), i * USER_OFF),
                    "event_type": ev.column("event_type"),
                    "value": ev.column("value"),
                    "props": ev.column("props"),
                }
            )
        )
    pq.write_table(
        pa.concat_tables(parts),
        f"{out_dir}/events.parquet",
        row_group_size=50_000,
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
    args = sys.argv[1:]
    only = None
    if "--only" in args:
        i = args.index("--only")
        only = args[i + 1]
        args = args[:i] + args[i + 2 :]
    ks = [int(a) for a in args] or [3, 10]
    queries = {only: QUERIES[only]} if only else QUERIES

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

    results: dict[int, dict] = {}
    for k in ks:
        base = tempfile.mkdtemp(prefix=f"r7ops_scale_{k}_")
        try:
            # Build only the tables the selected queries actually read —
            # the tagged-documents build is the tool's dominant cost and
            # --only q_events_scd2 shouldn't pay it (code-review r8).
            needed = set(queries.values())
            if "documents" in needed:
                build_scaled_documents(k, base)
            if "events" in needed:
                build_scaled_events(k, base)
            con = duckdb.connect()
            for t in sorted(needed):
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * "
                    f"FROM read_parquet('{base}/{t}.parquet')"
                )
            rung: dict[str, dict] = {}
            for name in queries:
                sql = registry.ORACLES[name]
                fn = registry.QUERIES[name]
                duck_rows = len(con.execute(sql).fetchdf())
                spark_rows = len(fn(spark, base).toPandas())

                t_duck, duck_runs = timed(lambda: con.execute(sql).fetchdf())

                def run_spark():
                    spark.catalog.clearCache()
                    fn(spark, base).toPandas()

                t_spark, spark_runs = timed(run_spark)
                rung[name] = {
                    "duck_rows": duck_rows,
                    "spark_rows": spark_rows,
                    "rows_match": duck_rows == spark_rows,
                    "duckdb_sec": t_duck,
                    "spark_sec": t_spark,
                    "spark_vs_duckdb": round(t_spark / t_duck, 3),
                    "duck_runs": duck_runs,
                    "spark_runs": spark_runs,
                }
                print(f"K={k} {name}: {json.dumps(rung[name])}", flush=True)
            con.close()
            results[k] = rung
        finally:
            shutil.rmtree(base, ignore_errors=True)
    print(json.dumps({"src": SRC, "duckdb": duckdb.__version__, "rungs": results}))
    spark.stop()


if __name__ == "__main__":
    main()
