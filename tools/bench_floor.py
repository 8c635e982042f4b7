#!/usr/bin/env python
"""Measure each headline query's FIXED per-query floor directly
(VERDICT r6 #7): the same plan driven to a full ``toPandas()`` against
EMPTY inputs — identical schemas, zero rows — so the measurement
contains no data work at all, only what local-mode Spark charges for
existing: Py4J plan construction, analysis/optimization, stage
scheduling, task launch, Arrow fetch setup.

This is the denominator the 2×-of-DuckDB grading argument needs on
sub-100 ms baselines: `bench.py`'s `overhead_sec` (same plan at
sf0.001) still includes residual small-scale data work and so
OVERSTATES data-dependent cost at sf0.1; the empty-input floor is the
true fixed cost, and `wall − floor` is a defensible data-work estimate.
Both are published in BASELINE.md so the adjusted ratios bracket the
truth from both sides.

Eager-build caveat: queries that run constant-size driver-side lookups
at build time (the IVF probe, the kmeans init) pay those jobs here too
— that is correct, they ARE fixed per-query cost.

Usage: python tools/bench_floor.py          # writes one JSON line to stdout
"""

from __future__ import annotations

import atexit
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from recsys_mapreduce_mrjob_spark import registry  # noqa: E402
from recsys_mapreduce_mrjob_spark.session import session_builder  # noqa: E402
from recsys_mapreduce_mrjob_spark.sources.readers import (  # noqa: E402
    TESTDATA_TABLES,
    load_table,
)

# Mirrors bench.py's headline list (only queries registered there get a
# floor row; keep in sync when the headline set grows).
HEADLINE = [
    "q_agg_pricing_summary",
    "q_join_agg_q3",
    "q_join_broadcast",
    "q_window_topk_per_group",
    "q_window_tumbling",
    "q_topk_similar_items",
    "q_knn_cosine",
    "q_dedup_exact",
    "q_text_wordcount",
    "q_text_tfidf",
    "q_dedup_near",
    "q_knn_cosine_ivf",
    "q_knn_cosine_ivf_indexed",
    "q_dedup_embedding",
    "q_corpus_curation",
    "q_dedup_components_twostar",
    "q_join_bloom",
    "q_skew_profile",
    "q_mixture_resample",
    "q_pack_blocks",
    # round 7 (later session): the four new headline rows
    "q_sample_temperature",
    "q_dedup_containment",
    "q_text_keywords",
    "q_events_scd2",
    # round 7 (last batch): shuffle / ccnet tertiles / pii
    "q_global_shuffle",
    "q_text_ccnet_buckets",
    "q_text_pii",
    "q_pack_shuffled",
    "q_export_manifest",
]


def make_empty_dataset(spark, src_dir: str) -> str:
    """Write zero-row parquet copies of every testdata table (schemas
    read from ``src_dir``'s footers — no data scan)."""
    out = tempfile.mkdtemp(prefix="bench_floor_empty_")
    atexit.register(shutil.rmtree, out, ignore_errors=True)
    for t in TESTDATA_TABLES:
        df = load_table(spark, src_dir, t)
        df.limit(0).coalesce(1).write.parquet(f"{out}/{t}.parquet")
    return out


def main() -> None:
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        session_builder(master=f"local[{cpus}]", shuffle_partitions=int(cpus))
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry.load_all()
    empty = make_empty_dataset(spark, src)

    floors = {}
    for name in HEADLINE:
        if name not in registry.QUERIES:
            continue
        fn = registry.QUERIES[name]
        spark.catalog.clearCache()
        fn(spark, empty).toPandas()  # warmup (JIT, first-plan costs)
        samples = []
        for _ in range(5):
            spark.catalog.clearCache()
            t0 = time.monotonic()
            fn(spark, empty).toPandas()
            samples.append(round(time.monotonic() - t0, 3))
        floors[name] = min(samples)
    print(json.dumps({"metric": "empty_input_floor_sec", "floors": floors}))
    spark.stop()


if __name__ == "__main__":
    main()
