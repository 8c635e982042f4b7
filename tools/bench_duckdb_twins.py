"""Measure the DuckDB baseline twins for the LLM-pipeline headline rows.

BASELINE.md's round-2 table covers the relational/recsys headline queries;
round 3 adds three LLM-pipeline queries to bench.py's headline set
(`q_text_tfidf`, `q_dedup_near`, `q_knn_cosine_ivf`), so their scale
claims get measured numbers against an independent engine rather than
docstring assertions.

For the two exact-oracle queries the twin IS the registered oracle SQL
(identical semantics by construction).  `q_dedup_near` is rows-only (its
minhashes are Spark `xxhash64`, which DuckDB lacks), so its twin is the
same MinHash-LSH pipeline — each distinct 3-shingle hashed to a long
once, 32 min-hashes derived by re-hashing the long (mirrors the round-5
engine kernel), 8 bands x 4 rows, band-signature equi-join candidates,
Jaccard verification on the hashed sets at >= 0.8 — written with
DuckDB's own `hash()`: identical work shape and candidate-generation
strategy, engine-native hash.

Contract matches BASELINE.md (round 5): warm run first, then best-of-5
timed `fetchdf()` runs on one connection — the DataFrame-fetch API, the
symmetric twin of bench.py's Spark `toPandas()` (both engines materialize
the full result on the caller as a columnar frame; round 2-3 timed
`fetchall()` vs Spark's row-pickling `collect()`, which graded ~1s of
Py4J row serialization on the 169k-row flagship as if it were query
time on one engine only).

Run:  python tools/bench_duckdb_twins.py  [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from recsys_mapreduce_mrjob_spark import registry  # noqa: E402
from recsys_mapreduce_mrjob_spark.sources.readers import TESTDATA_TABLES  # noqa: E402

# Same MinHash-LSH shape as operators/dedup.py::q_dedup_near, DuckDB-native.
DEDUP_NEAR_TWIN = """
WITH toklists AS (
    SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
idx AS (
    SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i FROM toklists
),
sh AS (
    SELECT DISTINCT doc_id, hash(array_to_string(t[i:i+2], ' ')) AS hs FROM idx
),
seeds AS (SELECT unnest(generate_series(0, 31)) AS seed),
minhash AS (
    SELECT doc_id, seed, min(hash(hs, seed)) AS mh
    FROM sh CROSS JOIN seeds
    GROUP BY doc_id, seed
),
bands AS (
    SELECT doc_id, seed // 4 AS band,
           hash(string_agg(mh::VARCHAR, ',' ORDER BY seed)) AS bsig
    FROM minhash
    GROUP BY doc_id, seed // 4
),
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
    SELECT c.doc_a, c.doc_b, count(*) AS n_common
    FROM cand c
    JOIN sh a ON a.doc_id = c.doc_a
    JOIN sh b ON b.doc_id = c.doc_b AND b.hs = a.hs
    GROUP BY c.doc_a, c.doc_b
)
SELECT i.doc_a, i.doc_b,
       i.n_common / CAST(sa.n_sh + sb.n_sh - i.n_common AS DOUBLE) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_b
WHERE i.n_common / CAST(sa.n_sh + sb.n_sh - i.n_common AS DOUBLE) >= 0.8
"""


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    registry.load_all()

    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    # The full bench headline set (bench.py): every exact-oracle query's
    # twin IS its registered oracle SQL — re-measured each round so the
    # baseline tracks current box conditions and the CURRENT oracle
    # formulation (round 2's flagship row timed a heavier variant that
    # scored all 13.1M pairs before pruning; the registered oracle prunes
    # at n>=2 first).
    twins = {
        name: registry.ORACLES[name]
        for name in (
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
            "q_knn_cosine_ivf",
            "q_dedup_embedding",
            # round 6: the LLM-pipeline composites (LSH + fixpoint
            # two-star components; curation chains the full ladder)
            "q_corpus_curation",
            "q_dedup_components_twostar",
            # round 7 (VERDICT r6 #3/#5): the r6 operators that had
            # correctness rows but no bench rows, plus the persisted-
            # index IVF (twin = the shared IVF oracle)
            "q_join_bloom",
            "q_skew_profile",
            "q_mixture_resample",
            "q_pack_blocks",
            "q_knn_cosine_ivf_indexed",
            # round 7 (later session): the four new operators
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
            # round 8: the graded text-source pair + substring-span dedup
            "q_scan_csv_ratings",
            "q_scan_csv_quoted",
            "q_dedup_spans",
            # round 9: the substring-REMOVAL pass (twin = oracle: span
            # report → interval merge → positional token cut)
            "q_dedup_span_rewrite",
            # round 10: the batched ANN probe (one pruned index scan for
            # 32 probes) and the export capstone with the span-removal
            # layer composed in
            "q_knn_batch_ivf",
            "q_export_manifest_rewritten",
            # round 10 (later session): semantic-dedup keep-one and the
            # per-source frequency cap
            "q_dedup_semantic",
            "q_sample_source_cap",
            "q_text_chunks",
            # round 10 (late): degree-oriented triangle counting
            "q_graph_triangles",
            # round 10 (this session): hashed-feature quality classifier
            "q_text_quality_classifier",
            # round 11: the chunk-level export capstone (twin = curation
            # CTEs + chunk cut + the two global windows the engine
            # replaces with bucket-parallel scans)
            "q_export_chunks",
            # round 12: the RELEASE capstone (twin = curation CTEs +
            # contamination CTEs + redaction chain + chunk/export
            # algebra — the full chained oracle)
            "q_export_release",
        )
    }
    twins["q_dedup_near"] = DEDUP_NEAR_TWIN
    out = {}
    for name, sql in twins.items():
        rows = len(con.execute(sql).fetchdf())  # warm run
        samples = []
        for _ in range(5):
            t0 = time.monotonic()
            con.execute(sql).fetchdf()
            samples.append(round(time.monotonic() - t0, 3))
        out[name] = {"sec": min(samples), "rows": rows, "runs": samples}
    print(json.dumps({"sf_dir": sf_dir, "duckdb": duckdb.__version__, "twins": out}))


if __name__ == "__main__":
    main()
