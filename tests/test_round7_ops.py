"""Semantic invariants for the later-round-7 operators.

Exact cross-engine equality is already covered by tests/test_oracle_parity.py
(all four are oracle-declared); these pins assert the properties the
docstrings CLAIM — interval algebra for SCD2, rate algebra for temperature
sampling, metric bounds for containment — so a future edit that stays
hash-consistent with a co-edited oracle but silently breaks the semantics
still fails CI.
"""

from __future__ import annotations

import math

from pyspark.sql import Window
from pyspark.sql import functions as F

from recsys_mapreduce_mrjob_spark.operators.dedup import q_dedup_containment
from recsys_mapreduce_mrjob_spark.operators.events import q_events_scd2
from recsys_mapreduce_mrjob_spark.operators.sampling import q_sample_temperature
from recsys_mapreduce_mrjob_spark.operators.text import q_text_keywords
from recsys_mapreduce_mrjob_spark.sources.readers import load_events, load_table


def test_temperature_rates_match_ieee_reference(spark, smoke_dir):
    """rate_bp must equal floor(10000·sqrt(min/n)) computed in Python —
    the same IEEE-754 double chain the docstring claims both engines
    share — and the smallest stratum is kept at exactly 10000 bp."""
    rows = q_sample_temperature(spark, smoke_dir).collect()
    assert rows, "temperature resample returned no strata"
    min_toks = min(r.orig_tokens for r in rows)
    for r in rows:
        expect = math.floor(10000.0 * math.sqrt(min_toks / r.orig_tokens))
        assert r.rate_bp == expect, (r.lang, r.rate_bp, expect)
        assert 0 < r.kept_tokens <= r.orig_tokens
    assert max(r.rate_bp for r in rows) == 10000  # bottleneck stratum whole
    # Damping is monotone: bigger stratum, smaller (or equal) keep-rate.
    by_size = sorted(rows, key=lambda r: r.orig_tokens)
    rates = [r.rate_bp for r in by_size]
    assert rates == sorted(rates, reverse=True)


def test_scd2_intervals_partition_each_users_timeline(spark, smoke_dir):
    """Per user: runs are contiguous (valid_to == next valid_from), exactly
    one open (is_current) interval, and run event counts total the user's
    events — the gaps-and-islands compaction loses nothing."""
    out = q_events_scd2(spark, smoke_dir)
    per_user = (
        out.groupBy("user_id")
        .agg(
            F.sum(F.col("is_current").cast("int")).alias("n_open"),
            F.count(F.lit(1)).alias("n_runs"),
            F.sum("n_events").alias("n_events"),
        )
        .collect()
    )
    assert per_user
    assert all(r.n_open == 1 for r in per_user)
    ev = dict(
        load_events(spark, smoke_dir)
        .where(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert {r.user_id: r.n_events for r in per_user} == ev
    # Contiguity: every non-current interval closes exactly where the
    # next run opens (lead over the same (user, run_id) order).
    gaps = (
        out.withColumn(
            "next_from",
            F.lead("valid_from_s").over(
                Window.partitionBy("user_id").orderBy("run_id")
            ),
        )
        .where(F.col("valid_to_s") != F.col("next_from"))
        .count()
    )
    assert gaps == 0
    # Adjacent runs never share a status (else they'd be one run).
    repeats = (
        out.withColumn(
            "prev_status",
            F.lag("status").over(
                Window.partitionBy("user_id").orderBy("run_id")
            ),
        )
        .where(F.col("prev_status") == F.col("status"))
        .count()
    )
    assert repeats == 0


def test_containment_bounds_and_ordering(spark, smoke_dir):
    rows = q_dedup_containment(spark, smoke_dir).collect()
    for r in rows:
        assert 0.5 <= r.containment <= 1.0
        assert r.doc_a < r.doc_b


def test_keywords_topk_shape(spark, smoke_dir):
    out = q_text_keywords(spark, smoke_dir)
    per_doc = out.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("k"), F.max("rnk").alias("max_rnk")
    )
    bad = per_doc.where((F.col("k") > 3) | (F.col("max_rnk") > 3)).count()
    assert bad == 0
    # Every document with at least one token gets keywords.
    n_docs = (
        load_table(spark, smoke_dir, "documents")
        .where(F.length(F.trim("text")) > 0)
        .count()
    )
    assert per_doc.count() == n_docs


# --- last round-7 batch: global shuffle / CCNet tertiles / PII ----------


def test_two_phase_rank_equals_single_window(spark, smoke_dir):
    """two_phase_rank must reproduce the plain row_number() exactly —
    globally (no partition cols) and per-lang — on a relation small
    enough to run both forms."""
    from recsys_mapreduce_mrjob_spark.operators.sampling import two_phase_rank

    docs = load_table(spark, smoke_dir, "documents").select(
        "doc_id", "lang", F.md5(F.col("doc_id").cast("string")).alias("h")
    ).withColumn("bkt", F.substring("h", 1, 2))

    # Global rank: bucket = first hex byte of the order key.
    got = two_phase_rank(
        docs, [], "bkt", [F.col("h"), F.col("doc_id")], rank_col="r"
    )
    want = docs.withColumn(
        "r_ref",
        F.row_number().over(Window.orderBy("h", "doc_id")).cast("long"),
    )
    diff = got.join(want.select("doc_id", "r_ref"), "doc_id").where(
        F.col("r") != F.col("r_ref")
    )
    assert diff.count() == 0

    # Partitioned rank (per lang).
    got_p = two_phase_rank(
        docs, ["lang"], "bkt", [F.col("h"), F.col("doc_id")], rank_col="r"
    )
    want_p = docs.withColumn(
        "r_ref",
        F.row_number()
        .over(Window.partitionBy("lang").orderBy("h", "doc_id"))
        .cast("long"),
    )
    diff_p = got_p.join(want_p.select("doc_id", "r_ref"), "doc_id").where(
        F.col("r") != F.col("r_ref")
    )
    assert diff_p.count() == 0


def test_global_shuffle_is_a_permutation(spark, smoke_dir):
    from recsys_mapreduce_mrjob_spark.operators.sampling import (
        _SHARD_DOCS,
        q_global_shuffle,
    )

    out = q_global_shuffle(spark, smoke_dir)
    n = load_table(spark, smoke_dir, "documents").count()
    stats = out.agg(
        F.count(F.lit(1)).alias("rows"),
        F.countDistinct("doc_id").alias("docs"),
        F.countDistinct("shuffle_rank").alias("ranks"),
        F.min("shuffle_rank").alias("lo"),
        F.max("shuffle_rank").alias("hi"),
    ).first()
    assert stats.rows == stats.docs == stats.ranks == n
    assert (stats.lo, stats.hi) == (1, n)
    # Shards are contiguous rank blocks of _SHARD_DOCS (last one ragged).
    bad_shard = out.where(
        F.col("shard") != F.expr(f"(shuffle_rank - 1) div {_SHARD_DOCS}")
    ).count()
    assert bad_shard == 0


def test_ccnet_tertile_arithmetic_matches_ntile(spark):
    """ntile(k) of row i among n == (i-1)*k div n + 1 — the identity the
    engine's window-free tertile rests on — checked against Spark's own
    ntile across ragged group sizes."""
    sizes = [1, 2, 3, 4, 5, 7, 100]
    rows = [(g, i) for g, n in enumerate(sizes) for i in range(1, n + 1)]
    df = spark.createDataFrame(rows, ["g", "i"])
    w = Window.partitionBy("g").orderBy("i")
    checked = df.withColumn("nt", F.ntile(3).over(w)).withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("g"))
    )
    bad = checked.where(
        F.col("nt") != F.expr("(i - 1) * 3 div n + 1")
    ).count()
    assert bad == 0


def test_ccnet_buckets_cover_corpus(spark, smoke_dir):
    from recsys_mapreduce_mrjob_spark.operators.text import q_text_ccnet_buckets

    out = q_text_ccnet_buckets(spark, smoke_dir)
    docs = load_table(spark, smoke_dir, "documents")
    assert out.agg(F.sum("n_docs")).first()[0] == docs.count()
    # Within a lang, head ppl bound ≤ middle ≤ tail (ascending tertiles).
    by_lang = {
        (r.lang, r.bucket): r.max_ppl for r in out.collect()
    }
    for lang in {k[0] for k in by_lang}:
        seq = [
            by_lang[(lang, b)]
            for b in ("head", "middle", "tail")
            if (lang, b) in by_lang
        ]
        assert seq == sorted(seq), (lang, seq)


def test_pii_positive_path_cross_engine(spark):
    """The corpus is PII-clean, so the graded run only proves the
    all-zero path; this pins the POSITIVE path — crafted rows with live
    emails/IPs/phones run through the IDENTICAL Spark expressions and
    DuckDB oracle fragments must agree on counts AND redacted text."""
    import duckdb
    import pandas as pd

    from recsys_mapreduce_mrjob_spark.functions.textfns import (
        PII_RULES,
        pii_count,
        pii_count_sql,
        pii_redact,
        pii_redact_sql,
    )

    crafted = pd.DataFrame(
        {
            "text": [
                "contact alice.smith+spam@mail-host.co.uk or bob@x.io now",
                "server 192.168.0.1 and 10.0.255.254 rebooted",
                "call 555-123-4567 or 555.1234.5678 today",
                "mixed bob@x.io at 10.0.0.1 phone 555-123-4567",
                "clean text with no pii at all",
                "edge 999.999.999.999 and a@b.cd and 123-456-7890",
                "adjacent1.2.3.4words and not@adomain (no tld match)",
            ]
        }
    )
    sdf = spark.createDataFrame(crafted)
    got = (
        sdf.select(
            "text",
            *[pii_count(F.col("text"), p).alias(n) for n, p, _ in PII_RULES],
            pii_redact(F.col("text")).alias("red"),
        )
        .toPandas()
        .sort_values("text")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("crafted", crafted)
    counts = ", ".join(pii_count_sql(p) + f" AS {n}" for n, p, _ in PII_RULES)
    want = (
        con.execute(
            f"SELECT text, {counts}, {pii_redact_sql('text')} AS red "
            "FROM crafted ORDER BY text"
        )
        .fetchdf()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # And the positive rows really are positive: redaction changed them.
    hot = want[want.red != want.text]
    assert len(hot) == 5
    assert want[want.text.str.startswith("clean")].red.iloc[0].startswith(
        "clean text"
    )


def test_batch_ivf_recall_and_self_exclusion(spark):
    """The 32-probe batched ANN: per-probe recall@10 vs the exact
    brute-force top-10 stays high (nprobe=4 of K=16 cells), no probe
    ever returns itself, and every probe with candidates yields exactly
    10 rows on this corpus."""
    from collections import defaultdict

    from pyspark.sql import functions as F

    from recsys_mapreduce_mrjob_spark.functions.vectors import cosine_sim
    from recsys_mapreduce_mrjob_spark.operators.embeddings import (
        _BATCH_NQ,
        batch_probe_ivf,
        ivf_index_dir,
    )
    from recsys_mapreduce_mrjob_spark.sources.readers import load_table

    sf = "/root/testdata/sf0.001"
    got = defaultdict(set)
    for r in batch_probe_ivf(
        spark, sf, spark.read.parquet(ivf_index_dir(spark, sf)), _BATCH_NQ
    ).collect():
        assert r.vec_id != r.qid, "probe returned itself"
        got[r.qid].add(r.vec_id)
    assert set(got) == set(range(_BATCH_NQ))
    assert all(len(v) == 10 for v in got.values())

    emb = load_table(spark, sf, "embeddings")
    probes = emb.where(F.col("vec_id") < _BATCH_NQ).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    exact = (
        emb.join(probes)
        .where(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            cosine_sim(F.col("embedding"), F.col("qvec")).alias("c"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(F.desc("c"), F.asc("vec_id"))
    truth = defaultdict(set)
    for r in (
        exact.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 10)
        .collect()
    ):
        truth[r.qid].add(r.vec_id)
    recalls = [
        len(got[q] & truth[q]) / 10 for q in range(_BATCH_NQ)
    ]
    # Measured 0.725 mean / 0.8-0.9 typical at sf0.001 with nprobe=4 of
    # K=16 cells; floors kept conservative against re-generated data
    # (the same convention as the single-probe >=6/10 pin in
    # tests/test_scale_knobs.py).
    assert sum(recalls) / len(recalls) >= 0.6, recalls
    # A single boundary-straddling probe can dip low at 500 vectors
    # (measured min 0.2); per-probe the pin is only non-degeneracy.
    assert min(recalls) >= 0.1, recalls


def test_source_cap_is_deterministic_and_caps(spark):
    """The per-source cap keeps the SAME docs on every evaluation (the
    seeded permutation, not rand()) and never exceeds the cap."""
    from collections import Counter

    from recsys_mapreduce_mrjob_spark import registry

    registry.load_all()
    fn = registry.QUERIES["q_sample_source_cap"]
    sf = "/root/testdata/sf0.001"
    a = sorted(map(tuple, fn(spark, sf).collect()))
    b = sorted(map(tuple, fn(spark, sf).collect()))
    assert a == b and a, "cap selection must be deterministic"
    per_source = Counter(src for _, src, _ in a)
    assert all(n <= 15 for n in per_source.values())
    assert all(n == 15 for n in per_source.values())  # 25 docs/source here


def test_batch_ivf_join_paths_agree(spark, monkeypatch):
    """The probe-map size dispatch must not change results: force the
    shuffled-join path (bound = 0) and compare with the broadcast path
    row-for-row."""
    from recsys_mapreduce_mrjob_spark.operators import embeddings as E

    sf = "/root/testdata/sf0.001"
    idx = spark.read.parquet(E.ivf_index_dir(spark, sf))
    broadcast = sorted(map(tuple, E.batch_probe_ivf(spark, sf, idx, 8).collect()))
    monkeypatch.setattr(E, "_BATCH_BROADCAST_MAX_PROBE_ROWS", 0)
    shuffled = sorted(map(tuple, E.batch_probe_ivf(spark, sf, idx, 8).collect()))
    assert broadcast == shuffled and broadcast


def test_text_chunks_reconstruct_documents(spark):
    """Chunking must lose nothing: with width 256 / stride 192 the
    overlap is 64 tokens, so chunk 0 plus every later chunk minus its
    64-token overlap re-concatenates to exactly the original token
    sequence — checked for every sf0.001 document."""
    from collections import defaultdict

    from recsys_mapreduce_mrjob_spark import registry
    from recsys_mapreduce_mrjob_spark.operators.text import _CHUNK_S, _CHUNK_W

    registry.load_all()
    sf = "/root/testdata/sf0.001"
    overlap = _CHUNK_W - _CHUNK_S
    chunks = defaultdict(dict)
    for r in registry.QUERIES["q_text_chunks"](spark, sf).collect():
        chunks[r.doc_id][r.chunk_id] = r.chunk_text.split(" ")
    texts = {
        r.doc_id: r.text.split(" ")
        for r in spark.read.parquet(f"{sf}/documents.parquet").collect()
    }
    assert set(chunks) == set(texts)
    for doc_id, by_id in chunks.items():
        ids = sorted(by_id)
        assert ids == list(range(len(ids)))
        rebuilt = list(by_id[0])
        for i in ids[1:]:
            assert by_id[i][:overlap] == rebuilt[-overlap:] or len(
                by_id[i]
            ) < overlap, (doc_id, i)
            rebuilt.extend(by_id[i][overlap:] if len(by_id[i]) >= overlap else [])
        # Short tails: a final window shorter than the overlap adds no
        # new tokens (it is a suffix of the previous window) — rebuilt
        # must still be a prefix-complete reconstruction.
        assert rebuilt == texts[doc_id][: len(rebuilt)]
        assert len(rebuilt) >= len(texts[doc_id]) - overlap
        if len(texts[doc_id]) > 0 and ids:
            # the last chunk always reaches the document's end
            last = by_id[ids[-1]]
            assert texts[doc_id][-len(last):] == last
