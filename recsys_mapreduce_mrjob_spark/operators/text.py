"""Text analysis over the documents table (SURVEY.md §2.2.K).

North-star extension: the text half of an LLM training-data pipeline —
tokenization, corpus statistics, TF-IDF weighting, token/quality scoring.
Everything is built on :mod:`..functions.textfns`' Catalyst expressions
(whitespace tokenizer, quality heuristics): string → array → explode →
relational aggregation, never a Python UDF, so the same plan that handles
500 docs handles 100 TB of them — the explode shuffles on the token, and
token-frequency aggregation gets map-side partial aggregation exactly like
any other groupBy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.textfns import (
    _LANG_MARKERS,
    PII_RULES,
    lang_id,
    pii_count,
    pii_count_sql,
    pii_redact,
    pii_redact_sql,
    quality_score,
    shingles,
    token_count,
    tokens,
)
from ..caching import memo_checkpoint, memo_persist, memo_process
from ..registry import register
from ..sources.readers import load_table, rebalance_if_starved


# DuckDB-side tokenizer matching functions.textfns.tokens: split on spaces,
# drop empties (documents.text is clean space-separated — FIXTURES.md §A).
_TOKS_CTE = """
toks AS (
    SELECT doc_id, tok
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
    WHERE tok <> ''
)
"""


@register(
    "q_text_wordcount",
    oracle=f"""
WITH {_TOKS_CTE}
SELECT tok AS word, count(*) AS n
FROM toks
GROUP BY tok
ORDER BY n DESC, word ASC
LIMIT 20
""",
)
def q_text_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical wordcount, columnar: explode(tokens) → count → top-20
    (deterministic tie-break on the word)."""
    docs = rebalance_if_starved(load_table(spark, sf_dir, "documents"))
    return (
        docs.select(F.explode(tokens(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(20)
    )


@register(
    "q_text_doc_stats",
    oracle="""
SELECT lang,
       count(*) AS n_docs,
       round(avg(n_chars), 6) + 0.0 AS avg_chars,
       count(DISTINCT source) AS n_sources
FROM documents
GROUP BY lang
""",
)
def q_text_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus stats — the first query any corpus audit runs."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.round(F.avg("n_chars"), 6) + F.lit(0.0)).alias("avg_chars"),
        F.count_distinct("source").alias("n_sources"),
    )


def _tf_relation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Memoized per-(doc, term) count relation ``(doc_id, n_toks, tok,
    tc)`` — ONE tokenize scan + one doc_id-clustered aggregate shared by
    every consumer (q_text_tfidf's df/score fan-out AND
    q_text_keywords; code-review r7: keywords initially built a second
    corpus-scale memo that was a strict subset of this one)."""

    def build_tf() -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        toks = (
            docs.repartition("doc_id")
            .select("doc_id", tokens(F.col("text")).alias("toks"))
            .select(
                "doc_id",
                F.size("toks").alias("n_toks"),
                F.explode("toks").alias("tok"),
            )
        )
        return toks.groupBy("doc_id", "n_toks", "tok").agg(
            F.count(F.lit(1)).alias("tc")
        )

    return memo_persist(spark, "tfidf_tf", sf_dir, build_tf)


@register(
    "q_text_tfidf",
    oracle=f"""
WITH {_TOKS_CTE},
tf AS (
    SELECT doc_id, tok, count(*) AS tc
    FROM toks GROUP BY doc_id, tok
),
doclen AS (
    SELECT doc_id, sum(tc) AS n_toks FROM tf GROUP BY doc_id
),
df AS (
    SELECT tok, count(*) AS docs_with FROM tf GROUP BY tok
),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
    SELECT tf.doc_id, tf.tok,
           round((tf.tc / CAST(doclen.n_toks AS DOUBLE))
                 * ln(CAST(n.n_docs AS DOUBLE) / df.docs_with), 6) + 0.0
               AS tfidf
    FROM tf
    JOIN doclen USING (doc_id)
    JOIN df USING (tok)
    CROSS JOIN n
)
SELECT doc_id, tok AS term, tfidf
FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, tok ASC) AS rn
      FROM scored)
WHERE rn <= 5
""",
)
def q_text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF, pure-relational: tf = term_count/doc_len, idf = ln(N/df),
    top-5 terms per doc (ranked on the ROUNDED weight, term tie-break).

    Expressed as one aggregation + broadcast joins rather than MLlib's
    HashingTF/IDF so the arithmetic is exactly oracle-checkable; the df
    and N relations are tiny (vocabulary-sized / scalar) and broadcast.

    Round-5 single-partitioning shape: the doc length is ``size(toks)``
    carried THROUGH the explode as a grouping constant — no doc-length
    aggregation and no doc_id join at all — and the corpus is hash-
    repartitioned on ``doc_id`` once, BEFORE the explode (ships the raw
    text rows, not the exploded tokens).  ``HashPartitioning(doc_id)``
    satisfies the (doc_id, n_toks, tok) aggregate's clustered-
    distribution requirement, so the TF build has exactly ONE exchange
    of the corpus and a no-shuffle partial+final aggregate.  Remaining
    exchanges are all small: the vocabulary-sized df aggregate, the
    scalar N, and the window's post-partial-limit exchange (≤5 rows per
    doc survive the partial ``WindowGroupLimit``; the cached plan's
    AQE wrapper hides its partitioning from the outer window, so Spark
    re-ships the limited rows rather than nothing — measured noise).

    The tf relation still fans into two lazy branches (document
    frequencies, the scored base); persisted via the session memo so the
    corpus is tokenized once.

    Round 7: the corpus size N feeding the idf is a driver-side parquet-
    footer read (``parquet_num_rows`` — catalog statistics on a real
    cluster), not a count job + broadcast join: one fewer job and one
    fewer exchange, measured −18% wall at sf0.1 (0.70 → 0.58 s).  The
    count-job + broadcast form remains the fallback when no footer is
    readable (directory-shaped datasets).
    """
    from ..sources.readers import parquet_num_rows

    docs = load_table(spark, sf_dir, "documents")
    tf = _tf_relation(spark, sf_dir)
    df = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("docs_with"))
    n = parquet_num_rows(sf_dir, "documents")
    base = tf.join(F.broadcast(df), "tok")
    if n is not None:
        idf_n = F.lit(float(n))
    else:
        n_docs = docs.select(F.count(F.lit(1)).alias("n_docs"))
        base = base.join(F.broadcast(n_docs))
        idf_n = F.col("n_docs").cast("double")
    scored = base.select(
        "doc_id",
        F.col("tok").alias("term"),
        (
            F.round(
                (F.col("tc") / F.col("n_toks").cast("double"))
                * F.log(idf_n / F.col("docs_with")),
                6,
            )
            + F.lit(0.0)
        ).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .select("doc_id", "term", "tfidf")
    )


@register(
    "q_text_token_stats",
    oracle=f"""
WITH {_TOKS_CTE},
per_doc AS (
    SELECT doc_id, count(*) AS n_tokens, count(DISTINCT tok) AS n_distinct
    FROM toks GROUP BY doc_id
)
SELECT d.doc_id, d.lang, p.n_tokens, p.n_distinct,
       round(p.n_distinct / CAST(p.n_tokens AS DOUBLE), 6) + 0.0
           AS distinct_ratio,
       round(length(replace(d.text, ' ', '')) / CAST(p.n_tokens AS DOUBLE), 6) + 0.0
           AS mean_token_len
FROM documents d JOIN per_doc p USING (doc_id)
""",
)
def q_text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-level quality signals per document: token counts, vocabulary
    diversity (repetition detector), mean token length — the cheap
    filters an LLM data pipeline applies before anything expensive."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    n_tokens = token_count(F.col("text")).cast("long")
    n_distinct = F.size(F.array_distinct(toks)).cast("long")
    return docs.select(
        "doc_id",
        "lang",
        n_tokens.alias("n_tokens"),
        n_distinct.alias("n_distinct"),
        (F.round(n_distinct / n_tokens.cast("double"), 6) + F.lit(0.0)).alias(
            "distinct_ratio"
        ),
        (
            F.round(
                F.length(F.regexp_replace(F.col("text"), " ", ""))
                / n_tokens.cast("double"),
                6,
            )
            + F.lit(0.0)
        ).alias("mean_token_len"),
    )


@register(
    "q_text_quality",
    oracle=f"""
WITH {_TOKS_CTE},
per_doc AS (
    SELECT doc_id, count(*) AS n, count(DISTINCT tok) AS nd
    FROM toks GROUP BY doc_id
),
parts AS (
    SELECT d.doc_id,
           length(replace(d.text, ' ', '')) / CAST(p.n AS DOUBLE) AS mean_len,
           length(regexp_replace(d.text, '[^A-Za-z ]', '', 'g'))
               / CAST(length(d.text) AS DOUBLE) AS alpha_ratio,
           p.nd / CAST(p.n AS DOUBLE) AS distinct_ratio
    FROM documents d JOIN per_doc p USING (doc_id)
)
SELECT doc_id,
       round(((CASE WHEN mean_len >= 3 AND mean_len <= 10 THEN 1.0 ELSE 0.0 END)
              + alpha_ratio + distinct_ratio) / 3.0, 6) + 0.0 AS quality
FROM parts
""",
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite document-quality heuristic (mean-token-length band, alpha
    ratio, repetition penalty) — the cheap pre-filter an LLM data pipeline
    runs before any model-based scoring.  Pure Catalyst expressions
    (functions/textfns.quality_score), exact-oracle-checked."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        (quality_score(F.col("text")) + F.lit(0.0)).alias("quality"),
    )


# Mirror of functions/textfns.lang_id tie-breaking: Spark's array_max over
# (score, lang) structs breaks score ties by the LARGEST lang string, so the
# oracle CASE tests languages in descending lexicographic order.
_LANGS_DESC = sorted(_LANG_MARKERS, reverse=True)


def _langid_cte() -> str:
    """DuckDB CTE chain ending in ``langpred(doc_id, lang_pred)`` —
    shared by the standalone lang-ID oracle and the curation composite."""
    score_exprs = []
    for lang, markers in _LANG_MARKERS.items():
        hits = " + ".join(
            f"CAST(list_contains(toklist, '{m}') AS INT)" for m in markers
        )
        score_exprs.append(f"({hits}) / {len(markers)}.0 AS s_{lang}")
    scores = ",\n           ".join(score_exprs)
    greatest = ", ".join(f"s_{lang}" for lang in _LANG_MARKERS)
    cases = "\n                ".join(
        f"WHEN s_{lang} = m THEN '{lang}'" for lang in _LANGS_DESC
    )
    return f"""
langid_scored AS (
    SELECT doc_id,
           {scores}
    FROM (SELECT doc_id, string_split(lower(text), ' ') AS toklist FROM documents)
),
langid_best AS (
    SELECT *, greatest({greatest}) AS m FROM langid_scored
),
langpred AS (
    SELECT doc_id,
           CASE WHEN m <= 0 THEN 'und'
                {cases}
                ELSE 'und' END AS lang_pred
    FROM langid_best
)
"""


@register(
    "q_text_langid",
    oracle=f"WITH {_langid_cte()} SELECT doc_id, lang_pred FROM langpred",
)
def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID: marker-word hit rate per language, argmax
    with deterministic tie-breaks ('und' when nothing matches).  The
    n-gram-free stand-in for fastText-style LID, all JVM-side."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", lang_id(F.col("text")).alias("lang_pred"))


_CURATION_QUALITY_MIN = 0.8

# Near-dup stage of the curation composite (round 6, VERDICT r5 #6): the
# portable-hash MinHash-LSH pair CTEs plus the SHARED recursive-CTE
# component walk (dedup.component_walk_ctes — label = min doc_id
# reachable over the symmetric pair relation, i.e. exactly the two-star
# fixpoint the Spark side computes).  A doc is a near-dup NON-keeper iff
# its component label differs from its own id; those are dropped from
# the curated corpus.
from .dedup import _NEAR_EXACT_CTES as _CURATION_NEAR_PAIR_CTES  # noqa: E402
from .dedup import component_walk_ctes as _component_walk_ctes  # noqa: E402

# Pair relation + component walk only — the non-keeper derivation moved
# BELOW the gate CTEs (r8 keeper-semantics fix, VERDICT r7 "what's wrong"
# #1): the keeper of each near-dup cluster is now the min doc_id among
# GATE SURVIVORS in that cluster, so a cluster whose global-min doc fails
# the quality/lang/exact-dedup gates no longer vanishes wholesale.
_CURATION_NEAR_CTES = f"""{_CURATION_NEAR_PAIR_CTES},
{_component_walk_ctes("near_")}"""


# The full curation CTE chain through the final `curated` relation —
# ONE definition feeding q_corpus_curation AND q_export_manifest (the
# single-source discipline; a semantics drift between the two oracles
# would silently decouple the pipeline stages).  Body is verbatim the
# r6-graded q_corpus_curation oracle with its final WHERE folded into
# the `curated` CTE.
_CURATION_CTES = f"""{_CURATION_NEAR_CTES},
{_TOKS_CTE},
{_langid_cte().strip()},
per_doc AS (
    SELECT doc_id, count(*) AS n, count(DISTINCT tok) AS nd
    FROM toks GROUP BY doc_id
),
quality AS (
    SELECT p.doc_id,
           round(((CASE WHEN length(replace(d.text, ' ', '')) / CAST(p.n AS DOUBLE)
                             BETWEEN 3 AND 10 THEN 1.0 ELSE 0.0 END)
                  + length(regexp_replace(d.text, '[^A-Za-z ]', '', 'g'))
                        / CAST(length(d.text) AS DOUBLE)
                  + p.nd / CAST(p.n AS DOUBLE)) / 3.0, 6) + 0.0 AS quality
    FROM documents d JOIN per_doc p USING (doc_id)
),
kept AS (
    SELECT d.doc_id, d.text, q.quality, l.lang_pred, p.n AS n_tokens
    FROM documents d
    JOIN quality q USING (doc_id)
    JOIN langpred l USING (doc_id)
    JOIN per_doc p USING (doc_id)
    WHERE q.quality >= {_CURATION_QUALITY_MIN}
      AND l.lang_pred <> 'und'
),
deduped AS (
    SELECT *, row_number() OVER (PARTITION BY md5(text)
                                 ORDER BY doc_id) AS rn
    FROM kept
),
near_surv AS (
    SELECT l.id, l.label
    FROM near_labels l JOIN deduped d ON l.id = d.doc_id AND d.rn = 1
),
near_keeper AS (SELECT label, min(id) AS keeper FROM near_surv GROUP BY label),
near_nonkeepers AS (
    SELECT s.id AS doc_id
    FROM near_surv s JOIN near_keeper k USING (label)
    WHERE s.id <> k.keeper
),
curated AS (
    SELECT doc_id, lang_pred, quality, n_tokens
    FROM deduped
    WHERE rn = 1
      AND doc_id NOT IN (SELECT doc_id FROM near_nonkeepers)
)"""


def curated_docs(
    spark: SparkSession, sf_dir: str, truncate: bool = False
) -> DataFrame:
    """The curated corpus — (doc_id, lang_pred, quality, n_tokens) after
    the quality → language-ID → exact-dedup keep-one → near-dup-cluster
    keep-one ladder.  Memoized: q_corpus_curation's per-lang accounting
    and q_export_manifest's shuffle+pack both consume it; the near-dup
    stage underneath is the expensive part (shingle relation + LSH +
    two-star fixpoint), and one session needs it once.  Twin: the
    ``curated`` CTE in :data:`_CURATION_CTES`.

    Keeper semantics (changed r8, VERDICT r7 "what's wrong" #1): each
    near-dup cluster keeps the min doc_id among its GATE SURVIVORS
    (quality + lang + exact-dedup), not the cluster's global-min doc —
    the old rule dropped an entire cluster whenever its global-min
    keeper had already failed an upstream gate.  Plan and oracle changed
    together, so the graded hash moved with the semantic."""
    from .dedup import pair_component_labels, q_dedup_near_exact

    def build_scored() -> DataFrame:
        # md5(text) is PROJECTED before the keep-one window (round 12,
        # guide §2.3): partitioning the window on the raw expression
        # shipped the full document text through the exchange; hashing
        # scan-side ships ~50 bytes/row instead.  Result-identical
        # (same key, same order, text unused downstream).
        #
        # Round 13 (guide §2.5 input starvation + §4.4 duplicate
        # evaluation): the scored projection is rebalanced across cores
        # (the bench-scale scan is one split; no-op at real split
        # counts) and MEMO-PERSISTED as its own narrow relation.
        # Without the persist barrier the quality/lang filter below
        # pushes UNDER the round-robin exchange and re-evaluates the
        # whole scoring chain single-threaded on every document, then
        # the surviving rows pay it AGAIN in the post-exchange
        # projection (plan-verified; measured 2.2 s → 1.37 s for the
        # survivors pass at sf0.1).  The persisted relation is
        # (doc_id, quality, lang_pred, n_tokens, md5) — ~60 bytes/doc,
        # the same width class as the survivors memo below.
        docs = rebalance_if_starved(load_table(spark, sf_dir, "documents"))
        return docs.select(
            "doc_id",
            (quality_score(F.col("text")) + F.lit(0.0)).alias("quality"),
            lang_id(F.col("text")).alias("lang_pred"),
            token_count(F.col("text")).cast("long").alias("n_tokens"),
            F.md5(F.col("text")).alias("__k"),
        )

    def build_survivors() -> DataFrame:
        scored = memo_persist(spark, "curation_scored", sf_dir, build_scored)
        kept = scored.where(
            (F.col("quality") >= _CURATION_QUALITY_MIN)
            & (F.col("lang_pred") != "und")
        )
        w = Window.partitionBy("__k").orderBy(F.asc("doc_id"))
        return (
            kept.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("doc_id", "lang_pred", "quality", "n_tokens")
        )

    def build() -> DataFrame:
        # Gate survivors are memoized separately: keeper selection below
        # consumes them twice (the cluster-survivor join AND the final
        # anti-join), and the scoring projection is a full corpus scan.
        survivors = memo_persist(
            spark, "curation_survivors", sf_dir, build_survivors
        )
        # Vertices = pair ENDPOINTS only (code-review r6, shared helper
        # r10): a doc in no pair is trivially its own component keeper,
        # so labeling the full corpus paid a corpus-sized scan + join
        # just to discard every label==id row.
        #
        # memo_process (round 13): the two-star loop runs driver-side
        # jobs EAGERLY at construction; pre-r13 it effectively ran once
        # per process anyway (the loop's eager localCheckpoints survive
        # clearCache inside the frozen memo lineage) — the process memo
        # makes that explicit now that the surrounding memos are
        # epoch-scoped.  The labels relation is pair-endpoints-sized.
        labels = memo_process(
            spark,
            "curation_labels",
            sf_dir,
            lambda: pair_component_labels(q_dedup_near_exact(spark, sf_dir)),
        )
        # Keeper = min SURVIVING doc_id per cluster.  All three relations
        # here are pair-endpoint-sized, not corpus-sized.
        lab_surv = labels.join(
            survivors.select("doc_id"),
            labels["id"] == F.col("doc_id"),
        ).select("id", "label")
        keepers = lab_surv.groupBy("label").agg(F.min("id").alias("keeper"))
        non_keepers = (
            lab_surv.join(keepers, "label")
            .where(F.col("id") != F.col("keeper"))
            .select(F.col("id").alias("doc_id"))
        )
        return survivors.join(non_keepers, "doc_id", "left_anti")

    # Two handles over ONE materialization (round 13, guide §5): every
    # consumer shares the epoch-scoped persist; consumers with a LARGE
    # downstream tree (the four export capstones — their plans were
    # 0.36-0.42 M chars / 215-244 Exchange nodes, mostly this subtree's
    # lineage re-optimized by Catalyst and re-staged by AQE per query)
    # pass ``truncate=True`` to additionally read it through a lazy
    # localCheckpoint, which collapses their lineage to a LogicalRDD
    # scan.  The checkpoint's build READS THE PERSISTED HANDLE, so the
    # curated data still materializes exactly once per clearCache epoch
    # (each bench run recomputes from parquet — caching.memo_checkpoint)
    # and the truncation costs one cache-read pass, not a second
    # derivation.  Direct small consumers (the per-lang accounting)
    # skip the extra pass.
    curated = memo_persist(spark, "curated_docs", sf_dir, build)
    if not truncate:
        return curated
    return memo_checkpoint(spark, "curated_docs_rdd", sf_dir, lambda: curated)


@register(
    "q_corpus_curation",
    oracle=f"""
WITH RECURSIVE {_CURATION_CTES}
SELECT lang_pred,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       round(avg(quality), 6) + 0.0 AS avg_quality
FROM curated
GROUP BY lang_pred
""",
)
def q_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus curation — the composite every LLM training-data
    pipeline runs before tokenization, as ONE declarative plan:
    quality-score filter → language-ID filter → exact-dedup keep-one
    (min doc_id per md5) → NEAR-dup cluster keep-one → per-language
    corpus accounting.

    Composition is the point: each stage reuses the independently
    oracle-checked primitive (``quality_score``, ``lang_id``,
    ``token_count``, md5 keep-one, and — round 6 — the portable-hash
    MinHash-LSH pairs fed through the fixpoint two-star connected
    components, the same driver-graded ladder as
    ``q_dedup_components_twostar``).  Near-dup clusters are computed over
    the FULL corpus (dedup is independent of the quality gate, as in
    production pipelines: a low-quality copy still marks its twin as a
    duplicate cluster member) and every component's min doc_id is the
    keeper; the exact md5 window stays because docs too short to shingle
    never enter the LSH pair space.

    Keeper semantics, explicit (ADVICE r6): the keeper of a near-dup
    component is its min doc_id over the FULL corpus, chosen BEFORE the
    quality/lang/exact-dedup gates.  If that keeper was itself removed
    by an upstream gate, the whole cluster is dropped — no gate-surviving
    member is promoted to keeper.  That is deliberate: a near-dup cluster
    whose canonical representative failed the quality bar is a cluster of
    near-copies of a rejected document, and promoting a sibling would
    re-admit content the gate rejected (the siblings differ from the
    rejected keeper only by near-dup noise).  It also keeps keeper choice
    independent of gate thresholds, so tightening the quality bar can
    only shrink the corpus, never reshuffle which duplicate survives.
    Both engines implement the same rule (oracle graded green).

    At 100 TB the dedup shuffles
    partition on content-derived keys (uniform by construction, no skew),
    the component edge relation is pair-sized (≪ corpus-sized), and the
    final group-by is languages-sized.

    Round 7: the curated relation itself is factored into
    :func:`curated_docs` (memo-shared with q_export_manifest); this
    query is the per-language accounting over it."""
    curated = curated_docs(spark, sf_dir)
    return curated.groupBy("lang_pred").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        (F.round(F.avg("quality"), 6) + F.lit(0.0)).alias("avg_quality"),
    )


# Winnowing parameters (Schleimer et al., SIGMOD 2003 "Winnowing: Local
# Algorithms for Document Fingerprinting"): char k-grams, window w of
# consecutive gram hashes, keep each window's minimum.  Any match of
# length >= k + w - 1 chars is guaranteed to share a fingerprint.
# Calibrated on the testdata: planted near-dupes share 40-113
# fingerprints, unrelated docs < 5 — threshold 10 separates cleanly at
# sf0.01 (24 pairs) and sf0.1 (244 pairs, linear in corpus size).
_WINNOW_K = 16
_WINNOW_W = 8
_WINNOW_MIN_SHARED = 10

# Portable gram hash (same trick as operators/sampling.hash_bucket): the
# first 8 md5 hex digits as an integer — md5 is md5 in every engine, so
# the DuckDB oracle derives bit-identical fingerprints.
_WINNOW_FPS_CTE = f"""
normed AS (
    SELECT doc_id, regexp_replace(lower(text), '\\s+', ' ', 'g') AS norm
    FROM documents
),
grams AS (
    SELECT doc_id,
           list_transform(
               generate_series(1, length(norm) - {_WINNOW_K} + 1),
               i -> CAST(concat('0x', substr(md5(substr(norm, i, {_WINNOW_K})), 1, 8)) AS BIGINT)
           ) AS hashes
    FROM normed
    WHERE length(norm) >= {_WINNOW_K + _WINNOW_W - 1}
),
fps AS (
    SELECT DISTINCT doc_id, fp
    FROM (
        SELECT doc_id,
               unnest(list_transform(
                   generate_series(1, len(hashes) - {_WINNOW_W} + 1),
                   j -> list_min(hashes[j:j+{_WINNOW_W - 1}])
               )) AS fp
        FROM grams
    )
)
"""


def winnow_fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, fp) winnowed fingerprints — distinct per doc — over any
    DataFrame with (doc_id, text) columns."""
    normed = docs.select(
        "doc_id",
        F.regexp_replace(F.lower(F.col("text")), r"\s+", " ").alias("norm"),
    ).where(F.length("norm") >= _WINNOW_K + _WINNOW_W - 1)
    grams = normed.select(
        "doc_id",
        F.expr(
            f"transform(sequence(1, length(norm) - {_WINNOW_K} + 1),"
            f" i -> cast(conv(substring(md5(substring(norm, i, {_WINNOW_K})), 1, 8), 16, 10)"
            f" as bigint))"
        ).alias("hashes"),
    )
    winnowed = grams.select(
        "doc_id",
        F.array_distinct(
            F.expr(
                f"transform(sequence(1, size(hashes) - {_WINNOW_W} + 1),"
                f" j -> array_min(slice(hashes, j, {_WINNOW_W})))"
            )
        ).alias("fps"),
    )
    # explode_outer, not explode: InferFiltersFromGenerate infers
    # size(fps)>0 from a plain explode and pushes it below the projections,
    # textually inlining the nested transform into the filter — the inner
    # k-gram hash array then re-evaluates per WINDOW (O(n^2) md5 calls per
    # row; measured hang at 500 docs).  The rule skips outer generates, and
    # the length guard above already makes every array non-empty.
    return winnowed.select("doc_id", F.explode_outer("fps").alias("fp"))


@register(
    "q_text_winnow_pairs",
    oracle=f"""
WITH {_WINNOW_FPS_CTE}
SELECT x.doc_id AS doc_x, y.doc_id AS doc_y, count(*) AS n_shared
FROM fps x JOIN fps y ON x.fp = y.fp AND x.doc_id < y.doc_id
GROUP BY x.doc_id, y.doc_id
HAVING count(*) >= {_WINNOW_MIN_SHARED}
""",
)
def q_text_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprinting (winnowing) → shared-
    fingerprint near-dup pairs — the third dedup family next to shingle
    Jaccard (set overlap) and SimHash (bit proximity): winnowing is
    POSITIONAL, guaranteeing any shared substring of length
    >= k + w - 1 chars leaves a common fingerprint, so it catches
    copied passages inside otherwise-different documents.

    Scale shape: the per-doc fingerprint derivation is one scan
    projection (higher-order ``transform`` — rolling k-gram hash +
    window minima entirely JVM-side, no UDF, ~2/(w+1) fingerprint
    density); candidate generation is an equi-join on the fingerprint
    value — shuffle partitioned by hash, uniform by construction, never
    an all-pairs product.  The gram hash is the first 8 md5 hex digits,
    so the DuckDB oracle reproduces fingerprints bit-for-bit.

    Reference parity: generalizes the exact-fingerprint dedup
    (functions/textfns.fingerprint) the same way vectorSimilarities.py
    generalized moviesSimilarities.py — same pipeline, richer signature.
    """
    # The fingerprint derivation (per-char rolling md5 + window minima —
    # the heaviest scan projection in the text family) fans into both
    # self-join sides; without persistence it runs twice (plan-verified:
    # 2 Generate nodes, 0 ReusedExchange).  Memo-persisted like the
    # shingle/ratings relations — measured ~8.0 → ~4.5 s at sf0.1.
    # rebalance first: the testdata's single-row-group scan would
    # otherwise run the whole rolling-hash projection on ONE core (the
    # query has downstream shuffles, so the guard's no-op contract at
    # real split counts holds — see rebalance_if_starved).
    fps = memo_persist(
        spark,
        "winnow_fps",
        sf_dir,
        lambda: winnow_fingerprints(
            rebalance_if_starved(load_table(spark, sf_dir, "documents"))
        ),
    )
    other = fps.select(F.col("doc_id").alias("doc_y"), "fp")
    return (
        fps.select(F.col("doc_id").alias("doc_x"), "fp")
        .join(other, "fp")
        .where(F.col("doc_x") < F.col("doc_y"))
        .groupBy("doc_x", "doc_y")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= _WINNOW_MIN_SHARED)
    )


# BPE-ish tokenizer: maximal letter runs, digit runs, and single
# non-alphanumeric marks over lowercased text.  Deliberately simple
# ASCII-safe regex semantics so Java regex (Spark) and RE2 (DuckDB)
# agree codepoint-for-codepoint; CJK text falls through to the
# one-mark-per-char branch, which is roughly what byte-level BPE does
# to unseen scripts anyway.
_BPE_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


@register(
    "q_text_bpe_tokens",
    oracle=f"""
WITH per_doc AS (
    SELECT doc_id, lang,
           len(regexp_extract_all(lower(text), '{_BPE_PATTERN}')) AS n_bpe,
           len(regexp_extract_all(text, '\\S+')) AS n_ws
    FROM documents
)
SELECT doc_id, lang, n_bpe, n_ws,
       round(n_bpe / CAST(n_ws AS DOUBLE), 6) + 0.0 AS subword_ratio
FROM per_doc
""",
)
def q_text_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget estimation with a BPE-flavored regex tokenizer
    (letter runs / digit runs / single marks — the pre-tokenization
    split every BPE vocabulary builds on) next to the whitespace count:
    ``subword_ratio`` is the tokens-per-word expansion factor a training
    pipeline uses to convert corpus word counts into token budgets.

    Scale shape: pure scan projection — two ``regexp_extract_all``
    Catalyst expressions, no shuffle, no UDF; the same plan prices a
    100 TB corpus.  The regex is ASCII-simple on purpose so Spark's Java
    regex and the oracle's RE2 tokenize identically.
    """
    docs = load_table(spark, sf_dir, "documents")
    n_bpe = F.size(F.regexp_extract_all(F.lower(F.col("text")), F.lit(_BPE_PATTERN), 0)).cast("long")
    n_ws = F.size(F.regexp_extract_all(F.col("text"), F.lit(r"\S+"), 0)).cast("long")
    return docs.select(
        "doc_id",
        "lang",
        n_bpe.alias("n_bpe"),
        n_ws.alias("n_ws"),
        (F.round(n_bpe / n_ws.cast("double"), 6) + F.lit(0.0)).alias("subword_ratio"),
    )


# Count-Min Sketch as pure relational algebra: d=4 hash rows × w=256
# buckets.  The bucket hash is the portable first-8-md5-hex-digits
# integer (same trick as sampling/winnowing), so the DuckDB oracle
# builds the bit-identical sketch.  CMS point estimates overestimate
# (min over rows of a bucket that may carry collisions) — pinned by a
# unit-test inequality against the true counts.
_CMS_D = 4
_CMS_W = 256
_CMS_PROBES = ("scan", "join", "window")


def _cms_bucket_sql(tok_expr: str, d_expr: str) -> str:
    return (
        f"CAST(concat('0x', substr(md5(concat({tok_expr}, ':cms', "
        f"CAST({d_expr} AS VARCHAR))), 1, 8)) AS BIGINT) % {_CMS_W}"
    )


@register(
    "q_sketch_countmin",
    oracle=f"""
WITH toks AS (
    SELECT tok FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
    WHERE tok <> ''
),
hashed AS (
    SELECT t.i AS d, {_cms_bucket_sql('tok', 't.i')} AS bucket
    FROM toks CROSS JOIN (SELECT unnest(generate_series(0, {_CMS_D - 1})) AS i) t
),
sketch AS (
    SELECT d, bucket, count(*) AS c FROM hashed GROUP BY d, bucket
),
probes AS (
    SELECT tok FROM (VALUES {", ".join(f"('{p}')" for p in _CMS_PROBES)}) v(tok)
),
probe_buckets AS (
    SELECT p.tok, t.i AS d, {_cms_bucket_sql('p.tok', 't.i')} AS bucket
    FROM probes p CROSS JOIN (SELECT unnest(generate_series(0, {_CMS_D - 1})) AS i) t
),
estimates AS (
    SELECT pb.tok, min(s.c) AS cms_estimate
    FROM probe_buckets pb JOIN sketch s ON pb.d = s.d AND pb.bucket = s.bucket
    GROUP BY pb.tok
),
truth AS (
    SELECT tok, count(*) AS true_count FROM toks GROUP BY tok
)
SELECT e.tok, coalesce(t.true_count, 0) AS true_count, e.cms_estimate
FROM estimates e LEFT JOIN truth t ON e.tok = t.tok
""",
)
def q_sketch_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min Sketch over the token stream, built as plain relational
    algebra — the custom-sketch pattern: d×w cells are a GROUP BY
    (hash-row, bucket), so sketch construction gets map-side partial
    aggregation and the finished sketch is d·w rows ( ≪ vocabulary )
    regardless of corpus size; point estimates are a w-free broadcast
    lookup.  The portable md5 bucket hash lets the DuckDB oracle build
    the bit-identical sketch, and the CMS guarantee
    (estimate ≥ true count) is pinned by a unit test.
    """
    docs = rebalance_if_starved(load_table(spark, sf_dir, "documents"))
    toks = docs.select(F.explode(tokens(F.col("text"))).alias("tok"))
    ds = F.explode(F.array(*[F.lit(d) for d in range(_CMS_D)])).alias("d")

    def bucket(tok_col, d_col):
        hex8 = F.substring(
            F.md5(F.concat(tok_col, F.lit(":cms"), d_col.cast("string"))), 1, 8
        )
        return F.pmod(F.conv(hex8, 16, 10).cast("bigint"), F.lit(_CMS_W))

    hashed = toks.select("tok", ds).select(
        "d", bucket(F.col("tok"), F.col("d")).alias("bucket")
    )
    sketch = hashed.groupBy("d", "bucket").agg(F.count(F.lit(1)).alias("c"))
    probes = spark.range(1).select(
        F.explode(F.array(*[F.lit(p) for p in _CMS_PROBES])).alias("tok")
    )
    probe_buckets = probes.select("tok", ds).select(
        "tok", "d", bucket(F.col("tok"), F.col("d")).alias("bucket")
    )
    estimates = (
        probe_buckets.join(F.broadcast(sketch), ["d", "bucket"])
        .groupBy("tok")
        .agg(F.min("c").alias("cms_estimate"))
    )
    truth = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("true_count"))
    return estimates.join(truth, "tok", "left").select(
        "tok",
        F.coalesce("true_count", F.lit(0)).alias("true_count"),
        "cms_estimate",
    )


@register(
    "q_text_bigrams",
    oracle="""
WITH toklists AS (
    SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
    FROM documents
),
bigrams AS (
    SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
                                 i -> concat(toks[i], ' ', toks[i + 1]))) AS bigram
    FROM toklists
    WHERE len(toks) >= 2
)
SELECT bigram, count(*) AS n
FROM bigrams
GROUP BY bigram
ORDER BY n DESC, bigram ASC
LIMIT 20
""",
)
def q_text_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 bigram collocations — the n-gram statistics pass a corpus
    pipeline runs for tokenizer/vocabulary construction and boilerplate
    detection (recurring bigrams flag templated text).  Reuses the
    2-token shingle primitive; the explode shuffles on the bigram and the
    count gets map-side partial aggregation, so vocabulary-sized state is
    all that ever concentrates."""
    docs = rebalance_if_starved(load_table(spark, sf_dir, "documents"))
    return (
        docs.select(F.explode(shingles(F.col("text"), 2)).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(20)
    )


@register(
    "q_text_repetition",
    oracle="""
WITH toklists AS (
    SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
    FROM documents
),
bigrams AS (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, len(toks) - 1),
                                 i -> concat(toks[i], ' ', toks[i + 1]))) AS bigram
    FROM toklists
    WHERE len(toks) >= 2
),
per_doc AS (
    SELECT doc_id,
           round(1.0 - CAST(count(DISTINCT bigram) AS DOUBLE) / count(*), 6)
               + 0.0 AS dup_frac
    FROM bigrams
    GROUP BY doc_id
)
SELECT d.lang,
       count(*) AS n_docs,
       round(avg(p.dup_frac), 6) + 0.0 AS avg_dup_frac,
       round(max(p.dup_frac), 6) + 0.0 AS max_dup_frac,
       count(*) FILTER (WHERE p.dup_frac > 0.1) AS n_flagged
FROM per_doc p
JOIN documents d USING (doc_id)
GROUP BY d.lang
""",
)
def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-n-gram repetition signal — the Gopher/MassiveText-style
    quality rule that flags degenerate generations and templated
    boilerplate by the FRACTION OF REPEATED 2-GRAMS per document
    (dup_frac = 1 − distinct/total; a looping doc tends to 1, natural
    prose stays low), summarized per language with a `> 0.1` flag count.

    Shape: one explode over the 2-token shingle primitive, a per-doc
    count/count-distinct aggregate (shuffles on doc_id — map-side
    partials, per-doc state only), then a language-cardinality rollup;
    no Python, no pair space, linear in corpus tokens at any SF.  The
    per-doc fraction rounds at 6 BEFORE the per-lang aggregate so both
    engines aggregate identical doubles, and the flag threshold compares
    those same rounded values (SURVEY §7.4).  Docs with <2 tokens drop on
    both sides (shingles() yields an empty array; the oracle's
    `len(toks) >= 2`)."""
    docs = rebalance_if_starved(load_table(spark, sf_dir, "documents"))
    per_doc = (
        docs.select(
            "doc_id", "lang", F.explode(shingles(F.col("text"), 2)).alias("bigram")
        )
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("total"),
            F.count_distinct("bigram").alias("n_distinct"),
        )
        .select(
            "lang",
            (
                F.round(
                    F.lit(1.0)
                    - F.col("n_distinct").cast("double") / F.col("total"),
                    6,
                )
                + F.lit(0.0)
            ).alias("dup_frac"),
        )
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.round(F.avg("dup_frac"), 6) + F.lit(0.0)).alias("avg_dup_frac"),
        (F.round(F.max("dup_frac"), 6) + F.lit(0.0)).alias("max_dup_frac"),
        F.count(F.when(F.col("dup_frac") > 0.1, True)).alias("n_flagged"),
    )


@register(
    "q_text_unigram_lm",
    oracle=f"""
WITH {_TOKS_CTE},
vocab AS (
    SELECT tok, count(*) AS c FROM toks GROUP BY tok
),
total AS (SELECT CAST(sum(c) AS DOUBLE) AS t FROM vocab),
doc_lp AS (
    SELECT k.doc_id,
           count(*) AS n_tokens,
           round(avg(ln(v.c / total.t)), 6) + 0.0 AS avg_logp
    FROM toks k
    JOIN vocab v ON v.tok = k.tok
    CROSS JOIN total
    GROUP BY k.doc_id
)
SELECT d.lang,
       count(*) AS n_docs,
       round(avg(l.avg_logp), 6) + 0.0 AS lang_avg_logp,
       round(min(l.avg_logp), 6) + 0.0 AS worst_doc_logp
FROM doc_lp l
JOIN documents d USING (doc_id)
GROUP BY d.lang
""",
)
def q_text_unigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model quality scoring — the corpus-curation filter
    that ranks documents by average token log-probability under the
    corpus's own unigram distribution (the cheap stand-in for a KenLM-style
    perplexity filter; gibberish and boilerplate surface as outliers).

    Shape: one token aggregation builds the vocabulary (map-side partial
    agg → vocabulary-sized state), the scalar total broadcasts, each doc's
    tokens join the broadcast vocabulary, and one agg per doc then per
    lang.  Per-doc average rounds at 6 BEFORE the per-lang aggregate so
    both engines aggregate identical doubles (SURVEY §7.4).
    """
    docs = rebalance_if_starved(load_table(spark, sf_dir, "documents"))
    toks = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    total = vocab.select(F.sum("c").cast("double").alias("t"))
    doc_lp = (
        toks.join(F.broadcast(vocab), "tok")
        .join(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (F.round(F.avg(F.log(F.col("c") / F.col("t"))), 6) + F.lit(0.0)).alias(
                "avg_logp"
            ),
        )
    )
    return (
        doc_lp.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            (F.round(F.avg("avg_logp"), 6) + F.lit(0.0)).alias("lang_avg_logp"),
            (F.round(F.min("avg_logp"), 6) + F.lit(0.0)).alias("worst_doc_logp"),
        )
    )


# Benchmark set = doc_id < _CONTAM_BENCH_MAX stands in for the held-out
# eval set throughout the contamination rung (detector AND curation gate).
_CONTAM_BENCH_MAX = 10


def _contam_ctes(p: str = "") -> str:
    """The 5-gram contamination CTE chain, prefixable so it composes
    into the curation oracle without clashing with _CURATION_CTES'
    relation names (the _clf_ctes discipline).  Ends at ``{p}hits``
    (corpus docs sharing ≥1 benchmark 5-shingle, with the shared count)
    and ``{p}sizes`` (per-doc distinct-shingle counts)."""
    return f"""{p}toklists AS (
    SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
{p}idx AS (
    SELECT doc_id, t, unnest(generate_series(1, len(t) - 4)) AS i
    FROM {p}toklists
),
{p}sh AS (
    SELECT DISTINCT doc_id, array_to_string(t[i:i+4], ' ') AS s FROM {p}idx
),
{p}sizes AS (SELECT doc_id, count(*) AS n_sh FROM {p}sh GROUP BY doc_id),
{p}bench AS (
    SELECT DISTINCT s FROM {p}sh WHERE doc_id < {_CONTAM_BENCH_MAX}
),
{p}hits AS (
    SELECT c.doc_id, count(*) AS n_shared
    FROM {p}sh c JOIN {p}bench b ON c.s = b.s
    WHERE c.doc_id >= {_CONTAM_BENCH_MAX}
    GROUP BY c.doc_id
)"""


def _contam_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct 5-shingles per doc — the one corpus-scale relation under
    the contamination detector."""
    docs = rebalance_if_starved(load_table(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        F.explode(F.array_distinct(shingles(F.col("text"), 5))).alias("s"),
    )


def _contam_hits(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """Spark twin of :func:`_contam_ctes`: (hits, sizes) — the shared
    detector the standalone report, the curation gate, and the release
    capstone all consume.  The benchmark shingle set is benchmark-sized
    and broadcasts; the corpus side is one distinct-shingle scan +
    broadcast equi-join + per-doc count (no corpus×benchmark pair
    space).  The hit relation is MEMOIZED (code-review r12): it is
    hit-sized, and without the memo each of its three consumers rebuilt
    the corpus-scale shingle scan — the same one-factorization
    discipline as ``curated_docs`` / ``als_recs``.  ``sizes`` stays
    lazy: only the standalone report consumes it, exactly once."""

    def build_hits() -> DataFrame:
        sh = _contam_shingles(spark, sf_dir)
        bench = F.broadcast(
            sh.where(F.col("doc_id") < _CONTAM_BENCH_MAX)
            .select("s")
            .distinct()
        )
        return (
            sh.where(F.col("doc_id") >= _CONTAM_BENCH_MAX)
            .join(bench, "s")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_shared"))
        )

    hits = memo_persist(spark, "contam_hits", sf_dir, build_hits)
    sizes = _contam_shingles(spark, sf_dir).groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_sh")
    )
    return hits, sizes


@register(
    "q_text_contamination",
    oracle=f"""
WITH {_contam_ctes()}
SELECT h.doc_id, h.n_shared,
       round(h.n_shared / CAST(z.n_sh AS DOUBLE), 6) + 0.0 AS contamination
FROM hits h JOIN sizes z USING (doc_id)
""",
)
def q_text_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing 5-token
    shingles with the benchmark set (here: doc_id < 10 stands in for the
    held-out eval set) — the leakage check every training-data pipeline
    runs before a corpus ships.  5-grams discriminate: the word-salad
    corpus shares plenty of 3-grams by chance but almost no 5-grams
    (2 flagged docs at sf0.01).

    Scale shape: the benchmark shingle set is benchmark-sized (tiny) and
    broadcasts; the corpus side is one distinct-shingle scan + a
    broadcast equi-join + per-doc count — no corpus×benchmark pair space,
    no shuffle beyond the per-doc aggregate.
    """
    hits, sizes = _contam_hits(spark, sf_dir)
    return (
        hits.join(sizes, "doc_id")
        .select(
            "doc_id",
            "n_shared",
            (
                F.round(F.col("n_shared") / F.col("n_sh").cast("double"), 6)
                + F.lit(0.0)
            ).alias("contamination"),
        )
    )


@register(
    "q_text_boilerplate",
    oracle="""
WITH toklists AS (
    SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
idx AS (
    SELECT doc_id, t, unnest(generate_series(1, len(t) - 3)) AS i FROM toklists
),
sh AS (
    SELECT DISTINCT doc_id, array_to_string(t[i:i+3], ' ') AS s FROM idx
),
df AS (SELECT s, count(*) AS n_docs FROM sh GROUP BY s)
SELECT s AS phrase, n_docs
FROM df
WHERE n_docs >= 3
ORDER BY n_docs DESC, phrase ASC
LIMIT 20
""",
)
def q_text_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate phrase detection: 4-token shingles counted by DOCUMENT
    frequency (distinct per doc, unlike the occurrence-counted bigram
    collocations) — phrases recurring across many documents are the
    template/navigation text a curation pipeline strips before training.

    Scale shape: distinct-shingle scan → df aggregation (phrase-keyed,
    vocabulary-bounded state) → ranked limit; at 100 TB the df relation is
    the only shuffle and TakeOrderedAndProject keeps the driver at k rows.
    """
    docs = rebalance_if_starved(load_table(spark, sf_dir, "documents"))
    sh = docs.select(
        "doc_id",
        F.explode(F.array_distinct(shingles(F.col("text"), 4))).alias("s"),
    )
    return (
        sh.groupBy(F.col("s").alias("phrase"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .where(F.col("n_docs") >= 3)
        .orderBy(F.desc("n_docs"), F.asc("phrase"))
        .limit(20)
    )


# Sequence packing (round 6): GPT-style concatenate-then-chunk. The
# corpus is laid out in doc_id order as one token stream and cut into
# fixed blocks; each doc's placement is a pure function of the prefix
# sum of token counts.
_PACK_BLOCK_TOKENS = 2048
_PACK_N_RANGES = 128


def distributed_prefix_sum(
    per_doc: DataFrame, n_ranges: int = _PACK_N_RANGES, key: str = "doc_id"
) -> DataFrame:
    """Exclusive prefix sum of ``n_tokens`` in ``key`` order — the
    Blelloch two-phase scan over (key, n_tokens): parallel per-range
    cumulative windows + a metadata-sized range-offset window, joined
    back as each range's base.  Returns the input columns +
    ``start_offset``; ``key`` must be a unique integer column (doc_id
    for corpus-order packing, shuffle_rank for shuffled-order packing).
    Property-pinned against a plain sequential scan in
    tests/test_scale_knobs.py."""
    bounds = per_doc.agg(
        F.max(key).alias("__max_k"), F.min(key).alias("__min_k")
    )
    bucketed = (
        per_doc.join(F.broadcast(bounds))
        .withColumn(
            "__bkt",
            F.expr(
                f"({key} - __min_k) div "
                f"greatest((__max_k - __min_k) div {n_ranges} + 1, 1)"
            ),
        )
        .drop("__max_k", "__min_k")
    )
    w_in = (
        Window.partitionBy("__bkt")
        .orderBy(key)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = bucketed.withColumn("__cum_in", F.sum("n_tokens").over(w_in))
    totals = bucketed.groupBy("__bkt").agg(
        F.sum("n_tokens").alias("__bkt_tokens")
    )
    w_bkt = (
        Window.orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = totals.withColumn(
        "__bkt_base",
        F.sum("__bkt_tokens").over(w_bkt) - F.col("__bkt_tokens"),
    ).select("__bkt", "__bkt_base")
    return (
        within.join(F.broadcast(offsets), "__bkt")
        .withColumn(
            "start_offset",
            F.col("__bkt_base") + F.col("__cum_in") - F.col("n_tokens"),
        )
        .drop("__bkt", "__cum_in", "__bkt_base")
    )


@register(
    "q_pack_blocks",
    oracle=f"""
WITH {_TOKS_CTE},
per_doc AS (
    SELECT doc_id, count(*) AS n_tokens FROM toks GROUP BY doc_id
),
placed AS (
    SELECT doc_id, n_tokens,
           CAST(sum(n_tokens) OVER (ORDER BY doc_id
                                    ROWS UNBOUNDED PRECEDING) - n_tokens
                AS BIGINT) AS start_offset
    FROM per_doc
)
SELECT doc_id, n_tokens, start_offset,
       start_offset // {_PACK_BLOCK_TOKENS} AS first_block,
       (start_offset + n_tokens - 1) // {_PACK_BLOCK_TOKENS} AS last_block
FROM placed
""",
)
def q_pack_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for LLM pretraining — concatenate the corpus in
    doc_id order and chunk it into {block}-token training blocks; emit
    each document's global token offset and the [first_block, last_block]
    span it occupies (the metadata a data loader needs to assemble
    attention-masked packed batches).

    The oracle is one global running sum, but a single unpartitioned
    window is the canonical 100 TB anti-pattern (every row through one
    reducer) — so the engine computes the SAME prefix sum in two
    scalable phases: (1) range-bucket the corpus on doc_id (bucket
    width from a 1-row max aggregate — metadata, broadcast); per-bucket
    cumulative sums run in a window PARTITIONED by bucket, all buckets
    in parallel; (2) per-bucket totals (a {ranges}-row relation) get an
    exclusive prefix sum in a window over that METADATA-sized relation
    only, broadcast-joined back as each bucket's global base offset.
    Offset = bucket base + within-bucket running sum − own count;
    block ids are exact int64 divisions.  This is the textbook
    distributed scan (Blelloch two-phase prefix sum) expressed in plain
    DataFrame ops — the corpus never passes through a single partition,
    and the only single-partition window touches ≤ {ranges} rows."""
    # Shared with q_mixture_resample (one memo entry, not two
    # near-identical corpus-sized caches — code-review r6): the helper
    # fans this into the per-range window AND the range-totals
    # aggregate, so unmemoized the tokenize scan runs twice.
    from .sampling import tokenized_per_doc

    per_doc = tokenized_per_doc(spark, sf_dir).select("doc_id", "n_tokens")
    placed = distributed_prefix_sum(per_doc)
    return placed.select(
        "doc_id",
        "n_tokens",
        "start_offset",
        F.expr(f"start_offset div {_PACK_BLOCK_TOKENS}").alias("first_block"),
        F.expr(
            f"(start_offset + n_tokens - 1) div {_PACK_BLOCK_TOKENS}"
        ).alias("last_block"),
    )


if q_pack_blocks.__doc__:  # absent under python -OO (docstrings stripped)
    q_pack_blocks.__doc__ = q_pack_blocks.__doc__.format(
        block=_PACK_BLOCK_TOKENS, ranges=_PACK_N_RANGES
    )


# One seed / shard-size definition across the shuffle family (sampling
# defines them; the oracles below must embed the same literals).
from .sampling import _SHARD_DOCS as _EXPORT_SHARD_DOCS  # noqa: E402
from .sampling import _SHUFFLE_SEED as _PACK_SHUFFLE_SEED  # noqa: E402


@register(
    "q_pack_shuffled",
    oracle=f"""
WITH {_TOKS_CTE},
per_doc AS (
    SELECT doc_id, count(*) AS n_tokens FROM toks GROUP BY doc_id
),
ranked AS (
    SELECT doc_id, n_tokens,
           CAST(row_number() OVER (
               ORDER BY md5(concat('{_PACK_SHUFFLE_SEED}:',
                                   CAST(doc_id AS VARCHAR))), doc_id
           ) AS BIGINT) AS shuffle_rank
    FROM per_doc
),
placed AS (
    SELECT doc_id, shuffle_rank, n_tokens,
           CAST(sum(n_tokens) OVER (ORDER BY shuffle_rank
                                    ROWS UNBOUNDED PRECEDING) - n_tokens
                AS BIGINT) AS start_offset
    FROM ranked
)
SELECT doc_id, shuffle_rank, n_tokens, start_offset,
       start_offset // {_PACK_BLOCK_TOKENS} AS first_block,
       (start_offset + n_tokens - 1) // {_PACK_BLOCK_TOKENS} AS last_block
FROM placed
""",
)
def q_pack_shuffled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing in SHUFFLED training order — the composition a
    real export runs: the corpus is first permuted by the seeded
    deterministic shuffle (q_global_shuffle's order, restricted to
    tokenizable docs), THEN concatenated and chunked into {block}-token
    blocks, so block boundaries fall in training order, not ingest
    order (packing before shuffling would let shards memorize corpus
    locality).

    The oracle chains two global single-reducer windows (row_number,
    then a running sum over it); the engine chains the two scalable
    primitives built for exactly these shapes — :func:`..operators.
    sampling.two_phase_rank_offsets` — the FUSED Blelloch pass
    (round 12) computing the 256-hash-prefix-bucket rank AND the
    exclusive token prefix sum along the same order in one scan (the
    predecessor chained two_phase_rank then distributed_prefix_sum:
    two data exchanges where one suffices).  The fusion is bit-pinned
    against the chained form; at 100 TB the corpus crosses ONE bucket
    exchange and one ≤256-row metadata window, never one partition.
    One tokenize scan (the memo-shared ``tokenized_per_doc``) feeds
    rank, offsets, and totals alike.
    """
    from .sampling import (
        seeded_shuffle_key,
        tokenized_per_doc,
        two_phase_rank_offsets,
    )

    def build_hashed() -> DataFrame:
        per_doc = tokenized_per_doc(spark, sf_dir).select("doc_id", "n_tokens")
        return seeded_shuffle_key(per_doc)

    # Memoized: the fused rank+offset scan reads its input twice (the
    # per-bucket window and the bucket totals); the memo pins one
    # evaluation of the tokenize scan instead of relying on exchange
    # reuse (code-review r7).  Docs-sized relation: (doc_id, n_tokens).
    hashed = memo_persist(spark, "pack_shuffled_hashed", sf_dir, build_hashed)
    placed = two_phase_rank_offsets(
        hashed,
        bucket_col="bkt",
        order_cols=[F.col("h"), F.col("doc_id")],
        rank_col="shuffle_rank",
    ).drop("h", "bkt")
    return placed.select(
        "doc_id",
        "shuffle_rank",
        "n_tokens",
        "start_offset",
        F.expr(f"start_offset div {_PACK_BLOCK_TOKENS}").alias("first_block"),
        F.expr(
            f"(start_offset + n_tokens - 1) div {_PACK_BLOCK_TOKENS}"
        ).alias("last_block"),
    )


if q_pack_shuffled.__doc__:  # absent under python -OO
    q_pack_shuffled.__doc__ = q_pack_shuffled.__doc__.format(
        block=_PACK_BLOCK_TOKENS
    )


@register(
    "q_text_keywords",
    oracle=f"""
WITH {_TOKS_CTE},
tf AS (
    SELECT doc_id, tok AS term, count(*) AS tf
    FROM toks GROUP BY doc_id, tok
),
docfreq AS (
    SELECT tok AS term, count(DISTINCT doc_id) AS df
    FROM toks GROUP BY tok
),
ranked AS (
    SELECT t.doc_id, t.term, t.tf, d.df,
           row_number() OVER (
               PARTITION BY t.doc_id
               ORDER BY t.tf DESC, d.df ASC, t.term ASC
           ) AS rnk
    FROM tf t JOIN docfreq d ON d.term = t.term
)
SELECT doc_id, term, tf, df, rnk
FROM ranked
WHERE rnk <= 3
""",
)
def q_text_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keyword extraction: the top-3 terms by term frequency,
    tie-broken toward globally RARER terms (ascending document
    frequency) then lexically — a TF-IDF-flavored ranking expressed in
    pure integer order so the rank is bit-reproducible across engines
    (a float tf·idf score can flip ranks on a last-ulp ln() difference
    between libm and java.lang.Math; tf and df cannot).

    Shape: ONE explode → (doc, term) count, and the document frequency
    falls out of that same relation for free — a term's df is its
    (doc, term) ROW count, so the df aggregation is a plain count over
    the already-deduplicated tf relation (no second explode of the
    corpus, no COUNT DISTINCT expand; the tf relation is the SAME
    memo-persisted relation q_text_tfidf builds — one tokenize scan and
    one persisted copy serve both queries).  Then one
    per-doc window for the top-3.  At 100 TB the (doc, term) relation
    shuffles on doc_id for the window — the same exchange every per-doc
    operator here pays — and the df side is vocabulary-sized (Zipf:
    ≪ corpus), broadcast by AQE when small enough.
    """

    tf = _tf_relation(spark, sf_dir).select(
        "doc_id", F.col("tok").alias("term"), F.col("tc").alias("tf")
    )
    docfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tf"), F.asc("df"), F.asc("term")
    )
    return (
        # Broadcast: docfreq is vocabulary-sized (Zipf: ≪ corpus), and
        # without the hint Catalyst has no stats for the memo-derived
        # aggregate and falls back to a shuffle join of the corpus-sized
        # tf side on the term key.
        tf.join(F.broadcast(docfreq), "term")
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.row_number().over(w).cast("long").alias("rnk"),
        )
        .where(F.col("rnk") <= 3)
    )


@register(
    "q_text_bm25",
    oracle=f"""
WITH {_TOKS_CTE},
tf AS (
    SELECT doc_id, tok, count(*) AS tc
    FROM toks GROUP BY doc_id, tok
),
doclen AS (
    SELECT doc_id, CAST(sum(tc) AS BIGINT) AS dl FROM tf GROUP BY doc_id
),
df AS (
    SELECT tok, count(*) AS docs_with FROM tf GROUP BY tok
),
totals AS (
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(dl) AS BIGINT) AS total_toks
    FROM doclen
),
scored AS (
    SELECT tf.doc_id, tf.tok,
           round(
               ln((CAST(t.n_docs AS DOUBLE) - df.docs_with + 0.5)
                  / (df.docs_with + 0.5) + 1.0)
               * (tf.tc * (1.2 + 1.0))
               / (tf.tc + 1.2 * (0.25 + 0.75 * dl.dl
                                 / (CAST(t.total_toks AS DOUBLE) / t.n_docs))),
               6) + 0.0 AS bm25
    FROM tf
    JOIN doclen dl USING (doc_id)
    JOIN df ON df.tok = tf.tok
    CROSS JOIN totals t
)
SELECT doc_id, tok AS term, bm25
FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY bm25 DESC, tok ASC) AS rn
      FROM scored)
WHERE rn <= 5
""",
)
def q_text_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 term weighting (k1 = 1.2, b = 0.75, Lucene's smoothed
    idf ``ln((N − df + 0.5)/(df + 0.5) + 1)``): the retrieval-scoring
    sibling of :func:`q_text_tfidf` — doc-length-normalized term
    saturation, the weighting an actual search/retrieval pipeline
    indexes.  Top-5 terms per doc on the ROUNDED score with the term
    tie-break (the same cross-engine float discipline tfidf's green
    grading already proves out: every scalar double op runs on identical
    integer inputs, and the only cross-row float reduction — none —
    never happens; avgdl is derived as exact-integer Σdl / N inside the
    score expression).

    Shape: the SAME memoized tf relation tfidf and keywords share (one
    tokenize scan per session), a vocabulary-sized df aggregate, a
    1-row totals aggregate broadcast into the score projection, one
    per-doc window.  At 100 TB: one corpus exchange on doc_id (memo),
    vocabulary-and-scalar broadcasts, the same window exchange every
    per-doc ranker pays.
    """
    tf = _tf_relation(spark, sf_dir)
    doclen = tf.groupBy("doc_id").agg(F.sum("tc").alias("dl"))
    df = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("docs_with"))
    totals = doclen.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_toks")
    )
    k1, b = 1.2, 0.75
    avgdl = F.col("total_toks").cast("double") / F.col("n_docs")
    idf = F.log(
        (F.col("n_docs").cast("double") - F.col("docs_with") + 0.5)
        / (F.col("docs_with") + 0.5)
        + 1.0
    )
    score = (
        idf
        * (F.col("tc") * (k1 + 1.0))
        / (F.col("tc") + k1 * ((1.0 - b) + b * F.col("dl") / avgdl))
    )
    scored = (
        tf.join(doclen, "doc_id")
        .join(F.broadcast(df), "tok")
        .crossJoin(F.broadcast(totals))
        .select(
            "doc_id",
            F.col("tok").alias("term"),
            (F.round(score, 6) + F.lit(0.0)).alias("bm25"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("bm25"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .select("doc_id", "term", "bm25")
    )


@register(
    "q_text_ccnet_buckets",
    oracle=f"""
WITH {_TOKS_CTE},
vocab AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
total AS (SELECT CAST(sum(c) AS DOUBLE) AS t FROM vocab),
doc_ppl AS (
    SELECT k.doc_id,
           round(exp(-avg(ln(v.c / total.t))), 6) + 0.0 AS ppl
    FROM toks k
    JOIN vocab v ON v.tok = k.tok
    CROSS JOIN total
    GROUP BY k.doc_id
),
bucketed AS (
    SELECT d.lang, p.ppl,
           ntile(3) OVER (PARTITION BY d.lang
                          ORDER BY p.ppl ASC, p.doc_id ASC) AS tertile
    FROM doc_ppl p
    JOIN documents d USING (doc_id)
)
SELECT lang,
       CASE tertile WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
            ELSE 'tail' END AS bucket,
       count(*) AS n_docs,
       round(avg(ppl), 6) + 0.0 AS avg_ppl,
       round(max(ppl), 6) + 0.0 AS max_ppl
FROM bucketed
GROUP BY lang, bucket
""",
)
def q_text_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): score every
    document's perplexity under the corpus's own unigram LM, then split
    each language into head / middle / tail TERTILES by ascending
    perplexity — the standard curation step that keeps the fluent third,
    samples the middle, and drops the tail.  Per-doc perplexity
    ``exp(−avg log p)`` rounds at 6 before any ranking or re-aggregation
    so both engines order and average identical doubles (SURVEY §7.4,
    the same discipline q_text_unigram_lm grades green under).

    The oracle's per-lang ``ntile(3)`` window is exact but sorts a whole
    language through one reducer — at 100 TB a single lang holds
    billions of docs, so the engine computes the identical tertile
    WITHOUT it: :func:`..operators.sampling.two_phase_rank` buckets each
    lang by 256 ppl value ranges (per-lang min/max from a metadata
    aggregate, broadcast), ranks within buckets in parallel, and offsets
    by the prefix sum of a 256-row-per-lang count relation; the tertile
    then falls out arithmetically — SQL ``ntile(k)`` of row i among n is
    exactly ``(i−1)·k div n + 1`` (uneven remainders go to the leading
    groups in both engines), integer math on the distributed rank and
    the per-lang count.  No corpus-sized relation ever crosses one
    partition.
    """
    from .sampling import two_phase_rank

    def build_scored() -> DataFrame:
        docs = rebalance_if_starved(load_table(spark, sf_dir, "documents"))
        toks = docs.select(
            "doc_id", F.explode(tokens(F.col("text"))).alias("tok")
        )
        vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
        total = vocab.select(F.sum("c").cast("double").alias("t"))
        doc_ppl = (
            toks.join(F.broadcast(vocab), "tok")
            .join(F.broadcast(total))
            .groupBy("doc_id")
            .agg(
                (
                    F.round(F.exp(-F.avg(F.log(F.col("c") / F.col("t")))), 6)
                    + F.lit(0.0)
                ).alias("ppl")
            )
        )
        return doc_ppl.join(docs.select("doc_id", "lang"), "doc_id")

    # Memoized: the docs-sized (doc_id, ppl, lang) relation fans into
    # FOUR lazy branches below (per-lang min/max, the rank window scan,
    # the rank's bucket counts, n_per_lang).  Unpersisted, correctness
    # of the wall depends on Catalyst's ReuseExchange happening to
    # dedupe the identical subplans; the memo makes the single
    # evaluation explicit (interleaved A/B: ~8% faster median, and
    # immune to plan edits that break exchange-reuse) — code-review r7.
    scored = memo_persist(spark, "ccnet_scored", sf_dir, build_scored)
    # ONE per-lang stats aggregate (round 12): min/max ppl for the range
    # buckets AND the lang row count for the tertile arithmetic — the
    # predecessor ran a second groupBy + broadcast join just for ``n``
    # (guide §2.4: two aggregations keyed the same way share one pass).
    rng = scored.groupBy("lang").agg(
        F.min("ppl").alias("__lo"),
        F.max("ppl").alias("__hi"),
        F.count(F.lit(1)).alias("n"),
    )
    bucketed = (
        scored.join(F.broadcast(rng), "lang")
        .withColumn(
            "bkt",
            F.when(
                F.col("__hi") > F.col("__lo"),
                F.least(
                    F.lit(255),
                    F.floor(
                        (F.col("ppl") - F.col("__lo"))
                        / (F.col("__hi") - F.col("__lo"))
                        * 256
                    ),
                ),
            )
            .otherwise(F.lit(0))
            .cast("int"),
        )
        .drop("__lo", "__hi")
    )
    ranked = two_phase_rank(
        bucketed,
        partition_cols=["lang"],
        bucket_col="bkt",
        order_cols=[F.asc("ppl"), F.asc("doc_id")],
        rank_col="r",
    )
    # ``n`` rode through the rank with the data rows — no second join.
    tertiled = ranked.withColumn("tertile", F.expr("(r - 1) * 3 div n + 1"))
    return (
        tertiled.withColumn(
            "bucket",
            F.when(F.col("tertile") == 1, "head")
            .when(F.col("tertile") == 2, "middle")
            .otherwise("tail"),
        )
        .groupBy("lang", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            (F.round(F.avg("ppl"), 6) + F.lit(0.0)).alias("avg_ppl"),
            (F.round(F.max("ppl"), 6) + F.lit(0.0)).alias("max_ppl"),
        )
    )


def _pii_oracle() -> str:
    """Assemble the PII oracle from the shared PII_RULES table (plain
    concatenation, not an f-string — the patterns contain ``{2,}``-style
    braces that f-strings would eat)."""
    counts = ", ".join(
        pii_count_sql(pattern) + f" AS {name}"
        for name, pattern, _ in PII_RULES
    )
    hit_sum = " + ".join(name for name, _, _ in PII_RULES)
    sums = ", ".join(
        f"CAST(sum({name}) AS BIGINT) AS {name}" for name, _, _ in PII_RULES
    )
    return (
        "WITH scanned AS (\n"
        f"    SELECT source, text, {counts},\n"
        f"           {pii_redact_sql('text')} AS redacted\n"
        "    FROM documents\n"
        ")\n"
        "SELECT source, count(*) AS n_docs,\n"
        f"       CAST(sum(CASE WHEN {hit_sum} > 0 THEN 1 ELSE 0 END)"
        " AS BIGINT) AS docs_with_pii,\n"
        f"       {sums},\n"
        "       CAST(sum(CASE WHEN redacted <> text THEN 1 ELSE 0 END)"
        " AS BIGINT) AS docs_redacted\n"
        "FROM scanned\n"
        "GROUP BY source"
    )


@register("q_text_pii", oracle=_pii_oracle())
def q_text_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction audit — the privacy gate every training
    corpus passes before release: count email / IPv4 / phone matches per
    document, apply the tag-redaction chain, and report a per-source
    audit (docs scanned, docs with any hit, hits per category, docs the
    redaction actually changed).

    One shared rule table (``functions.textfns.PII_RULES``) feeds the
    Spark columns AND the oracle SQL, with patterns confined to the
    Java-regex ∩ RE2 syntax intersection so both engines match
    identically; counts are taken on the raw text per pattern, the
    redaction chain applies in pinned rule order.  The driver-graded run
    proves the full expression chain agrees cross-engine on the real
    corpus (which is PII-clean — every count 0 — by construction of the
    synthetic testdata); the POSITIVE path is pinned by
    tests/test_round7_ops.py on crafted rows containing live PII run
    through the identical expressions in both engines.

    Scale shape: a single scan-side projection (regexp JVM-side in
    whole-stage codegen, no Python, no joins) into a sources-sized
    aggregate — the cheapest possible 100 TB pass; redacted text is a
    projected column, so the WRITE path (curated-corpus export) reuses
    the same expression without a second scan.

    Rebalanced (round 8): Java's backtracking regex engine is ~an order
    slower per byte than RE2, so a split-starved scan turns the whole
    query single-threaded — the r8 K-copy ladder measured the wall
    growing linearly (2.0 s → 4.3 s, K=3 → K=10) against a FLAT 70 ms
    DuckDB twin until the round-robin exchange spread the regex
    projection across cores.  The query has the groupBy shuffle anyway,
    which is the precondition `rebalance_if_starved` documents; at
    100 TB the scan has thousands of splits and this is a no-op.
    """
    docs = rebalance_if_starved(load_table(spark, sf_dir, "documents"))
    scanned = docs.select(
        "source",
        "text",
        *[
            pii_count(F.col("text"), pattern).alias(name)
            for name, pattern, _ in PII_RULES
        ],
        pii_redact(F.col("text")).alias("redacted"),
    )
    any_hit = None
    for name, _, _ in PII_RULES:
        c = F.col(name)
        any_hit = c if any_hit is None else any_hit + c
    return scanned.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(any_hit > 0, 1).otherwise(0)).cast("long").alias(
            "docs_with_pii"
        ),
        *[F.sum(name).cast("long").alias(name) for name, _, _ in PII_RULES],
        F.sum(F.when(F.col("redacted") != F.col("text"), 1).otherwise(0))
        .cast("long")
        .alias("docs_redacted"),
    )


# ---------------------------------------------------------------------------
# PII-redacting rewrite (round 12, VERDICT r11 "what's missing" #2) — the
# step between detection and release: emit the REDACTED text, not just the
# audit.  The synthetic corpus is PII-clean by construction, so the graded
# positive path comes from a deterministic INJECTION both engines compute
# identically (suffix one PII literal per doc, rule chosen by doc_id % 3);
# the rewrite then applies the pinned-order redaction chain and the graded
# relation carries, per doc, the staged match counts, the exact char/token
# conservation numbers, and md5(redacted) — byte-level cross-engine
# equality of the rewritten text without hauling the text itself.
#
# Conservation law (pinned in tests/test_span_rewrite.py): every PII_RULES
# pattern is whitespace-free, so each match lies WITHIN one whitespace
# token and its tag replaces a span inside that token —
#   n_tokens_out  == n_tokens_in                       (token count holds)
#   chars_out     == chars_in − chars_matched + Σ_rule n_rule · len(tag)
# with chars_matched measured stage-by-stage (len before − len after
# replace-with-empty, in the same rule order the chain applies), so the
# books balance exactly even if an earlier rule's tag abuts a later
# rule's match.
# ---------------------------------------------------------------------------


def _pii_inject_sql() -> str:
    """The deterministic PII injection, SQL side: one literal appended
    per doc, rule cycling with doc_id % 3 (email / in-range IPv4 /
    phone).  All components derive from doc_id, so both engines build
    the identical byte string."""
    return (
        "CASE WHEN doc_id % 3 = 0 THEN"
        " text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'"
        " WHEN doc_id % 3 = 1 THEN"
        " text || ' host 10.20.' || CAST(doc_id % 200 AS VARCHAR)"
        " || '.' || CAST(doc_id % 250 AS VARCHAR)"
        " ELSE text || ' call 555-123-'"
        " || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') END"
    )


def _pii_inject_col() -> Column:
    """Spark twin of :func:`_pii_inject_sql`."""
    did = F.col("doc_id")
    return (
        F.when(
            did % 3 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                did.cast("string"),
                F.lit("@example.com"),
            ),
        )
        .when(
            did % 3 == 1,
            F.concat(
                F.col("text"),
                F.lit(" host 10.20."),
                (did % 200).cast("string"),
                F.lit("."),
                (did % 250).cast("string"),
            ),
        )
        .otherwise(
            F.concat(
                F.col("text"),
                F.lit(" call 555-123-"),
                F.lpad((did % 10000).cast("string"), 4, "0"),
            )
        )
    )


def _pii_redact_oracle() -> str:
    """Staged redaction oracle: one CTE per rule, each counting matches
    and matched chars on ITS OWN input (the previous stage's output) so
    the conservation columns mirror the chain exactly.  Assembled by
    concatenation over PII_RULES — single source with the Spark side."""
    ctes = [
        "inj0 AS (\n"
        f"    SELECT doc_id, {_pii_inject_sql()} AS t0 FROM documents\n"
        ")",
        "inj AS (\n"
        "    SELECT doc_id, t0, length(t0) AS c_in,\n"
        "           len(string_split(t0, ' ')) AS tok_in\n"
        "    FROM inj0\n"
        ")",
    ]
    prev = "t0"
    prev_cte = "inj"
    carried: list[str] = ["c_in", "tok_in"]
    for i, (name, pattern, tag) in enumerate(PII_RULES):
        nxt = f"t{i + 1}"
        cols = ", ".join(["doc_id"] + carried)
        ctes.append(
            f"s{i} AS (\n"
            f"    SELECT {cols},\n"
            f"           CAST(len(regexp_extract_all({prev}, '{pattern}'))"
            f" AS BIGINT) AS {name},\n"
            f"           CAST(length({prev}) - length(regexp_replace({prev},"
            f" '{pattern}', '', 'g')) AS BIGINT) AS matched_{name},\n"
            f"           regexp_replace({prev}, '{pattern}', '{tag}', 'g')"
            f" AS {nxt}\n"
            f"    FROM {prev_cte}\n"
            ")"
        )
        carried += [name, f"matched_{name}"]
        prev = nxt
        prev_cte = f"s{i}"
    names = [name for name, _, _ in PII_RULES]
    matched_sum = " + ".join(f"matched_{n}" for n in names)
    sel_counts = ",\n       ".join(names)
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT doc_id,
       {sel_counts},
       CAST(c_in AS BIGINT) AS chars_in,
       CAST(length({prev}) AS BIGINT) AS chars_out,
       CAST({matched_sum} AS BIGINT) AS chars_matched,
       CAST(tok_in AS BIGINT) AS n_tokens_in,
       CAST(len(string_split({prev}, ' ')) AS BIGINT) AS n_tokens_out,
       md5({prev}) AS redacted_md5
FROM {prev_cte}
"""
    )


@register("q_text_pii_redact", oracle=_pii_redact_oracle())
def q_text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-REDACTING rewrite — detection's release-side counterpart
    (module note above): apply the ordered ``PII_RULES`` redaction chain
    to the (deterministically injected) corpus and emit, per doc, the
    staged match counts, the exact char/token conservation numbers, and
    ``md5(redacted)`` so the grade proves byte-identical rewritten text
    cross-engine.  The injection exists because the synthetic corpus is
    PII-clean; a real corpus drops it and the chain is unchanged — the
    redacted column is exactly what the export capstones would write.

    Scale shape: one scan-side projection per doc (regexp count/measure/
    replace, all JVM whole-stage codegen, zero joins, zero shuffles —
    the graded relation is the scan itself), identical to ``q_text_pii``
    plus the conservation arithmetic.  The staged form costs each
    pattern one extra pass over the (already in-register) string —
    constant per byte, embarrassingly parallel at 100 TB."""
    docs = rebalance_if_starved(load_table(spark, sf_dir, "documents"))
    cur = docs.select("doc_id", _pii_inject_col().alias("t"))
    cur = cur.withColumn("chars_in", F.length("t").cast("long")).withColumn(
        "n_tokens_in", F.size(F.split(F.col("t"), " ")).cast("long")
    )
    for name, pattern, tag in PII_RULES:
        cur = (
            cur.withColumn(name, F.regexp_count(F.col("t"), F.lit(pattern)).cast("long"))
            .withColumn(
                f"matched_{name}",
                (
                    F.length("t")
                    - F.length(F.regexp_replace(F.col("t"), pattern, ""))
                ).cast("long"),
            )
            .withColumn("t", F.regexp_replace(F.col("t"), pattern, tag))
        )
    names = [name for name, _, _ in PII_RULES]
    chars_matched = None
    for n in names:
        c = F.col(f"matched_{n}")
        chars_matched = c if chars_matched is None else chars_matched + c
    return cur.select(
        "doc_id",
        *names,
        "chars_in",
        F.length("t").cast("long").alias("chars_out"),
        chars_matched.cast("long").alias("chars_matched"),
        "n_tokens_in",
        F.size(F.split(F.col("t"), " ")).cast("long").alias("n_tokens_out"),
        F.md5("t").alias("redacted_md5"),
    )


# Tail of the export oracle.  Only THIS fragment passes through .format()
# — _CURATION_CTES is concatenated in afterwards, never formatted, so a
# future bounded-repeat regex in the curation chain (like the {2,} the
# PII_RULES already use) can't crash the assembly or silently corrupt the
# oracle (ADVICE r7; the hazard _pii_oracle's comment documents).
_EXPORT_ORACLE_TAIL = """,
exp_ranked AS (
    SELECT doc_id, n_tokens,
           CAST(row_number() OVER (
               ORDER BY md5(concat('{seed}:', CAST(doc_id AS VARCHAR))),
                        doc_id
           ) AS BIGINT) AS r
    FROM curated
),
exp_placed AS (
    SELECT doc_id, n_tokens, r,
           CAST(sum(n_tokens) OVER (ORDER BY r ROWS UNBOUNDED PRECEDING)
                - n_tokens AS BIGINT) AS off
    FROM exp_ranked
)
SELECT (r - 1) // {shard} AS shard,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS shard_tokens,
       min(off) // {block} AS first_block,
       max(off + n_tokens - 1) // {block} AS last_block
FROM exp_placed
GROUP BY shard
""".format(
    seed=_PACK_SHUFFLE_SEED, shard=_EXPORT_SHARD_DOCS, block=_PACK_BLOCK_TOKENS
)


@register(
    "q_export_manifest",
    oracle="\nWITH RECURSIVE " + _CURATION_CTES + _EXPORT_ORACLE_TAIL,
)
def q_export_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END-TO-END training-set export, as one declared query: curate
    (quality → lang-ID → exact dedup → near-dup-cluster keep-one), then
    permute with the seeded deterministic shuffle, then pack into
    2048-token blocks, and emit the per-shard MANIFEST a data loader
    consumes — docs, tokens, and the [first_block, last_block] span each
    1000-doc shard covers.  This is the capstone composition: every
    stage is an independently driver-graded primitive (`curated_docs` /
    q_corpus_curation, `two_phase_rank` / q_global_shuffle,
    `distributed_prefix_sum` / q_pack_blocks — fused into one scan by
    `two_phase_rank_offsets`, round 12 — shuffled chaining /
    q_pack_shuffled), and the oracle chains the SAME stages from the
    shared `_CURATION_CTES` body so the two pipelines cannot drift
    stage-by-stage.

    Scale shape: the curation ladder's content-keyed shuffles feed a
    docs-sized (doc_id, n_tokens) relation; rank and prefix sum are the
    bucket-parallel two-phase scans (no single-reducer window anywhere
    — the oracle's two global windows are exactly what the ladder in
    BASELINE.md measures losing 5-7× past a few million rows); the
    manifest aggregate is shards-sized.  One memo-shared curated
    relation serves this query and the per-lang accounting alike.
    """
    from .sampling import seeded_shuffle_key, two_phase_rank_offsets

    def build_hashed() -> DataFrame:
        curated = curated_docs(spark, sf_dir, truncate=True).select(
            "doc_id", "n_tokens"
        )
        return seeded_shuffle_key(curated)

    # Memoized (same fan-out rationale as q_pack_shuffled): the fused
    # rank+offset scan reads its input twice (window + bucket totals).
    hashed = memo_persist(
        spark, "export_hashed", sf_dir, build_hashed, epoch_scoped=True
    )
    placed = two_phase_rank_offsets(
        hashed,
        bucket_col="bkt",
        order_cols=[F.col("h"), F.col("doc_id")],
        rank_col="shuffle_rank",
    ).drop("h", "bkt")
    return (
        placed.withColumn(
            "shard",
            F.expr(f"(shuffle_rank - 1) div {_EXPORT_SHARD_DOCS}"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("shard_tokens"),
            F.expr(f"min(start_offset) div {_PACK_BLOCK_TOKENS}").alias(
                "first_block"
            ),
            F.expr(
                f"max(start_offset + n_tokens - 1) div {_PACK_BLOCK_TOKENS}"
            ).alias("last_block"),
        )
    )


# Rewritten-export oracle tail: the identical shuffle→pack→manifest
# algebra over `curated_rw` (post-span-removal token counts).  Same
# .format() confinement rationale as _EXPORT_ORACLE_TAIL.
_EXPORT_RW_ORACLE_TAIL = """,
rwexp_ranked AS (
    SELECT doc_id, n_tokens,
           CAST(row_number() OVER (
               ORDER BY md5(concat('{seed}:', CAST(doc_id AS VARCHAR))),
                        doc_id
           ) AS BIGINT) AS r
    FROM curated_rw
),
rwexp_placed AS (
    SELECT doc_id, n_tokens, r,
           CAST(sum(n_tokens) OVER (ORDER BY r ROWS UNBOUNDED PRECEDING)
                - n_tokens AS BIGINT) AS off
    FROM rwexp_ranked
)
SELECT (r - 1) // {shard} AS shard,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS shard_tokens,
       min(off) // {block} AS first_block,
       max(off + n_tokens - 1) // {block} AS last_block
FROM rwexp_placed
GROUP BY shard
""".format(
    seed=_PACK_SHUFFLE_SEED, shard=_EXPORT_SHARD_DOCS, block=_PACK_BLOCK_TOKENS
)


def _export_rw_oracle() -> str:
    """Assemble the rewritten-export oracle: curation chain + span
    report + interval merge + per-doc removal, all CONCATENATED (never
    .format()ed across fragments — the export-oracle lesson, code-review
    r8).  The span CTEs nest inside `spans AS (WITH ...)`, so their
    internal names (kept, islands, per_doc) shadow the curation chain's
    locally and cannot collide."""
    from .dedup import _SPAN_IV_CTES, _SPANS_ORACLE

    return (
        "\nWITH RECURSIVE "
        + _CURATION_CTES
        + ",\nspans AS ("
        + _SPANS_ORACLE
        + "),"
        + _SPAN_IV_CTES
        + """,
rw_removed AS (
    SELECT doc_id, sum(e - s + 1) AS tokens_removed
    FROM merged GROUP BY doc_id
),
curated_rw AS (
    -- CAST: DuckDB's sum() widens to HUGEINT, which would ripple a
    -- decimal128 into every downstream arithmetic column.
    SELECT c.doc_id,
           CAST(c.n_tokens - coalesce(r.tokens_removed, 0) AS BIGINT)
               AS n_tokens
    FROM curated c LEFT JOIN rw_removed r USING (doc_id)
)"""
        + _EXPORT_RW_ORACLE_TAIL
    )


@register("q_export_manifest_rewritten", oracle=_export_rw_oracle())
def q_export_manifest_rewritten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The export capstone with the substring-REMOVAL layer composed in
    (VERDICT r9 "what's missing" #3: `q_dedup_span_rewrite` produced
    rewritten text nothing downstream consumed): curate → subtract each
    curated doc's merged removal intervals (the span-rewrite measure —
    Lee et al. 2021's cut, so packed blocks carry DEDUPED token budgets)
    → seeded deterministic shuffle → 2048-token block packing → per-shard
    manifest.  Token conservation — packed tokens = curated tokens −
    tokens removed from curated docs — is pinned in
    tests/test_span_rewrite.py.

    Scale shape: identical to `q_export_manifest` (bucket-parallel
    two-phase rank + prefix sum, no single-reducer window) plus one
    report-sized LEFT join against the per-doc removal measure — the
    merged-interval relation is span-report-sized, never corpus-sized,
    and the memoized island relation is shared with
    `q_dedup_span_rewrite`/`_audit`, so grading all three costs one span
    computation."""
    from .dedup import _span_merged
    from .sampling import seeded_shuffle_key, two_phase_rank_offsets

    def build_hashed() -> DataFrame:
        curated = curated_docs(spark, sf_dir, truncate=True).select(
            "doc_id", "n_tokens"
        )
        removed = (
            _span_merged(spark, sf_dir)
            .groupBy("doc_id")
            .agg(
                F.sum(F.col("e") - F.col("s") + 1).alias("tokens_removed")
            )
        )
        cur_rw = curated.join(removed, "doc_id", "left").select(
            "doc_id",
            (
                F.col("n_tokens")
                - F.coalesce(F.col("tokens_removed"), F.lit(0))
            ).alias("n_tokens"),
        )
        return seeded_shuffle_key(cur_rw)

    hashed = memo_persist(
        spark, "export_hashed_rw", sf_dir, build_hashed, epoch_scoped=True
    )
    placed = two_phase_rank_offsets(
        hashed,
        bucket_col="bkt",
        order_cols=[F.col("h"), F.col("doc_id")],
        rank_col="shuffle_rank",
    ).drop("h", "bkt")
    return (
        placed.withColumn(
            "shard",
            F.expr(f"(shuffle_rank - 1) div {_EXPORT_SHARD_DOCS}"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("shard_tokens"),
            F.expr(f"min(start_offset) div {_PACK_BLOCK_TOKENS}").alias(
                "first_block"
            ),
            F.expr(
                f"max(start_offset + n_tokens - 1) div {_PACK_BLOCK_TOKENS}"
            ).alias("last_block"),
        )
    )


_CHUNK_W = 256   # context-window width (tokens)
_CHUNK_S = 192   # stride (64-token overlap between consecutive windows)

_TEXT_CHUNKS_ORACLE = f"""
WITH dt AS (
    SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
c AS (
    SELECT doc_id,
           unnest(list_transform(
               generate_series(0, (len(t) - 1) // {_CHUNK_S}),
               i -> struct_pack(
                   chunk_id := i,
                   ct := t[i * {_CHUNK_S} + 1 : i * {_CHUNK_S} + {_CHUNK_W}]
               )
           )) AS e
    FROM dt WHERE len(t) > 0
)
SELECT doc_id,
       CAST(e.chunk_id AS BIGINT) AS chunk_id,
       CAST(len(e.ct) AS BIGINT) AS n_tokens,
       array_to_string(e.ct, ' ') AS chunk_text
FROM c
"""


def chunk_exploded(docs: DataFrame) -> DataFrame:
    """(doc_id, text) → exploded (doc_id, chunk_id, ct) context windows —
    the ONE window-cutting definition shared by ``q_text_chunks`` and
    the chunk-level export (``q_export_chunks``); Catalyst prunes ``ct``
    down to its size when a consumer only needs token counts."""
    # Round 13: the row filter `size(t) > 0` is equivalent to
    # `text IS NOT NULL` — split of ANY non-null string yields at least
    # one element ('' splits to ['']) — which costs no split at all.
    # The token array is NOT bind_once-wrapped here (unlike shingles):
    # the wrapper's outer transform blocks nested-column pruning through
    # the explode, and the export consumers rely on Catalyst pruning
    # `ct` down to its size (measured: wrapping regressed q_text_chunks
    # ~0.1 s and the literal-space split is cheap next to it).
    t = F.split(F.col("text"), " ")
    n = F.size(t)
    windows = F.transform(
        F.sequence(F.lit(0), F.floor((n - 1) / _CHUNK_S).cast("int")),
        lambda i: F.struct(
            i.cast("long").alias("chunk_id"),
            F.slice(t, i * _CHUNK_S + 1, _CHUNK_W).alias("ct"),
        ),
    )
    return (
        docs.where(F.col("text").isNotNull())
        .select("doc_id", F.explode(windows).alias("e"))
        .select("doc_id", F.col("e.chunk_id").alias("chunk_id"), F.col("e.ct").alias("ct"))
    )


@register("q_text_chunks", oracle=_TEXT_CHUNKS_ORACLE)
def q_text_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking — the cutter that turns documents into
    model-sized training windows: width {w} tokens, stride {s} (a
    {ov}-token overlap so no span is ever split across a boundary
    without also appearing whole in a neighbor — the standard LM data
    prep next to block packing, which concatenates instead of
    windowing).  Windows start at token 1, 1+{s}, 1+2·{s}, … while the
    start is in range; the final window may run short.  Emits
    (doc_id, chunk_id, n_tokens, chunk_text).

    Scale: pure scan-side arithmetic — one ``transform`` over the
    per-doc window starts, one explode, ZERO shuffles; a 100 TB corpus
    chunks in one pass at scan parallelism.  All-integer positions,
    bit-identical cross-engine (DuckDB's inclusive 1-based list slice
    mirrors ``F.slice``)."""
    docs = load_table(spark, sf_dir, "documents")
    return chunk_exploded(docs).select(
        "doc_id",
        "chunk_id",
        F.size("ct").cast("long").alias("n_tokens"),
        F.concat_ws(" ", F.col("ct")).alias("chunk_text"),
    )


if q_text_chunks.__doc__:  # absent under python -OO
    q_text_chunks.__doc__ = q_text_chunks.__doc__.format(
        w=_CHUNK_W, s=_CHUNK_S, ov=_CHUNK_W - _CHUNK_S
    )


# ---------------------------------------------------------------------------
# Model-based quality classifier (hashing trick + broadcast weights).
#
# The production quality gate after the cheap heuristics (q_text_quality):
# a LINEAR classifier over hashed bag-of-words features — the fastText /
# DCLM / FineWeb-edu shape, where a small trained model scores every
# document and the pipeline keeps the positive tail.  The hashing trick
# (Weinberger et al. 2009) fixes the feature space at _CLF_D buckets
# regardless of vocabulary size, so the model is a constant-size weight
# vector that BROADCASTS — no vocab build pass, no dictionary shuffle.
#
# Bucket key = the FIRST 3 HEX CHARS of md5(token) — a 4096-bucket fold
# that is (a) portable (identical lowercase hex in both engines) and
# (b) cheap in the JOIN-KEY position: the first formulation folded the
# 60-bit `conv(substr(md5,1,15),16,10) % 1024` long and measured 4.3 s
# at the K=30 ladder rung vs 1.4 s for this string key — `conv` as a
# join key (and in the join's inferred isnotnull filter) evaluates
# outside the fast path, tripling the whole query; md5+substring alone
# stays codegen-cheap.  The weight table carries the SAME hex key, so
# the probe side never parses hex at all.
#
# No trained model ships in this container, so the weights are a
# deterministic integer function of the bucket id (the multimodal
# "deterministic fake" discipline, operators/multimodal.py): basis-point
# weights in [-1000, 1000], summed as int64 so the per-doc score is EXACT
# and order-independent (the sampling family's int64-bp discipline) —
# swapping in real trained weights is replacing one 4096-row table.
# ---------------------------------------------------------------------------

_CLF_D = 4096          # hashed feature buckets (3 hex chars of md5)
_CLF_A = 2654435761    # Knuth multiplicative constant — pseudo-weight seed
_CLF_M = 2001          # pseudo-weight range: (bkt*A) % M - 1000 ∈ [-1000, 1000]

def _clf_ctes(p: str = "") -> str:
    """The hashed-feature classifier scoring as a CTE chain, with an
    optional NAME PREFIX so the curation-composite oracle (whose
    namespace already defines ``toks``) can embed the SAME definition
    instead of duplicating it — the ``_rare_cand_cte`` single-source
    rule applied to the classifier."""
    return f"""
{p}ctoks AS (
    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
    FROM documents
),
{p}tb AS (
    -- bucket key: first 3 hex chars of md5 (lowercase both engines)
    SELECT doc_id, substr(md5(tok), 1, 3) AS hk
    FROM {p}ctoks WHERE tok <> ''
),
{p}w AS (
    SELECT lower(lpad(to_hex(i), 3, '0')) AS hk,
           (i * {_CLF_A}) % {_CLF_M} - 1000 AS w_bp
    FROM range({_CLF_D}) t(i)
),
{p}clf_scored AS (
    SELECT doc_id,
           CAST(SUM(w_bp) AS BIGINT) AS score_bp,
           COUNT(*) AS n_tok
    FROM {p}tb JOIN {p}w USING (hk) GROUP BY doc_id
)"""


_TEXT_CLF_ORACLE = f"""
WITH {_clf_ctes()}
SELECT doc_id,
       CAST(n_tok AS BIGINT) AS n_tok,
       score_bp,
       CAST(CASE WHEN score_bp > 0 THEN 1 ELSE 0 END AS INT) AS keep
FROM clf_scored
"""


@register("q_text_quality_classifier", oracle=_TEXT_CLF_ORACLE)
def q_text_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality gate: a linear classifier over hashed
    bag-of-words features (hashing trick, {d} buckets), scored as the
    summed basis-point weight of a document's tokens (``score_bp``,
    exact int64 — a mean is ``score_bp / n_tok`` caller-side); ``keep``
    is the positive-score decision.  The fastText/DCLM-style filter the
    LLM pipeline runs AFTER the heuristic gates — here with
    deterministic pseudo-weights standing in for a trained vector (see
    module note).

    Scale: the weight vector is a {d}-row table → ``F.broadcast`` join
    (map-side, zero shuffle); the per-doc sum is an int64 partial
    aggregation, so the ONLY shuffle is one row per document of
    (score_bp, n_tok) partials.  A 100 TB corpus scores in one scan at
    read parallelism — the same plan shape whether the weights are
    these pseudo-weights or a real trained model loaded from parquet.
    Exact cross-engine: the md5 hex-prefix bucket key (see module note —
    chosen over the 60-bit conv fold after a measured 3× join-key
    regression) and integer basis-point weights make the score
    order-independent and bit-identical — no floats anywhere (a
    rounded mean was measured to flip at the engines' round-half
    boundary, so the score stays integer)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select(
            "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("tok")
        )
        .where(F.col("tok") != "")
        .select("doc_id", F.substring(F.md5("tok"), 1, 3).alias("hk"))
    )
    weights = spark.range(_CLF_D).select(
        F.lower(F.lpad(F.conv(F.col("id").cast("string"), 10, 16), 3, "0")).alias(
            "hk"
        ),
        ((F.col("id") * F.lit(_CLF_A)) % _CLF_M - 1000).alias("w_bp"),
    )
    scored = (
        toks.join(F.broadcast(weights), "hk")
        .groupBy("doc_id")
        .agg(F.sum("w_bp").alias("score_bp"), F.count("*").alias("n_tok"))
    )
    return scored.select(
        "doc_id",
        F.col("n_tok").cast("long").alias("n_tok"),
        "score_bp",
        F.when(F.col("score_bp") > 0, 1).otherwise(0).cast("int").alias("keep"),
    )


if q_text_quality_classifier.__doc__:  # absent under python -OO
    q_text_quality_classifier.__doc__ = q_text_quality_classifier.__doc__.format(
        d=_CLF_D
    )


# Classifier-gated curation (round 11, VERDICT r10 "what's missing" #2):
# the DCLM/FineWeb-edu pipeline shape — cheap heuristics first, then the
# trained model gate.  The composite threads the classifier's keep
# decision through the SAME curated relation both capstones consume, so
# the gate composes with quality/lang/exact-dedup/near-dup keep-one
# rather than re-deriving any stage.  Both sides are exact-int
# (score_bp is a summed int64 of basis-point weights), so the chained
# oracle grades the composition exactly.
_CURATION_CLF_ORACLE = (
    "\nWITH RECURSIVE "
    + _CURATION_CTES
    + ","
    + _clf_ctes("g_")
    + """
SELECT c.lang_pred,
       count(*) AS n_docs,
       CAST(sum(c.n_tokens) AS BIGINT) AS total_tokens,
       round(avg(c.quality), 6) + 0.0 AS avg_quality,
       CAST(sum(s.score_bp) AS BIGINT) AS sum_score_bp
FROM curated c JOIN g_clf_scored s USING (doc_id)
WHERE s.score_bp > 0
GROUP BY c.lang_pred
"""
)


@register("q_corpus_curation_clf", oracle=_CURATION_CLF_ORACLE)
def q_corpus_curation_clf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation with the MODEL-BASED quality gate composed in — the
    full DCLM-style ladder as one declared plan: heuristics (quality
    score + lang-ID) → exact-dedup keep-one → near-dup-cluster keep-one
    → the hashed-feature linear classifier's positive-score gate → the
    per-language corpus accounting, now also carrying the summed
    classifier score so the audit REFLECTS the gate (``sum_score_bp``).

    Composition is the point (the q_corpus_curation discipline): the
    curated relation is the memo-shared :func:`curated_docs` both
    export capstones consume, and the gate is exactly
    ``q_text_quality_classifier``'s keep decision (score_bp > 0) —
    both independently driver-graded primitives, chained.

    Scale shape: the classifier side adds ONE broadcast join (4096-row
    weight table) and one per-doc int64 partial aggregation to the
    curation walk — no new corpus-sized shuffle; the gate join is
    curated-sized vs docs-sized on doc_id.  Exactness: the score is a
    summed int64 of basis-point weights (order-independent), so the
    gate decision — and therefore the graded per-language sums — is
    bit-identical cross-engine."""
    curated = curated_docs(spark, sf_dir, truncate=True)
    scored = q_text_quality_classifier(spark, sf_dir).where(
        F.col("score_bp") > 0
    )
    gated = curated.join(scored.select("doc_id", "score_bp"), "doc_id")
    return gated.groupBy("lang_pred").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        (F.round(F.avg("quality"), 6) + F.lit(0.0)).alias("avg_quality"),
        F.sum("score_bp").alias("sum_score_bp"),
    )


# Decontaminated curation (round 12, VERDICT r11 "what's missing" #1):
# every real corpus release decontaminates BEFORE export — docs sharing
# 5-gram shingles with the held-out benchmark set leak eval answers into
# training data.  The gate composes like the classifier gate did: the
# independently-graded detector (q_text_contamination's hits relation)
# threads against the memo-shared curated relation, and the audit
# reports, per language, what shipped and what the gate held back
# (contaminated drops + the eval set itself, which a release also
# excludes).  Both sides are exact (integer counts/sums + the curation
# chain's pinned rounding), so the chained oracle grades the
# composition exactly.
_CURATION_DECON_ORACLE = (
    "\nWITH RECURSIVE "
    + _CURATION_CTES
    + ",\n"
    + _contam_ctes("dc_")
    + f""",
decon_tagged AS (
    SELECT c.lang_pred, c.n_tokens, c.quality,
           CASE WHEN c.doc_id < {_CONTAM_BENCH_MAX} THEN 'eval'
                WHEN h.doc_id IS NOT NULL THEN 'contaminated'
                ELSE 'kept' END AS status
    FROM curated c LEFT JOIN dc_hits h ON c.doc_id = h.doc_id
)
SELECT lang_pred,
       CAST(sum(CASE WHEN status = 'kept' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_docs,
       CAST(sum(CASE WHEN status = 'kept' THEN n_tokens ELSE 0 END)
            AS BIGINT) AS total_tokens,
       round(avg(CASE WHEN status = 'kept' THEN quality END), 6) + 0.0
           AS avg_quality,
       CAST(sum(CASE WHEN status = 'contaminated' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_dropped_contam,
       CAST(sum(CASE WHEN status = 'eval' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_eval_held_out
FROM decon_tagged
GROUP BY lang_pred
"""
)


@register("q_corpus_curation_decon", oracle=_CURATION_DECON_ORACLE)
def q_corpus_curation_decon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation with benchmark DECONTAMINATION composed in — the release
    gate between the curated corpus and the export capstones: drop every
    curated doc sharing a 5-token shingle with the held-out benchmark
    set (``q_text_contamination``'s verdict), and hold out the benchmark
    docs themselves.  Emits the per-language release audit: docs/tokens/
    quality actually shipping, plus what the gate removed
    (``n_dropped_contam``) and what was never eligible
    (``n_eval_held_out``) — the accounting a corpus release logs next to
    its manifest.

    Composition discipline (the classifier-gate pattern): the curated
    relation is the memo-shared :func:`curated_docs` every capstone
    consumes, and the gate is exactly the detector's hit relation — two
    independently driver-graded primitives, chained, so a gate-semantics
    drift breaks a graded oracle rather than silently shipping leaks.

    Scale shape: the detector adds one distinct-shingle corpus scan with
    the benchmark-sized shingle set BROADCAST (no corpus×benchmark pair
    space) and a per-doc count; the gate itself is a curated-sized LEFT
    join against the hits relation (hit-sized, typically tiny) — no new
    corpus-sized shuffle beyond the detector's own per-doc aggregate."""
    curated = curated_docs(spark, sf_dir, truncate=True)
    hits, _ = _contam_hits(spark, sf_dir)
    tagged = curated.join(
        hits.select("doc_id", F.lit(1).alias("__hit")), "doc_id", "left"
    ).withColumn(
        "status",
        F.when(F.col("doc_id") < _CONTAM_BENCH_MAX, "eval")
        .when(F.col("__hit").isNotNull(), "contaminated")
        .otherwise("kept"),
    )
    kept = F.col("status") == "kept"
    return tagged.groupBy("lang_pred").agg(
        F.sum(F.when(kept, 1).otherwise(0)).cast("long").alias("n_docs"),
        F.sum(F.when(kept, F.col("n_tokens")).otherwise(0))
        .cast("long")
        .alias("total_tokens"),
        (F.round(F.avg(F.when(kept, F.col("quality"))), 6) + F.lit(0.0)).alias(
            "avg_quality"
        ),
        F.sum(F.when(F.col("status") == "contaminated", 1).otherwise(0))
        .cast("long")
        .alias("n_dropped_contam"),
        F.sum(F.when(F.col("status") == "eval", 1).otherwise(0))
        .cast("long")
        .alias("n_eval_held_out"),
    )


# Chunk-level export (round 11, VERDICT r10 "what's missing" #3: the
# chunker emitted training windows nothing downstream consumed).  The
# export capstone algebra — seeded deterministic shuffle → two-phase
# rank → distributed prefix sum → per-shard manifest — applied at CHUNK
# granularity over the CURATED corpus: curate, cut each survivor into
# width-256/stride-192 context windows, shuffle the WINDOWS (the unit a
# data loader actually samples), and emit the per-shard manifest.
_EXPORT_SHARD_CHUNKS = 200
# Unique integer key per chunk for the shuffle hash + rank tie-break:
# doc_id * 2^16 + chunk_id.  Collision-free while chunk_id < 65536
# (docs under ~12.6M tokens at stride 192) and doc_id < 2^47; both
# engines compute it in BIGINT.
_CHUNK_CID_MULT = 1 << 16


def chunk_cid(doc_id: Column, chunk_id: Column) -> Column:
    """The packed per-chunk key, with its collision-free precondition
    enforced at runtime (ADVICE r11): a doc longer than ~12.6M tokens
    would wrap ``chunk_id`` past 2^16 and silently collide cids —
    violating two_phase_rank's unique-key contract and making the md5
    tie-break (cid equal ⇒ hash equal) nondeterministic across engines.
    Fail loudly instead; the oracle needs no twin because a firing
    guard aborts the job rather than skewing compared values."""
    return F.when(
        chunk_id < F.lit(_CHUNK_CID_MULT),
        doc_id * _CHUNK_CID_MULT + chunk_id,
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    "chunk_cid: chunk_id >= 2^16 breaks cid packing "
                    "(doc_id="
                ),
                doc_id.cast("string"),
                F.lit(") — widen _CHUNK_CID_MULT"),
            )
        )
    )

_EXPORT_CHUNKS_ORACLE_TAIL = """,
ch_dt AS (
    SELECT d.doc_id, string_split(d.text, ' ') AS t
    FROM documents d JOIN curated USING (doc_id)
),
ch AS (
    SELECT doc_id,
           unnest(list_transform(
               generate_series(0, (len(t) - 1) // {s}),
               i -> struct_pack(
                   chunk_id := i,
                   n := len(t[i * {s} + 1 : i * {s} + {w}])
               )
           )) AS e
    FROM ch_dt WHERE len(t) > 0
),
chunks AS (
    SELECT doc_id,
           CAST(e.n AS BIGINT) AS n_tokens,
           doc_id * {mult} + e.chunk_id AS cid
    FROM ch
),
chexp_ranked AS (
    SELECT doc_id, n_tokens, cid,
           CAST(row_number() OVER (
               ORDER BY md5(concat('{seed}:', CAST(cid AS VARCHAR))), cid
           ) AS BIGINT) AS r
    FROM chunks
),
chexp_placed AS (
    SELECT doc_id, n_tokens, r,
           CAST(sum(n_tokens) OVER (ORDER BY r ROWS UNBOUNDED PRECEDING)
                - n_tokens AS BIGINT) AS off
    FROM chexp_ranked
)
SELECT (r - 1) // {shard} AS shard,
       count(*) AS n_chunks,
       count(DISTINCT doc_id) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS shard_tokens,
       min(off) // {block} AS first_block,
       max(off + n_tokens - 1) // {block} AS last_block
FROM chexp_placed
GROUP BY shard
""".format(
    s=_CHUNK_S,
    w=_CHUNK_W,
    mult=_CHUNK_CID_MULT,
    seed=_PACK_SHUFFLE_SEED,
    shard=_EXPORT_SHARD_CHUNKS,
    block=_PACK_BLOCK_TOKENS,
)


@register(
    "q_export_chunks",
    oracle="\nWITH RECURSIVE " + _CURATION_CTES + _EXPORT_CHUNKS_ORACLE_TAIL,
)
def q_export_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The export capstone at CHUNK granularity: curate (quality →
    lang-ID → exact dedup → near-dup keep-one), cut each curated doc
    into width-{w}/stride-{s} context windows (the SAME
    ``chunk_exploded`` definition ``q_text_chunks`` grades), then run
    the windows — not the docs — through the seeded deterministic
    shuffle, the bucket-parallel two-phase rank, and the distributed
    prefix sum into {block}-token blocks; emit the per-shard manifest
    ({shard} chunks per shard: chunk count, distinct source docs,
    token sum, [first_block, last_block] span).  This is what a loader
    that samples WINDOWS (not whole documents) consumes; shuffling at
    window granularity decorrelates neighboring windows of one doc
    across shards.

    Conservation (pinned in tests/test_span_rewrite.py): per doc,
    n_tokens = last window's tokens + (n_windows − 1) × {s} — the
    windows reconstruct the doc exactly, so the manifest's token total
    equals the curated token total plus the deliberate (w − s)-token
    overlaps, with no span lost or double-dropped.

    Scale shape: identical to ``q_export_manifest`` — the chunk cut is
    scan-side (zero shuffles), rank and prefix sum are two-phase
    bucket-parallel scans (no single-reducer window), the manifest
    aggregate is shards-sized; the only new relation is chunk-sized
    (≈ tokens/{s} rows per doc)."""
    from .sampling import seeded_shuffle_key, two_phase_rank_offsets

    def build_hashed() -> DataFrame:
        curated = curated_docs(spark, sf_dir, truncate=True).select("doc_id")
        docs = load_table(spark, sf_dir, "documents").join(curated, "doc_id")
        chunks = chunk_exploded(docs).select(
            "doc_id",
            F.size("ct").cast("long").alias("n_tokens"),
            chunk_cid(F.col("doc_id"), F.col("chunk_id")).alias("cid"),
        )
        return seeded_shuffle_key(chunks, key="cid")

    # Same memo rationale as q_export_manifest: the fused scan reads its
    # input twice (window + bucket totals).
    hashed = memo_persist(
        spark, "export_hashed_chunks", sf_dir, build_hashed, epoch_scoped=True
    )
    placed = two_phase_rank_offsets(
        hashed,
        bucket_col="bkt",
        order_cols=[F.col("h"), F.col("cid")],
        rank_col="shuffle_rank",
    ).drop("h", "bkt")
    return (
        placed.withColumn(
            "shard",
            F.expr(f"(shuffle_rank - 1) div {_EXPORT_SHARD_CHUNKS}"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.sum("n_tokens").alias("shard_tokens"),
            F.expr(f"min(start_offset) div {_PACK_BLOCK_TOKENS}").alias(
                "first_block"
            ),
            F.expr(
                f"max(start_offset + n_tokens - 1) div {_PACK_BLOCK_TOKENS}"
            ).alias("last_block"),
        )
    )


if q_export_chunks.__doc__:  # absent under python -OO
    q_export_chunks.__doc__ = q_export_chunks.__doc__.format(
        w=_CHUNK_W,
        s=_CHUNK_S,
        block=_PACK_BLOCK_TOKENS,
        shard=_EXPORT_SHARD_CHUNKS,
    )


# ---------------------------------------------------------------------------
# RELEASE capstone (round 12) — the terminal composition of the corpus
# pipeline, in the order a real release runs it:
#
#   curate (quality → lang-ID → exact dedup → near-dup keep-one)
#     → DECONTAMINATE (drop docs sharing a benchmark 5-shingle; hold out
#       the benchmark docs themselves — q_corpus_curation_decon's gate)
#     → REDACT PII (the pinned-order rule chain over the released text —
#       q_text_pii_redact's rewrite; injection only because the synthetic
#       corpus is PII-clean, see that query's module note)
#     → CHUNK (width-256 / stride-192 context windows — q_text_chunks'
#       cutter, over the REDACTED text)
#     → seeded shuffle → two-phase rank → distributed prefix sum
#     → per-shard manifest.
#
# Every stage is an independently driver-graded primitive; this query
# chains them into the relation a data loader actually consumes, so a
# semantics drift in ANY gate breaks this oracle too (the classifier-gate
# composition discipline).  ``redacted_tokens`` per shard makes the
# redaction load-bearing in the grade: tokens carrying a redaction tag
# are counted per chunk and summed per shard, so a rewrite that stopped
# firing (or fired on the wrong text) flips a graded column, not just a
# byte nobody hashes.
# ---------------------------------------------------------------------------

# f-string, NOT str.format: the redaction expression interpolated below
# carries `{2,}`-style bounded-repeat braces that .format would eat
# (the _EXPORT_ORACLE_TAIL comment documents the hazard) — f-string
# interpolation inserts values verbatim without re-scanning them.
_EXPORT_RELEASE_ORACLE_TAIL = f""",
{_contam_ctes("rl_")},
rl_rel AS (
    SELECT c.doc_id
    FROM curated c LEFT JOIN rl_hits h USING (doc_id)
    WHERE c.doc_id >= {_CONTAM_BENCH_MAX} AND h.doc_id IS NULL
),
rl_txt AS (
    SELECT doc_id, {pii_redact_sql("(" + _pii_inject_sql() + ")")} AS rt
    FROM documents JOIN rl_rel USING (doc_id)
),
rl_dt AS (
    SELECT doc_id, string_split(rt, ' ') AS t FROM rl_txt
),
rl_ch AS (
    SELECT doc_id,
           unnest(list_transform(
               generate_series(0, (len(t) - 1) // {_CHUNK_S}),
               i -> struct_pack(
                   chunk_id := i,
                   ct := t[i * {_CHUNK_S} + 1 : i * {_CHUNK_S} + {_CHUNK_W}]
               )
           )) AS e
    FROM rl_dt WHERE len(t) > 0
),
rl_chunks AS (
    SELECT doc_id,
           CAST(len(e.ct) AS BIGINT) AS n_tokens,
           doc_id * {_CHUNK_CID_MULT} + e.chunk_id AS cid,
           CAST(len(list_filter(e.ct,
               x -> {" OR ".join(f"contains(x, '{tag}')" for _, _, tag in PII_RULES)}
           )) AS BIGINT) AS n_red_toks
    FROM rl_ch
),
rl_ranked AS (
    SELECT doc_id, n_tokens, n_red_toks, cid,
           CAST(row_number() OVER (
               ORDER BY md5(concat('{_PACK_SHUFFLE_SEED}:',
                                   CAST(cid AS VARCHAR))), cid
           ) AS BIGINT) AS r
    FROM rl_chunks
),
rl_placed AS (
    SELECT doc_id, n_tokens, n_red_toks, r,
           CAST(sum(n_tokens) OVER (ORDER BY r ROWS UNBOUNDED PRECEDING)
                - n_tokens AS BIGINT) AS off
    FROM rl_ranked
)
SELECT (r - 1) // {_EXPORT_SHARD_CHUNKS} AS shard,
       count(*) AS n_chunks,
       count(DISTINCT doc_id) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS shard_tokens,
       CAST(sum(n_red_toks) AS BIGINT) AS redacted_tokens,
       min(off) // {_PACK_BLOCK_TOKENS} AS first_block,
       max(off + n_tokens - 1) // {_PACK_BLOCK_TOKENS} AS last_block
FROM rl_placed
GROUP BY shard
"""


def _release_tag_hit(tok: Column) -> Column:
    """True iff a (redacted) token carries any PII_RULES redaction tag —
    the observable the release manifest counts per shard."""
    hit = None
    for _, _, tag in PII_RULES:
        c = tok.contains(tag)
        hit = c if hit is None else hit | c
    return hit


def release_manifest(
    spark: SparkSession,
    sf_dir: str,
    curated: DataFrame,
    memo_name: str = "export_hashed_release",
) -> DataFrame:
    """The release algebra downstream of the curated relation — ONE
    definition (factored round 12) for both curated sources: the batch
    ``curated_docs`` memo (``q_export_release``) and the streaming
    ingest's end state (``q_stream_release_exec``) — decontaminate
    against the held-out benchmark, redact PII, cut the survivors into
    context windows, seeded-shuffle the windows, two-phase rank →
    distributed prefix sum, per-shard manifest with the
    ``redacted_tokens`` audit column.  Takes only the curated relation's
    ``doc_id`` column; everything else re-derives from the documents
    table, so both callers grade against the identical chained oracle."""
    from .sampling import seeded_shuffle_key, two_phase_rank_offsets

    def build_hashed() -> DataFrame:
        hits, _ = _contam_hits(spark, sf_dir)
        released = curated.select("doc_id").where(
            F.col("doc_id") >= _CONTAM_BENCH_MAX
        ).join(hits.select("doc_id"), "doc_id", "left_anti")
        # Rebalance ahead of the join: the PII redaction regex chain +
        # window cut otherwise run in the lone scan task.
        docs = rebalance_if_starved(
            load_table(spark, sf_dir, "documents")
        ).join(released, "doc_id")
        red = docs.select(
            "doc_id", pii_redact(_pii_inject_col()).alias("text")
        )
        chunks = chunk_exploded(red).select(
            "doc_id",
            F.size("ct").cast("long").alias("n_tokens"),
            chunk_cid(F.col("doc_id"), F.col("chunk_id")).alias("cid"),
            F.size(F.filter(F.col("ct"), _release_tag_hit))
            .cast("long")
            .alias("n_red_toks"),
        )
        return seeded_shuffle_key(chunks, key="cid")

    # Same memo rationale as the other export capstones: the fused scan
    # reads its input twice (window + bucket totals).
    hashed = memo_persist(
        spark, memo_name, sf_dir, build_hashed, epoch_scoped=True
    )
    placed = two_phase_rank_offsets(
        hashed,
        bucket_col="bkt",
        order_cols=[F.col("h"), F.col("cid")],
        rank_col="shuffle_rank",
    ).drop("h", "bkt")
    return (
        placed.withColumn(
            "shard",
            F.expr(f"(shuffle_rank - 1) div {_EXPORT_SHARD_CHUNKS}"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.sum("n_tokens").alias("shard_tokens"),
            F.sum("n_red_toks").cast("long").alias("redacted_tokens"),
            F.expr(f"min(start_offset) div {_PACK_BLOCK_TOKENS}").alias(
                "first_block"
            ),
            F.expr(
                f"max(start_offset + n_tokens - 1) div {_PACK_BLOCK_TOKENS}"
            ).alias("last_block"),
        )
    )


@register(
    "q_export_release",
    oracle="\nWITH RECURSIVE " + _CURATION_CTES + _EXPORT_RELEASE_ORACLE_TAIL,
)
def q_export_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The RELEASE capstone (module note above): the full corpus release
    in one declared query — curate, decontaminate against the held-out
    benchmark, redact PII, cut the survivors into context windows,
    shuffle the windows with the seeded deterministic permutation, and
    emit the per-shard manifest with the redaction audit column
    (``redacted_tokens``) a release log carries next to its token
    counts.  A user of the chain's individual stages gets exactly this
    by composing them; this query pins the composition itself.

    Scale shape: q_export_chunks' algebra plus two scan-side gates — the
    decontamination join is released-sized against the hit-sized (tiny)
    relation, the redaction is the same zero-join codegen projection
    q_text_pii_redact grades, and the tag count is per-chunk array
    arithmetic.  No new corpus-sized shuffle beyond the detector's
    per-doc aggregate (shared with q_corpus_curation_decon via
    _contam_hits); rank and prefix sum stay bucket-parallel.  Round 12
    (late): the post-curation algebra is factored into
    :func:`release_manifest` so the streaming ingest's end state can
    feed the identical release (``q_stream_release_exec``)."""
    return release_manifest(
        spark, sf_dir, curated_docs(spark, sf_dir, truncate=True)
    )
