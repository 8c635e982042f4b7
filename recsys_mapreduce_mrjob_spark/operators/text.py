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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.textfns import _LANG_MARKERS, lang_id, quality_score, token_count, tokens
from ..registry import register
from ..sources.readers import load_table


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
    docs = load_table(spark, sf_dir, "documents")
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

    Expressed as two aggregations + broadcast joins rather than MLlib's
    HashingTF/IDF so the arithmetic is exactly oracle-checkable; the df
    and N relations are tiny (vocabulary-sized / scalar) and broadcast.
    """
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tc"))
    )
    doclen = tf.groupBy("doc_id").agg(F.sum("tc").alias("n_toks"))
    df = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("docs_with"))
    n_docs = docs.select(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(doclen, "doc_id")
        .join(F.broadcast(df), "tok")
        .join(F.broadcast(n_docs))
        .select(
            "doc_id",
            F.col("tok").alias("term"),
            (
                F.round(
                    (F.col("tc") / F.col("n_toks").cast("double"))
                    * F.log(F.col("n_docs").cast("double") / F.col("docs_with")),
                    6,
                )
                + F.lit(0.0)
            ).alias("tfidf"),
        )
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


@register(
    "q_corpus_curation",
    oracle=f"""
WITH {_TOKS_CTE},
{_langid_cte().strip().rstrip()},
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
)
SELECT lang_pred,
       count(*) AS n_docs,
       sum(n_tokens) AS total_tokens,
       round(avg(quality), 6) + 0.0 AS avg_quality
FROM deduped
WHERE rn = 1
GROUP BY lang_pred
""",
)
def q_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus curation — the composite every LLM training-data
    pipeline runs before tokenization, as ONE declarative plan:
    quality-score filter → language-ID filter → exact-dedup keep-one
    (min doc_id per md5) → per-language corpus accounting.

    Composition is the point: each stage reuses the independently
    oracle-checked primitive (``quality_score``, ``lang_id``,
    ``token_count``, md5 keep-one), and Catalyst fuses the three scalar
    stages into a single scan projection — only the dedup window and the
    final aggregate shuffle.  At 100 TB the dedup shuffle partitions on
    the content hash (uniform by construction, no skew) and the final
    group-by is languages-sized."""
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "text",
        (quality_score(F.col("text")) + F.lit(0.0)).alias("quality"),
        lang_id(F.col("text")).alias("lang_pred"),
        token_count(F.col("text")).cast("long").alias("n_tokens"),
    )
    kept = scored.where(
        (F.col("quality") >= _CURATION_QUALITY_MIN) & (F.col("lang_pred") != "und")
    )
    w = Window.partitionBy(F.md5(F.col("text"))).orderBy(F.asc("doc_id"))
    deduped = kept.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    return deduped.groupBy("lang_pred").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        (F.round(F.avg("quality"), 6) + F.lit(0.0)).alias("avg_quality"),
    )
