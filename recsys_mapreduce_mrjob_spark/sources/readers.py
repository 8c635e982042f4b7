"""Sources: parquet star-schema tables + the reference's native text formats.

The reference's only source was line-oriented text on stdin, parsed ad hoc
per mapper (``user_id, item_id, rating = line.split('|')`` in
``group_by_user_rating``, moviesSimilarities.py:≈55, and the Book-Crossing
``";"``-quoted variant in vectorSimilarities.py:≈90 — reconstructed, see
SURVEY.md §0).  Here each format is a schema-first reader returning a
DataFrame; predicate pushdown and column pruning then reach the scan for
free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Explicit schemas for the driver testdata (FIXTURES.md §A).  Explicit (not
# inferred) so that a 100 TB scan never pays a schema-inference pass and the
# engine fails loudly on drift.
RATING_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("item_id", T.LongType()),
        T.StructField("rating", T.DoubleType()),
    ]
)

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver testdata table from ``{sf_dir}/{name}.parquet``."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def rebalance_if_starved(df: DataFrame) -> DataFrame:
    """Round-robin repartition a split-starved scan up to core count.

    The bench-scale tables are single parquet row groups, so Spark plans
    ONE input task and every per-row expression downstream (tokenize +
    explode, 32 minhash folds, higher-order cosines) runs single-threaded
    until the first exchange.  At 100 TB the same scan has thousands of
    row-group splits and this helper is a NO-OP — the guard is a
    partition-count probe (plan-time only, no job), so no shuffle is ever
    added to an already-parallel scan.  Use only where the query has a
    downstream shuffle anyway (never on the shuffle-free scan-projection
    paths, whose zero-Exchange plans are audited)."""
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        return df.repartition(sc.defaultParallelism)
    return df


def ntz_as_utc_instant(ts: F.Column) -> F.Column:
    """TIMESTAMP_NTZ → TIMESTAMP interpreting the naive wall clock as UTC,
    independent of the ambient session timezone.

    ``cast`` alone reads the wall clock in the *session* zone; composing
    with ``from_utc_timestamp(·, current_timezone())`` subtracts that same
    zone offset back out, leaving the naive-as-UTC instant under any
    session setting (verified both UTC and America/New_York).  Ambiguous
    wall times inside a DST fall-back hour are inherently lossy for the
    intermediate cast; the graded sessions pin UTC where no such hour
    exists.
    """
    return F.from_utc_timestamp(
        ts.cast("timestamp"), F.expr("current_timezone()")
    )


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events stream table, with its timestamp normalized to TIMESTAMP.

    The testdata has shipped ``ts`` two ways across driver rounds:
      - INT64 TIMESTAMP(NANOS), which Spark's vectorized reader rejects
        (PARQUET_TYPE_ILLEGAL) — read as a raw long (``nanosAsLong``
        legacy conf, runtime-settable) and truncate to microseconds with
        exact integer division, matching DuckDB's µs truncation on read.
        (Float division would round incorrectly: ns-since-epoch ≈ 1.7e18
        exceeds double's 53-bit mantissa.)
      - TIMESTAMP(MICROS) without timezone, which Spark reads as
        TIMESTAMP_NTZ — convert the naive value to the UTC instant
        *explicitly* (``from_utc_timestamp(cast(ts), current_timezone())``:
        the cast interprets the wall clock in the session zone, the
        ``from_utc_timestamp`` subtracts that same offset back out), so
        the result is bit-identical to DuckDB's naive µs TIMESTAMP under
        ANY session timezone, not just the session.py UTC pin.
    Branching on the observed dtype keeps both encodings working.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_type = dict(raw.dtypes)["ts"]
    if ts_type in ("bigint", "long"):
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw.withColumn("ts", ntz_as_utc_instant(F.col("ts")))


def read_ratings_pipe(spark: SparkSession, path: str) -> DataFrame:
    """MovieLens-style ``user|item|rating`` lines (ref R2 parse).

    Equivalent of ``MoviesSimilarities``'s mapper-side
    ``line.split('|')`` + float cast (moviesSimilarities.py:≈55) as a
    declarative csv scan — malformed lines go to the PERMISSIVE null row
    instead of crashing the task.
    """
    return spark.read.csv(path, sep="|", schema=RATING_SCHEMA, header=False)


def read_ratings_bookcrossing(spark: SparkSession, path: str) -> DataFrame:
    """Book-Crossing style ``"user";"isbn";"rating"`` (ref R3 adapter).

    The reference subclass strips quotes by hand (vectorSimilarities.py:≈90);
    csv ``quote`` option does it declaratively.  ``isbn`` stays a string key —
    the engine's recsys core is key-type agnostic.
    """
    schema = T.StructType(
        [
            T.StructField("user_id", T.StringType()),
            T.StructField("item_id", T.StringType()),
            T.StructField("rating", T.DoubleType()),
        ]
    )
    return spark.read.csv(path, sep=";", quote='"', schema=schema, header=False)


def derive_ratings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's (user, item, rating) relation over the star schema.

    ``rating(u, i) = round(avg(l_quantity), 6)`` per ``(o_custkey,
    l_partkey)`` from ``orders ⋈ lineitem`` — the analogue of the
    reference's R2 parse step, derived relationally (SURVEY.md §2.2.I).

    Rounded at derivation so every downstream consumer (pair stats,
    similarities) works from bit-identical inputs in Spark and the DuckDB
    oracle (SURVEY.md §7.4 pitfall 1).
    """
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("o_custkey").alias("user_id"),
            F.col("l_partkey").alias("item_id"),
        )
        .agg(F.round(F.avg("l_quantity"), 6).alias("rating"))
    )


RATINGS_ORACLE_CTE = """
ratings AS (
    SELECT o_custkey AS user_id,
           l_partkey AS item_id,
           round(avg(l_quantity), 6) AS rating
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1, 2
)
"""


# One materialized text copy per (sf_dir, fmt) per process — the graded
# CSV-source queries (q_scan_csv_ratings / q_scan_csv_quoted) re-read these
# through the schema-first readers above, closing the loop on the
# reference's ACTUAL input model (line-oriented `user|item|rating` /
# quoted Book-Crossing CSV — SURVEY §2.1 R1/R3; every other graded query
# reads parquet).  The files live under the system tempdir (the streaming
# sinks' convention) and are derived deterministically from the parquet
# star schema, so the DuckDB oracle never needs to read them: it computes
# the same relation straight from the tables, and the grade proves the
# write→parse round-trip is lossless (Java emits shortest-round-trip
# doubles; the reader parses them back bit-identically).
_CSV_CACHE: dict[tuple[str, str, str], str] = {}


def _source_fingerprint(sf_dir: str, tables: tuple[str, ...]) -> str:
    """Cheap content fingerprint of the parquet inputs a materialized
    text copy derives from — footer row counts + file sizes + mtimes.
    Keys the materialized-copy cache directories, so regenerated
    testdata (it HAS changed between driver rounds) or a changed
    derivation can never serve a stale text copy to the graded source
    queries (code-review r8; generalized over the table list r10)."""
    import hashlib
    import os

    parts = []
    for t in tables:
        p = os.path.join(sf_dir, f"{t}.parquet")
        try:
            st = os.stat(p)
            parts.append(f"{t}:{parquet_num_rows(sf_dir, t)}:{st.st_size}:{st.st_mtime_ns}")
        except OSError:
            parts.append(f"{t}:missing")
    return hashlib.md5("|".join(parts).encode()).hexdigest()[:16]


def _ratings_source_fingerprint(sf_dir: str) -> str:
    return _source_fingerprint(sf_dir, ("lineitem", "orders"))


def _atomic_publish(path: str, write_fn) -> None:
    """Write-once atomic publish of a Spark output directory (the r8
    race/correctness discipline, single-sourced r10): no-op if ``path``
    already holds a complete (_SUCCESS-marked) copy; otherwise
    ``write_fn(staging)`` writes to a process-unique staging dir which
    is ``os.rename``d into place — two first-run processes racing each
    produce a complete set and exactly one wins the rename, never an
    interleaved mixed directory.  On rename failure the staging dir is
    removed and the occupant is VERIFIED complete before being trusted
    (a rename can also fail for permissions or a foreign squatter, not
    just a concurrent winner)."""
    import os
    import shutil
    import uuid

    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return
    staging = f"{path}.staging-{uuid.uuid4().hex}"
    try:
        write_fn(staging)
    except BaseException:
        shutil.rmtree(staging, ignore_errors=True)
        raise
    try:
        os.rename(staging, path)
    except OSError:
        shutil.rmtree(staging, ignore_errors=True)
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            raise RuntimeError(
                f"_atomic_publish: rename to {path!r} failed and the "
                "occupant is not a complete published copy (no _SUCCESS "
                "marker)"
            )


def materialize_ratings_text(spark: SparkSession, sf_dir: str, fmt: str) -> str:
    """Write the derived ratings relation once as the reference's native
    text format and return the directory path.  ``fmt``: ``"pipe"`` →
    unquoted ``user|item|rating`` lines (moviesSimilarities.py:≈55),
    ``"quoted"`` → ``"user";"item";"rating"`` with string keys
    (vectorSimilarities.py:≈90 Book-Crossing).

    Idempotence + safety (code-review r8): the cache directory is keyed
    by a FINGERPRINT of the source parquet (row counts/sizes/mtimes), so
    regenerated testdata gets a fresh copy instead of a silently stale
    one; and the write is ATOMIC-publish — Spark writes to a
    process-unique staging dir which is ``os.rename``d into place, so
    two first-run processes racing (pytest + bench sharing one tempdir)
    each produce a complete set and exactly one wins the rename, never
    an interleaved mixed directory."""
    import os
    import tempfile

    if fmt not in ("pipe", "quoted"):
        raise ValueError(f"unknown ratings text format: {fmt!r}")
    # The fingerprint is part of the CACHE KEY, not just the directory
    # name: it is a cheap metadata read, and recomputing it per call means
    # testdata regenerated WITHIN one process immediately misses the
    # in-memory cache instead of serving the pre-regeneration text copy
    # (ADVICE r8).
    fp = _ratings_source_fingerprint(sf_dir)
    key = (os.path.abspath(sf_dir), fmt, fp)
    cached = _CSV_CACHE.get(key)
    if cached is not None:
        return cached
    slug = os.path.abspath(sf_dir).strip(os.sep).replace(os.sep, "_")
    path = os.path.join(
        tempfile.gettempdir(), "spark_graft_csv", slug, f"{fmt}-{fp}"
    )

    def write(staging: str) -> None:
        ratings = derive_ratings(spark, sf_dir)
        if fmt == "pipe":
            ratings.write.mode("overwrite").csv(staging, sep="|", header=False)
        else:
            # String keys, every field quoted — the Book-Crossing shape.
            ratings.select(
                F.col("user_id").cast("string"),
                F.col("item_id").cast("string"),
                F.col("rating"),
            ).write.mode("overwrite").csv(
                staging, sep=";", quote='"', quoteAll=True, header=False
            )

    _atomic_publish(path, write)
    _CSV_CACHE[key] = path
    return path


def parquet_num_rows(sf_dir: str, table: str) -> int | None:
    """Driver-side row count from the parquet footer — a pure metadata
    read, no Spark job (on a real cluster this comes from catalog
    statistics).  Returns None when the footer is unreadable (missing
    file, directory-shaped dataset, …) so each caller picks its own
    fallback — the size-dispatch sites all share this contract."""
    try:
        import os

        import pyarrow.parquet as pq

        return pq.ParquetFile(
            os.path.join(sf_dir, f"{table}.parquet")
        ).metadata.num_rows
    except Exception:
        return None


# ---------------------------------------------------------------------------
# JSONL documents source (round 10) — the LLM-corpus interchange format.
# Shares the ratings materializer's cache/publish machinery
# (_source_fingerprint + _atomic_publish — single-sourced, code-review
# r10): fingerprint-keyed directory (regenerated testdata can never
# serve a stale copy), process-unique staging + atomic rename,
# _SUCCESS-verified occupant on rename failure.
# ---------------------------------------------------------------------------

_JSONL_CACHE: dict[tuple[str, str], str] = {}

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def materialize_documents_jsonl(spark: SparkSession, sf_dir: str) -> str:
    """Write the documents table once as JSON-lines (one object per
    line — the format LLM corpus tooling interchanges) and return the
    directory path.  Values are strings and int64s, so the text
    round-trip is exact by construction."""
    import os
    import tempfile

    fp = _source_fingerprint(sf_dir, ("documents",))
    key = (os.path.abspath(sf_dir), fp)
    cached = _JSONL_CACHE.get(key)
    if cached is not None:
        return cached
    slug = os.path.abspath(sf_dir).strip(os.sep).replace(os.sep, "_")
    path = os.path.join(
        tempfile.gettempdir(), "spark_graft_jsonl", slug, f"docs-{fp}"
    )
    _atomic_publish(
        path,
        lambda staging: load_table(spark, sf_dir, "documents")
        .write.mode("overwrite")
        .json(staging),
    )
    _JSONL_CACHE[key] = path
    return path


def read_documents_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Schema-first JSONL scan of a documents corpus.

    The explicit schema is the scale decision: without it Spark runs a
    full inference pre-pass (a 100 TB corpus read TWICE); with it the
    scan splits by line ranges at full read parallelism, exactly like
    the csv path, and malformed lines land in the PERMISSIVE null row
    instead of killing tasks."""
    return spark.read.schema(DOCUMENTS_SCHEMA).json(path)
