"""Reference-fidelity I/O: native text formats in, flagship through,
semicolon sink out (reference R1/R3/R14).

Exercises ``read_ratings_pipe`` / ``read_ratings_bookcrossing`` /
``write_semicolon`` end-to-end on the reference's own docstring
micro-fixture (FIXTURES.md §B) — the formats the upstream jobs actually
consumed (``moviesSimilarities.py:≈55``, ``vectorSimilarities.py:≈90``,
``SemicolonValueProtocol`` ≈30; reconstructed).
"""

from __future__ import annotations

import glob

from recsys_mapreduce_mrjob_spark.operators.recsys import topk_similar_items
from recsys_mapreduce_mrjob_spark.sources.readers import (
    read_ratings_bookcrossing,
    read_ratings_pipe,
)
from recsys_mapreduce_mrjob_spark.sources.sinks import write_semicolon

# The docstring micro-fixture (moviesSimilarities.py:≈55–175).
_ROWS = [
    (17, 70, 3.0),
    (35, 21, 1.0),
    (49, 19, 2.0),
    (49, 21, 1.0),
    (49, 70, 4.0),
    (87, 19, 1.0),
    (87, 21, 2.0),
    (98, 19, 2.0),
]


def test_pipe_roundtrip_to_semicolon_sink(spark, tmp_path):
    src = tmp_path / "ratings.txt"
    src.write_text("".join(f"{u}|{i}|{r}\n" for u, i, r in _ROWS))

    ratings = read_ratings_pipe(spark, str(src))
    assert [f.name for f in ratings.schema.fields] == ["user_id", "item_id", "rating"]
    assert ratings.count() == len(_ROWS)

    topk = topk_similar_items(ratings, k=10)
    out_dir = tmp_path / "out"
    write_semicolon(
        topk.select("item_x", "item_y", "corr", "cos", "reg_corr", "jaccard", "n"),
        str(out_dir),
    )

    lines = []
    for part in glob.glob(str(out_dir / "part-*")):
        with open(part) as fh:
            lines += [ln.strip() for ln in fh if ln.strip()]
    # R14 wire format: item_x;item_y;corr;cos;reg_corr;jaccard;n
    assert lines, "semicolon sink wrote nothing"
    for ln in lines:
        assert len(ln.split(";")) == 7
    # Pair (19, 21) is co-rated by users 49 and 87 with opposite rankings →
    # corr = −1 (docstring math); check it survived the round trip.
    pairs = {(ln.split(";")[0], ln.split(";")[1]): ln.split(";") for ln in lines}
    assert ("19", "21") in pairs
    assert float(pairs[("19", "21")][2]) == -1.0


def test_bookcrossing_reader_parses_quoted_semicolons(spark, tmp_path):
    src = tmp_path / "bx.csv"
    src.write_text('"11676";"0971880107";"6.0"\n"11676";"0316666343";"8.5"\n')
    df = read_ratings_bookcrossing(spark, str(src))
    rows = {(r.user_id, r.item_id): r.rating for r in df.collect()}
    assert rows[("11676", "0971880107")] == 6.0
    assert rows[("11676", "0316666343")] == 8.5


def test_partitioned_parquet_sink_prunes_partitions(spark, sf_dir, tmp_path):
    """write_parquet(partition_by=['lang']) lays out hive-style dirs and a
    lang-filtered read back scans only that partition (partition pruning —
    the 100 TB layout for any column a pipeline filters on)."""
    import io
    from contextlib import redirect_stdout

    from recsys_mapreduce_mrjob_spark.sources.readers import load_table
    from recsys_mapreduce_mrjob_spark.sources.sinks import write_parquet

    docs = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "docs_by_lang")
    write_parquet(docs, out, partition_by=["lang"])

    back = spark.read.parquet(out)
    assert back.count() == docs.count()

    filtered = back.where(back.lang == "en")
    buf = io.StringIO()
    with redirect_stdout(buf):
        filtered.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters: [isnotnull(lang" in plan
    en_expected = docs.where(docs.lang == "en").count()
    assert filtered.count() == en_expected


def test_orc_roundtrip_preserves_relation(spark, sf_dir, tmp_path):
    """ORC sink/source round-trip: the third columnar format next to
    parquet and the text formats — same relation, schema, and values
    back (types survive; no silent string-ification)."""
    from recsys_mapreduce_mrjob_spark.sources.readers import load_table

    src = load_table(spark, sf_dir, "nation")
    path = str(tmp_path / "nation_orc")
    src.write.orc(path)
    back = spark.read.orc(path)
    assert back.schema == src.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_load_events_is_session_timezone_independent(spark, sf_dir):
    """The events ts column must denote the same instant under any session
    timezone (ADVICE r4: the NTZ cast used to drift with the ambient zone;
    ``ntz_as_utc_instant`` pins naive-wall-clock-as-UTC explicitly)."""
    from pyspark.sql import functions as F

    from recsys_mapreduce_mrjob_spark.sources.readers import load_events

    tz_key = "spark.sql.session.timeZone"
    original = spark.conf.get(tz_key)
    try:
        spark.conf.set(tz_key, "UTC")
        utc_first = load_events(spark, sf_dir).select(
            F.min(F.unix_micros("ts")).alias("m")
        ).first()["m"]
        spark.conf.set(tz_key, "America/New_York")
        ny_first = load_events(spark, sf_dir).select(
            F.min(F.unix_micros("ts")).alias("m")
        ).first()["m"]
    finally:
        spark.conf.set(tz_key, original)
    assert utc_first == ny_first


def test_sharded_training_export_roundtrip(spark, smoke_dir, tmp_path):
    """The write path q_global_shuffle exists for: partition the corpus
    by its shard assignment, write shard-partitioned parquet, and read
    it back — every shard directory holds exactly its contiguous rank
    block, and the reassembled corpus (ordered by shuffle_rank) is the
    same permutation the query declared."""
    from pyspark.sql import functions as F

    from recsys_mapreduce_mrjob_spark.operators.sampling import (
        _SHARD_DOCS,
        q_global_shuffle,
    )

    out = str(tmp_path / "shards")
    shuffled = q_global_shuffle(spark, smoke_dir)
    shuffled.write.partitionBy("shard").parquet(out)

    back = spark.read.parquet(out)
    assert back.count() == shuffled.count()
    # Partition pruning reaches the shard directories.
    pruned = back.where(F.col("shard") == 0)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # The shard predicate must reach the scan as a PARTITION filter (a
    # data Filter over shard would also pass a naive contains check —
    # code-review r7 killed the vacuous `or "shard#" in plan` fallback).
    assert "PartitionFilters: [" in plan and "shard" in plan.split(
        "PartitionFilters: ["
    )[1].split("]")[0], plan
    assert pruned.count() == min(_SHARD_DOCS, back.count())
    # Each shard holds exactly its contiguous rank block.
    bad = back.where(
        F.expr(f"(shuffle_rank - 1) div {_SHARD_DOCS}") != F.col("shard")
    ).count()
    assert bad == 0
    # Round-trip preserves the declared permutation exactly.
    src = {(r.doc_id, r.shuffle_rank) for r in shuffled.collect()}
    got = {(r.doc_id, r.shuffle_rank) for r in back.collect()}
    assert src == got
