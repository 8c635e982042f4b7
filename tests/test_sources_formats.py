"""Source-format breadth: the engine reads the same relation from
parquet, CSV, and JSON-lines with explicit schemas (reference R3's
pluggable-input idea, schema-first), and the PERMISSIVE text readers
tolerate malformed lines instead of crashing the task (unlike the
reference's mappers, which would throw on a bad split)."""

from __future__ import annotations

from pyspark.sql import functions as F

from recsys_mapreduce_mrjob_spark.sources.readers import (
    load_table,
    read_ratings_pipe,
)


def _multiset(df):
    from collections import Counter

    return Counter(tuple(r) for r in df.collect())


def test_same_relation_from_csv_and_json(spark, sf_dir, tmp_path):
    nation = load_table(spark, sf_dir, "nation")
    csv_dir = str(tmp_path / "nation_csv")
    json_dir = str(tmp_path / "nation_json")
    nation.write.option("header", "true").csv(csv_dir)
    nation.write.json(json_dir)

    schema = "n_nationkey int, n_name string, n_regionkey int"
    from_csv = spark.read.csv(csv_dir, header=True, schema=schema)
    from_json = spark.read.json(json_dir, schema=schema)

    expect = _multiset(nation)
    assert _multiset(from_csv) == expect
    assert _multiset(from_json) == expect


def test_pipe_reader_is_permissive_on_malformed_lines(spark, tmp_path):
    src = tmp_path / "ratings.txt"
    src.write_text(
        "1|10|3.5\n"
        "garbage line without pipes\n"
        "2|20|not_a_number\n"
        "3|30|4.0\n"
    )
    df = read_ratings_pipe(spark, str(src))
    rows = df.collect()
    # All 4 lines produce rows (PERMISSIVE), malformed fields become null —
    # the task never dies.
    assert len(rows) == 4
    good = df.where(F.col("rating").isNotNull())
    assert good.count() == 2
    assert {(r.user_id, r.item_id) for r in good.collect()} == {(1, 10), (3, 30)}


def test_parquet_schema_evolution_merges(spark, tmp_path):
    """A long-lived 100 TB table gains columns over its lifetime; readers
    must union old and new file schemas (``mergeSchema``) with nulls for
    the pre-evolution files instead of failing or silently dropping the
    new column."""
    path = str(tmp_path / "evolving")
    spark.range(5).select(
        F.col("id").alias("k"), F.lit(1.0).alias("v")
    ).write.mode("append").parquet(path)
    spark.range(5, 10).select(
        F.col("id").alias("k"), F.lit(2.0).alias("v"), F.lit("new").alias("extra")
    ).write.mode("append").parquet(path)
    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(merged.columns) == {"k", "v", "extra"}
    assert merged.count() == 10
    assert merged.where(F.col("extra").isNull()).count() == 5
    assert merged.where(F.col("extra") == "new").count() == 5


def test_same_relation_from_orc_and_jsonl_sinks(spark, sf_dir, tmp_path):
    """The dedicated ORC and JSON-lines sinks round-trip the relation
    byte-for-value; ORC scans push filters down like parquet (the plan
    shows the ORC scan with PushedFilters)."""
    from recsys_mapreduce_mrjob_spark.sources.sinks import write_jsonl, write_orc

    nation = load_table(spark, sf_dir, "nation")
    orc_dir = str(tmp_path / "nation_orc")
    jsonl_dir = str(tmp_path / "nation_jsonl")
    write_orc(nation, orc_dir)
    write_jsonl(nation, jsonl_dir)

    schema = "n_nationkey int, n_name string, n_regionkey int"
    from_orc = spark.read.orc(orc_dir)
    from_jsonl = spark.read.json(jsonl_dir, schema=schema)
    expect = _multiset(nation)
    assert _multiset(from_orc.select(*nation.columns)) == expect
    assert _multiset(from_jsonl) == expect

    plan = (
        from_orc.where(F.col("n_regionkey") == 1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters" in plan and "n_regionkey" in plan
