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
