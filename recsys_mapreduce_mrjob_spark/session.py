"""SparkSession factory with the engine's baseline configuration.

The reference (mrjob) had no session concept — each MR step was a fresh
subprocess reading text from disk (SURVEY.md §3.1).  Here one long-lived
SparkSession owns the whole pipeline; stages communicate through Tungsten
binary shuffle instead of JSON text files.

Config rationale (SURVEY.md §4.2, §7.4):
  - UTC session timezone: testdata timestamps are naive/UTC; oracle parity.
  - AQE on: runtime coalescing + skew-join splitting — the scale path for
    the pair-explosion self-join at 100 TB.
  - Arrow on: vectorized pandas_udf / toPandas transfers.
  - shuffle.partitions: small for local test SFs; on a real cluster this is
    superseded by AQE coalescing from an intentionally high initial number.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def session_builder(
    app_name: str = "recsys-mapreduce-mrjob-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession.Builder:
    """Return a pre-configured builder; callers may override before build."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("ENGINE_SHUFFLE_PARTITIONS", cpus))
    return (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("ENGINE_DRIVER_MEMORY", "16g"))
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.ui.enabled", "false")
    )


def get_session(**kwargs) -> SparkSession:
    """Build (or fetch the active) session with engine defaults."""
    return session_builder(**kwargs).getOrCreate()
