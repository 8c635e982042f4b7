"""Sinks: the reference's semicolon text format + parquet.

The reference ends with ``SemicolonValueProtocol.write`` joining the final
values with ``';'`` (moviesSimilarities.py:≈30, reconstructed — SURVEY.md
§2.1 R14).  ``write_semicolon`` reproduces that wire format as a columnar
csv write; ``write_parquet`` is the engine-native sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_semicolon(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """R14-compatible sink: ``item_x;item_y;corr;cos;reg_corr;jaccard;n``."""
    df.write.mode(mode).option("sep", ";").option("header", "false").csv(path)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Engine-native columnar sink; optional hive-style partitioning for
    partition-pruned downstream scans at scale."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines sink — the interchange format LLM-pipeline tooling
    expects; one JSON object per line, schema carried in the values."""
    df.write.mode(mode).json(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """ORC columnar sink — same pushdown/pruning story as parquet for
    deployments standardized on the ORC ecosystem."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)
