"""Query + oracle registry — the engine's declared surface.

Every operator the engine claims (SURVEY.md §2.2) registers here with:
  - a callable ``(spark, sf_dir) -> DataFrame`` (the Spark-native plan), and
  - optionally an ANSI-SQL oracle string DuckDB can run on the same parquet
    tables (omit for nondeterministic / non-SQL-expressible ops → the
    driver records a weaker rows-only check).

``__spark_entry__.queries()`` / ``oracle_sql()`` are thin views over this.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[["SparkSession", str], "DataFrame"]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: declare a query (and its DuckDB oracle) under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query registration: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every operator module so registrations run (idempotent)."""
    from .operators import (  # noqa: F401
        recsys,
        relational,
        aggregates,
        windows,
        setops,
        scalars,
        events,
        text,
        dedup,
        embeddings,
        graph,
        multimodal,
        sampling,
        udfs,
    )
    from . import sql  # noqa: F401
