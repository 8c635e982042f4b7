"""recsys_mapreduce_mrjob_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference repo ``marcelcaraciolo/recsys-mapreduce-mrjob`` (a 3-step mrjob
item–item similarity pipeline over ``user|item|rating`` text streams, see
SURVEY.md §0–§2), generalized into a full relational + streaming + LLM-data
query surface.

Design principles (SURVEY.md §1.2 / §4.2):
  - DataFrame-only: declarative logical plans, Catalyst optimizes.
  - Explicit schemas everywhere; no per-step reparse.
  - Column expressions over UDFs; pandas_udf (Arrow) when Python is needed.
  - Every operator registered in :mod:`.registry` with a DuckDB oracle.
"""

from __future__ import annotations

from .session import get_session, session_builder
from .registry import QUERIES, ORACLES, register

__all__ = ["get_session", "session_builder", "QUERIES", "ORACLES", "register"]

__version__ = "0.1.0"
