"""Local stand-in for the driver's DuckDB oracle compare.

Mirrors the documented contract (``__spark_entry__.py`` docstring): for a
query name, run the Spark plan and the oracle SQL on the same parquet
tables, then compare row count, sorted column names, and an
order-insensitive multiset of normalized values.  Stricter than the
driver's hash in that it reports the first differing rows.
"""

from __future__ import annotations

import math
from collections import Counter
from datetime import date, datetime
from decimal import Decimal

import duckdb

TABLES = (
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


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return 0.0  # collapse -0.0
        return v
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, bytearray):
        return bytes(v)
    return v


def _rows_to_multiset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return Counter(tuple(_norm(r[i]) for i in order) for r in rows)


def compare(spark, name: str, query_fn, oracle: str | None, sf_dir: str) -> None:
    """Assert Spark result == DuckDB oracle result for ``name``."""
    sdf = query_fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    if oracle is None:
        assert len(s_rows) >= 0  # rows-only check: it ran
        return

    con = duck_connection(sf_dir)
    try:
        res = con.execute(oracle)
        d_cols = [d[0] for d in res.description]
        d_rows = res.fetchall()
    finally:
        con.close()

    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} duck={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count spark={len(s_rows)} duck={len(d_rows)}"
    )
    s_ms = _rows_to_multiset(s_rows, s_cols)
    d_ms = _rows_to_multiset(d_rows, d_cols)
    if s_ms != d_ms:
        only_s = list((s_ms - d_ms).items())[:5]
        only_d = list((d_ms - s_ms).items())[:5]
        raise AssertionError(
            f"{name}: value mismatch\n  spark-only (5): {only_s}\n  duck-only (5): {only_d}"
        )
