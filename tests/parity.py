"""Local stand-in for the driver's DuckDB oracle compare.

Mirrors the documented contract (``__spark_entry__.py`` docstring): for a
query name, run the Spark plan and the oracle SQL on the same parquet
tables, then compare row count, sorted column names, ARROW column types,
and an order-insensitive multiset of normalized values.  Stricter than the
driver's hash in that it reports the first differing rows.

The arrow-type check exists because the driver hashes values *through
arrow*, where DuckDB's HUGEINT ``sum(BIGINT)`` surfaces as
``decimal128(38,0)`` — unequal to Spark's ``int64`` even when every value
is numerically identical.  Python ``==`` (``5 == Decimal(5)``) hid exactly
that class of bug in rounds 2–3 (VERDICT r3 "What's wrong": three driver
hash-FAILs, all un-cast integer sums).
"""

from __future__ import annotations

import math
from collections import Counter
from datetime import date, datetime
from decimal import Decimal

import duckdb
import pyarrow as pa

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


def _norm_arrow_type(t: pa.DataType) -> str:
    """Collapse representation-only arrow variants before equality.

    Width/encoding variants hash identically through the driver's value
    normalization (it reads cell values, not buffers): string vs
    large_string, list vs large_list, timestamp tz-attachment.  Numeric
    KIND differences (int64 vs decimal128 vs float64) stay distinct —
    those are the bug class this check exists to catch.
    """
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{_norm_arrow_type(t.value_type)}>"
    if pa.types.is_map(t):
        return f"map<{_norm_arrow_type(t.key_type)},{_norm_arrow_type(t.item_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(
            f"{t.field(i).name}:{_norm_arrow_type(t.field(i).type)}"
            for i in range(t.num_fields)
        )
        return f"struct<{inner}>"
    return str(t)


def compare(spark, name: str, query_fn, oracle: str | None, sf_dir: str) -> None:
    """Assert Spark result == DuckDB oracle result for ``name``."""
    sdf = query_fn(spark, sf_dir)
    s_cols = sdf.columns
    s_arrow = sdf.toArrow()
    s_rows = [
        tuple(s_arrow.column(c)[i].as_py() for c in s_cols)
        for i in range(s_arrow.num_rows)
    ]

    if oracle is None:
        assert len(s_rows) >= 0  # rows-only check: it ran
        return

    con = duck_connection(sf_dir)
    try:
        res = con.execute(oracle)
        d_cols = [d[0] for d in res.description]
        d_arrow = res.fetch_arrow_table()
        d_rows = [
            tuple(d_arrow.column(c)[i].as_py() for c in d_cols)
            for i in range(d_arrow.num_rows)
        ]
    finally:
        con.close()

    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} duck={sorted(d_cols)}"
    )
    s_types = {c: _norm_arrow_type(s_arrow.schema.field(c).type) for c in s_cols}
    d_types = {c: _norm_arrow_type(d_arrow.schema.field(c).type) for c in d_cols}
    type_diff = {
        c: (s_types[c], d_types[c]) for c in s_types if s_types[c] != d_types.get(c)
    }
    assert not type_diff, (
        f"{name}: arrow type mismatch (spark, duck) per column: {type_diff}"
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
