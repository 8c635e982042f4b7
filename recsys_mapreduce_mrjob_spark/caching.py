"""Session-scoped memoization for persisted DataFrames.

Operators that fan a derived relation into several lazy branches (the
ratings matrix, the doc-shingle relation) persist it so the derivation runs
once.  Calling ``.persist()`` on every query invocation is harmless for
correctness — Spark's CacheManager dedups by canonicalized plan — but each
call still builds the full lineage and leaves the persist lifecycle
implicit (ADVICE.md round 2).  This memo keeps ONE persisted handle per
(SparkContext, relation, sf_dir): repeated calls reuse it, and handles from
a stopped/replaced context are dropped eagerly so a long-lived driver
process that restarts sessions cannot accumulate stale references.

Unpersist-on-exit is intentionally NOT done per query: within one grading
sweep every later query re-uses the cached relation, which is the point.
``spark.catalog.clearCache()`` (bench.py between-query hygiene) remains
safe — ``memo_persist`` detects that the handle's storage level dropped to
NONE and re-registers the persist before returning it (ADVICE.md round 4:
clearCache does NOT re-persist automatically; a cleared handle stays
unpersisted forever unless someone calls ``.persist()`` again).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.storagelevel import StorageLevel

_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def _storage_level() -> StorageLevel | None:
    """Resolve the memo storage level from ``SPARK_GRAFT_MEMO_STORAGE``
    (ADVICE r6: several corpus-scale shingle/signature relations can be
    memo-persisted at once in a long grading sweep, and a memory-
    constrained driver needs a knob rather than a code edit).  Accepted:
    any ``StorageLevel`` constant name (``MEMORY_AND_DISK`` default,
    ``DISK_ONLY`` for tight heaps, ...) or ``NONE``/``OFF`` to disable
    memo persistence entirely (relations recompute per branch — slower,
    never OOMs).  Unknown names fall back to the default rather than
    crashing a sweep over an env typo."""
    name = os.environ.get("SPARK_GRAFT_MEMO_STORAGE", "MEMORY_AND_DISK").upper()
    if name in ("NONE", "OFF", "DISABLED"):
        return None
    return getattr(StorageLevel, name, StorageLevel.MEMORY_AND_DISK)


def memo_persist(
    spark: SparkSession, relation: str, sf_dir: str, build: Callable[[], DataFrame]
) -> DataFrame:
    """Return the persisted DataFrame for ``relation`` at ``sf_dir``,
    building (and persisting at the knob-selected level, default
    MEMORY_AND_DISK) it on first use per SparkContext."""
    level = _storage_level()
    if level is None:
        return build()
    app = spark.sparkContext.applicationId
    key = (app, relation, sf_dir)
    df = _CACHE.get(key)
    if df is None:
        # One live context per process (driver / pytest both): entries from
        # any other applicationId belong to a stopped session — drop them.
        for stale in [k for k in _CACHE if k[0] != app]:
            del _CACHE[stale]
        df = build().persist(level)
        _CACHE[key] = df
    else:
        lvl = df.storageLevel
        if not (lvl.useMemory or lvl.useDisk or lvl.useOffHeap):
            # spark.catalog.clearCache() dropped the persist out from under
            # the memo; re-register it so downstream fan-out still shares
            # one materialization instead of silently recomputing per branch.
            df.persist(level)
    return df


def memo_unpersist(relation: str) -> int:
    """Drop every memoized handle for ``relation`` (all sf_dirs/contexts),
    unpersisting each — the release path for a sweep that knows a
    corpus-scale relation (e.g. the xxhash64 minhash signature once the
    portable-hash exact twin is built) won't be revisited.  Returns the
    number of handles dropped."""
    keys = [k for k in _CACHE if k[1] == relation]
    for k in keys:
        try:
            _CACHE[k].unpersist()
        except Exception:
            pass  # stopped context: the persist died with it
        del _CACHE[k]
    return len(keys)
