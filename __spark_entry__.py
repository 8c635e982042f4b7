"""Driver contract for the spark-graft builder (PySpark target).

Thin views over :mod:`recsys_mapreduce_mrjob_spark.registry` — every
operator module registers its queries + DuckDB oracles there
(SURVEY.md §2.2 is the checklist).
"""

from __future__ import annotations

import hashlib
import os
import pathlib
import tempfile
import zipfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from recsys_mapreduce_mrjob_spark import registry

SMOKE_SF_DIR = "/root/testdata/sf0.001"

# Runtime-settable session configs the engine's oracle parity depends on
# (SURVEY.md §7.4): the driver owns the SparkSession, so enforce at the
# contract boundary rather than assuming our session factory built it.
_SESSION_CONF = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # The driver's own session defaults to 200 shuffle partitions — far too
    # many tasks for local test SFs (observed: every stage planned at 200).
    # Runtime-settable, so pin it here; on a real cluster AQE coalescing
    # supersedes the initial number.
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_CPUS", "32"),
}


def _ship_package(spark: SparkSession) -> None:
    """Make the engine package importable inside Spark's Python workers.

    pandas_udf / applyInPandas / mapInPandas kernels are cloudpickled BY
    REFERENCE to this package, and the driver process may run from any cwd
    with only its own sys.path knowing where the repo is — the forked
    Python workers inherit neither (caught in a dress rehearsal: every
    Python-UDF query failed with ModuleNotFoundError under a bare session
    started outside the repo).  Zip the package once per SparkContext and
    addPyFile it so workers can always resolve the import.
    """
    sc = spark.sparkContext
    if getattr(sc, "_engine_pkg_shipped", False):
        return
    pkg_dir = pathlib.Path(__file__).resolve().parent / "recsys_mapreduce_mrjob_spark"
    # Deterministic zip path keyed by the repo location (a mkdtemp per
    # SparkContext leaks a temp dir per session — ADVICE.md round 2).
    # Build under a unique name, then atomically rename so a concurrent
    # process never ships a half-written zip.
    digest = hashlib.md5(str(pkg_dir).encode()).hexdigest()[:10]
    zpath = (
        pathlib.Path(tempfile.gettempdir())
        / f"recsys_mapreduce_mrjob_spark-{digest}.zip"
    )
    tmp = zpath.with_suffix(f".{os.getpid()}.tmp")
    with zipfile.ZipFile(tmp, "w") as zf:
        for p in sorted(pkg_dir.rglob("*.py")):
            zf.write(p, arcname=str(p.relative_to(pkg_dir.parent)))
    os.replace(tmp, zpath)
    sc.addPyFile(str(zpath))
    sc._engine_pkg_shipped = True


def _ensure_conf(spark: SparkSession) -> SparkSession:
    for k, v in _SESSION_CONF.items():
        spark.conf.set(k, v)
    _ship_package(spark)
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: the reference's full R2→R14 pipeline
    (ratings → pairwise self-join → similarity metrics → per-item top-K)."""
    registry.load_all()
    return registry.QUERIES["q_topk_similar_items"](_ensure_conf(spark), SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    registry.load_all()

    def _wrap(fn):
        return lambda spark, sf_dir: fn(_ensure_conf(spark), sf_dir)

    return {name: _wrap(fn) for name, fn in registry.QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for every exact-checkable query."""
    registry.load_all()
    return dict(registry.ORACLES)
