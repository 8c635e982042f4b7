"""The grading-driver contract, exercised the hostile way: a fresh process
whose cwd is NOT the repo, a bare SparkSession with a non-UTC timezone,
only sys.path pointing at the repo.

This reproduces the exact environment that broke every Python-UDF query in
round 2 (workers couldn't import the package — the driver's cwd, not
sys.path, is what forked Python workers used to see): __spark_entry__ must
ship the package to workers itself (`_ship_package` / addPyFile).
"""

from __future__ import annotations

import subprocess
import sys

_SCRIPT = """
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.session.timeZone", "America/New_York")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as E
assert len(E.entry(spark).collect()) > 0
qs = E.queries()
sf = "/root/testdata/sf0.001"
# One query per Python-worker surface: pandas_udf, applyInPandas, mapInPandas.
for name in ["q_udf_reg_corr", "q_udf_znorm_per_user", "q_multimodal_features"]:
    rows = qs[name](spark, sf).collect()
    assert rows, name
print("CONTRACT_OK")
"""


def test_contract_from_foreign_cwd():
    out = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        cwd="/tmp",
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert "CONTRACT_OK" in out.stdout, f"stdout={out.stdout}\nstderr={out.stderr[-2000:]}"
