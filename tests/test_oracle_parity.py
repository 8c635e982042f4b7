"""Every registered query hash-matches its DuckDB oracle (driver's t2 gate).

Runs at the driver-fidelity scale sf0.01 by default (conftest.py
PARITY_SF_DIR); set PARITY_SF_DIR=/root/testdata/sf0.001 for a faster
smoke pass.
"""

from __future__ import annotations

import pytest

from recsys_mapreduce_mrjob_spark import registry

from .parity import compare

registry.load_all()


@pytest.mark.parametrize("name", sorted(registry.QUERIES))
def test_parity(spark, sf_dir, name):
    compare(spark, name, registry.QUERIES[name], registry.ORACLES.get(name), sf_dir)
