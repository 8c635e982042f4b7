"""Every registered query hash-matches its DuckDB oracle (driver's t2 gate).

Run at sf0.001 by default for speed; set PARITY_SF_DIR=/root/testdata/sf0.01
for the driver-fidelity run.
"""

from __future__ import annotations

import pytest

from recsys_mapreduce_mrjob_spark import registry

from .parity import compare

registry.load_all()


@pytest.mark.parametrize("name", sorted(registry.QUERIES))
def test_parity(spark, sf_dir, name):
    compare(spark, name, registry.QUERIES[name], registry.ORACLES.get(name), sf_dir)
