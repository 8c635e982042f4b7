from __future__ import annotations

import os

import pytest

from recsys_mapreduce_mrjob_spark.session import get_session

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.01")
SMOKE_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_session(shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def smoke_dir():
    return SMOKE_DIR
