from __future__ import annotations

import os

import pytest


@pytest.fixture(scope="session")
def spark():
    from pgvecto_rs_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    s = get_spark("pgvecto-rs-spark-tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s


SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
