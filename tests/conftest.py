from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF_SMOKE = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from reair_spark.session import get_spark

    s = get_spark("reair_spark_tests", cpus=min(os.cpu_count() or 4, 8))
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE


@pytest.fixture(scope="session")
def duck(sf_dir):
    from tests.oracle_check import duck_con

    con = duck_con(sf_dir)
    yield con
    con.close()
