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


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: measured >= 8s in the full-suite durations run; "
        "deselected by default (tests/slow_tier.py), run with -m slow "
        "or -m ''",
    )


def pytest_collection_modifyitems(config, items):
    # measured tiering (VERDICT r13 #7): the full suite is ~48 min,
    # which overran the driver's verification window in r13 (green
    # tail, tests_ok=false). Exact node ids measured >= 8 s carry the
    # `slow` marker; pyproject's addopts deselects them by default so
    # the default tier covers every module in <20 min. The slow tier
    # stays in the close-of-round protocol (`pytest -m slow`).
    from tests.slow_tier import SLOW_TESTS

    import pytest as _pytest

    for item in items:
        nodeid = item.nodeid.replace(os.sep, "/")
        if not nodeid.startswith("tests/"):
            nodeid = f"tests/{nodeid}"
        if nodeid in SLOW_TESTS:
            item.add_marker(_pytest.mark.slow)
