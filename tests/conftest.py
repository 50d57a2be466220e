from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osmix_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# The whole suite shares one JVM (~180 tests, ~30min wall): give the
# driver heap headroom for the block-manager churn unless the caller
# already sized it.
os.environ.setdefault("SPARK_DRIVER_MEM", "12g")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("osmix-tests", cores=4, shuffle_partitions=4)
    yield s


@pytest.fixture(scope="module", autouse=True)
def _clear_cache_between_modules():
    """Drop explicit .cache() leftovers after each test module so the
    shared session's heap stays flat across the suite."""
    yield
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        active.catalog.clearCache()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
