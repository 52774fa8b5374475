"""Session-scoped Spark fixture + shared synthetic fixtures."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from o2g_spark.session import get_spark  # noqa: E402
from o2g_spark.sources import synth  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("o2g_spark_tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def pages_truth():
    return synth.gen_pages(n=1000, seed=42)


@pytest.fixture(scope="session")
def zones_pdf():
    return synth.gen_zones(seed=42)


@pytest.fixture(scope="session")
def gazetteer_pdf():
    return synth.gen_gazetteer(seed=42)
