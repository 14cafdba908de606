import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_tool_rep_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: runs a full streaming job or large fixture")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("tests", extra_conf={
        "spark.sql.shuffle.partitions": "4",
        "spark.driver.memory": "8g",
    })
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
