from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sneller_spark.session import get_spark  # noqa: E402
from sneller_spark.sql_registry import register_sql_functions  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="sneller_spark_tests",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "8g"},
    )
    # the SQL veneer is part of the session surface (as on a real
    # cluster: registered once from the spark-submit entry point), so
    # golden cases can call TIME_BUCKET/GEO_DISTANCE/... directly
    register_sql_functions(s)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")
