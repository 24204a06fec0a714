"""Shared SparkSession for the test suite (session-scoped, local[4])."""

from __future__ import annotations

import pytest

from jaccard_ml_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(master="local[4]", app_name="jaccard-ml-spark-tests",
                  shuffle_partitions=8)
    yield s
    s.stop()
