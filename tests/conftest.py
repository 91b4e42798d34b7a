from __future__ import annotations

import pytest

from hnsw_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="hnsw_spark_tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()
