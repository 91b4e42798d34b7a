from __future__ import annotations

import pytest

from hnsw_spark.session import get_spark


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    # Per-session catalog isolation (VERDICT r11 #4): the default Derby
    # metastore (`metastore_db/` in the CWD) is single-writer, so any
    # OTHER Spark session on the box — a concurrent oracle replay, a
    # second pytest run — made every saveAsTable test
    # (test_layout.py:test_bucketed_join_skips_shuffle) flake with a
    # Derby lock error.  Pointing the JDO connection and the warehouse at
    # this session's own tmpdir makes the suite immune to whatever else
    # runs on the box; on a real cluster the metastore is an external
    # service and this knob is moot.
    iso = tmp_path_factory.mktemp("catalog")
    s = get_spark(
        app_name="hnsw_spark_tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={
            "spark.sql.warehouse.dir": str(iso / "warehouse"),
            "javax.jdo.option.ConnectionURL": (
                f"jdbc:derby:;databaseName={iso / 'metastore_db'};create=true"
            ),
            "spark.driver.extraJavaOptions": (
                f"-Dderby.system.home={iso}"
            ),
        },
    )
    yield s
    s.stop()
