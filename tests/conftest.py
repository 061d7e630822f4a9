from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # keep test JVM small


@pytest.fixture(scope="session")
def spark():
    from ts_process_spark.session import get_spark

    s = get_spark("ts_process_spark_tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()
