from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # keep test JVM small


@pytest.fixture(scope="session", autouse=True)
def adversarial_fixture_dir():
    """Regenerate /root/testdata_adv if absent: it is a deterministic
    DERIVED artifact (tools/make_adversarial_events.py) and does not
    survive container resets, but tests reference it by literal path so
    the driver's check_oracles runs stay copy-pasteable."""
    if not os.path.exists("/root/testdata_adv/embeddings.parquet"):
        import subprocess
        import sys as _sys

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        subprocess.run(
            [_sys.executable, os.path.join(repo, "tools", "make_adversarial_events.py")],
            check=True,
        )


@pytest.fixture(scope="session")
def spark():
    from ts_process_spark.session import get_spark

    s = get_spark("ts_process_spark_tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()
