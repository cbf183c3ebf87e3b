from __future__ import annotations

import pytest

from hive_exporter_spark.session import build_session

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    # 4g heap, not the 1g local-mode default: the session-scoped JVM
    # accumulates localCheckpoint blocks across hundreds of tests
    # (freed only when the Python-side refs are GC'd and the
    # ContextCleaner runs), and a long ordering-dependent test
    # sequence could OOM the driver — observed as a flaky
    # ConnectionRefusedError in the r10 layout property test when it
    # ran after the full streaming suite in one process.
    s = build_session("tests", shuffle_partitions=8,
                      extra_conf={"spark.driver.memory": "4g"})
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
