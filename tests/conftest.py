from __future__ import annotations

import os

import pytest


@pytest.fixture(scope="session")
def spark():
    from greenex_py_spark.session import get_spark

    s = get_spark(app_name="greenex-tests", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "4")))
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")
