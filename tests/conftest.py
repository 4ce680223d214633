from __future__ import annotations

import os
import tempfile

import pytest

from tp_integ_data_pipeline_spark.session import get_session


@pytest.fixture(scope="session")
def spark():
    # fresh managed-table warehouse per test session (catalog tests)
    os.environ.setdefault("SPARK_GRAFT_WAREHOUSE", tempfile.mkdtemp(prefix="wh_"))
    s = get_session("tests", cpus=4)
    yield s


@pytest.fixture()
def sf_dir() -> str:
    return "/root/testdata/sf0.001"
