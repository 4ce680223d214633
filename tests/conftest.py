from __future__ import annotations

import pytest

from tp_integ_data_pipeline_spark.session import get_session


@pytest.fixture(scope="session")
def spark():
    s = get_session("tests", cpus=4)
    yield s


@pytest.fixture()
def sf_dir() -> str:
    return "/root/testdata/sf0.001"
