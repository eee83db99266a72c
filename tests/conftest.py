from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from data_integration_and_visualization_uc3m_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", master="local[4]", shuffle_partitions=4)
    yield s
