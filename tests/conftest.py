from __future__ import annotations

import pytest

from trx_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("trx_spark_tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
