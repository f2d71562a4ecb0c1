import os

import pytest

from hetman_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="hetman-tests", master="local[4]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")
