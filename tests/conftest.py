import os

import pytest

from spandex_spark.session import get_spark
from spandex_spark import fixtures as fx

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "_fixtures", "sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("spandex_spark_tests", master="local[4]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def fixture_dir():
    marker = os.path.join(FIXTURE_DIR, ".complete")
    if not os.path.exists(marker):
        fx.write_all(FIXTURE_DIR, 0.001)
        open(marker, "w").close()
    return FIXTURE_DIR
