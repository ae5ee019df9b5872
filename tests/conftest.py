import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from smart_crawler_spark.session import spark_session  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = spark_session(app_name="tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()
