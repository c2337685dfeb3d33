import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from l_space_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="l-space-spark-tests",
        cores=4,
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield s


def edges_df(spark, pairs, label="knows"):
    """Helper: list[(src, dst)] → edges DataFrame."""
    return spark.createDataFrame(
        [(int(s), int(d), label) for s, d in pairs], "src long, dst long, label string"
    )
