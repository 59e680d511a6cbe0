import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from modelardb_rs_spark.session import make_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    spark = make_spark(app_name="sparkmodelar-tests", shuffle_partitions=8)
    yield spark


@pytest.fixture()
def engine(spark, tmp_path):
    from modelardb_rs_spark.engine import Engine

    return Engine(spark, str(tmp_path / "data_folder"))
