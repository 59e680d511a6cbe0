import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from modelardb_rs_spark.session import make_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    # Tests pin master local[8]: the unit layer exercises tiny frames
    # where per-stage task count IS the wall clock (32-way parallelism
    # costs 32 task launches + 32 output files + 32 footer reads per
    # engine.write of 50 rows; measured 35% slower on test_txlog).
    # bench.py keeps the driver contract: local[$SPARK_GRAFT_CPUS].
    spark = make_spark(
        app_name="sparkmodelar-tests", master="local[8]", shuffle_partitions=8
    )
    yield spark


@pytest.fixture()
def engine(spark, tmp_path):
    from modelardb_rs_spark.engine import Engine

    return Engine(spark, str(tmp_path / "data_folder"))
