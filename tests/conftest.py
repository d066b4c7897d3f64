import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pydin_spark import get_session, register_tables  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    import tempfile
    warehouse = tempfile.mkdtemp(prefix="pydin_wh_")
    session = get_session("pydin-spark-tests", master="local[4]",
                          extra_conf={"spark.sql.shuffle.partitions": "4",
                                      "spark.driver.memory": "4g",
                                      "spark.sql.warehouse.dir": warehouse})
    yield session


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def views(spark, sf_dir):
    register_tables(spark, sf_dir)
    return sf_dir
