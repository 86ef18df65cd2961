import duckdb
import pytest

from iceberg_kafka_playgroud_spark.session import get_spark
from iceberg_kafka_playgroud_spark.verify import register_duckdb_views

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests")
    yield s


@pytest.fixture(scope="session")
def ddb():
    con = duckdb.connect()
    register_duckdb_views(con, SF_DIR)
    yield con
    con.close()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
