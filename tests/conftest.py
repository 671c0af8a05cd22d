import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from duckdb_psql_spark.session import default_spark

    s = default_spark(app_name="psql-spark-tests", cpus=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def psql(spark):
    from duckdb_psql_spark import PsqlSession

    # t1 fixture from the reference suite (/root/reference/test/sql/psql.test:6);
    # content is never asserted there (FIXTURES.md §1), a few rows suffice.
    spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30), (None, 40)], "i int, j int"
    ).createOrReplaceTempView("t1")
    return PsqlSession(spark)


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
