import os
import pytest
from pyspark.sql import SparkSession

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

#: comma-separated extra jars (e.g. the spark-sql-kafka connector and its
#: kafka-clients + commons-pool2 dependencies) appended to the test
#: session's classpath — the opt-in hook that un-skips the Kafka
#: connector smoke (r5 verdict task 3). Example:
#:   SPARK_GRAFT_EXTRA_JARS=/root/reference/jars/spark-sql-kafka-0-10_2.13-4.0.0.jar,...
EXTRA_JARS = os.environ.get("SPARK_GRAFT_EXTRA_JARS", "")


@pytest.fixture(scope="session")
def spark():
    builder = (
        SparkSession.builder.master("local[4]")
        .appName("spark_expectations_spark-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
    )
    if EXTRA_JARS:
        builder = builder.config("spark.jars", EXTRA_JARS)
    s = builder.getOrCreate()
    yield s
    s.stop()


@pytest.fixture(scope="session")
def lineitem(spark):
    return spark.read.parquet(f"{SF_DIR}/lineitem.parquet")


@pytest.fixture(scope="session")
def orders(spark):
    return spark.read.parquet(f"{SF_DIR}/orders.parquet")


@pytest.fixture(scope="session")
def simple3(spark):
    # canonical reference micro-fixture (tests/integration/core/conftest.py:45-54)
    return spark.createDataFrame(
        [(0, 1, "a", 10), (1, 2, "b", 20), (2, 3, "c", 30)],
        "row_id int, col1 int, col2 string, col3 int",
    )
