import os

import pytest
from pyspark.sql import SparkSession

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("fourstore-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def quads(spark, sf_dir):
    from fourstore_spark.sources.relational import quads_from_sf_dir

    return quads_from_sf_dir(spark, sf_dir).cache()


@pytest.fixture(scope="session")
def engine(spark, quads):
    from fourstore_spark.sparql.engine import SparqlEngine

    return SparqlEngine(spark, quads)
