from __future__ import annotations

import pytest

from data_engineering_capstone_project_spark.quality import (
    DataQualityError,
    expect_no_nulls,
    expect_nonempty,
    expect_unique,
    null_counts,
)


def test_null_counts_single_pass(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "x"), (None, None)], "a int, b string"
    )
    assert null_counts(df, ["a", "b"]) == {"a": 1, "b": 2}


def test_expect_no_nulls(spark):
    df = spark.createDataFrame([(1, "x")], "a int, b string")
    expect_no_nulls(df, ["a", "b"], table="t")
    bad = spark.createDataFrame([(1, None)], "a int, b string")
    with pytest.raises(DataQualityError, match="contains NULLs"):
        expect_no_nulls(bad, ["a", "b"], table="t")


def test_expect_nonempty(spark):
    df = spark.createDataFrame([(1,)], "a int")
    assert expect_nonempty(df, "t") == 1
    with pytest.raises(DataQualityError, match="empty"):
        expect_nonempty(df.filter("a > 1"), "t")


def test_expect_unique(spark):
    df = spark.createDataFrame([(1, "a"), (1, "b")], "k int, v string")
    expect_unique(df, ["k", "v"], table="t")
    with pytest.raises(DataQualityError, match="duplicate"):
        expect_unique(df, ["k"], table="t")


def test_expect_max_length(spark):
    from data_engineering_capstone_project_spark.quality import (
        DataQualityError,
        expect_max_length,
    )

    df = spark.createDataFrame(
        [("abc", "x"), ("de", None)], "a string, b string"
    )
    expect_max_length(df, {"a": 3, "b": 1}, table="t")  # passes
    with pytest.raises(DataQualityError, match="exceeds declared lengths"):
        expect_max_length(df, {"a": 2}, table="t")


def test_observed_write_single_pass(spark, tmp_path):
    """observe()-based gate: metrics come from the write job itself;
    clean data passes, a NULL column fails AFTER the write."""
    from data_engineering_capstone_project_spark.quality import (
        DataQualityError,
        observed_write_parquet,
    )

    good = spark.createDataFrame(
        [(1, "a"), (2, "b")], "id bigint, name string"
    )
    out = str(tmp_path / "good")
    m = observed_write_parquet(good, out, ["id", "name"], table="good")
    assert m["rows"] == 2 and m["nulls_id"] == 0
    assert spark.read.parquet(out).count() == 2

    bad = spark.createDataFrame(
        [(1, "a"), (None, "b")], "id bigint, name string"
    )
    with pytest.raises(DataQualityError, match="NULL"):
        observed_write_parquet(bad, str(tmp_path / "bad"), ["id"], table="bad")


def test_fk_violations_detects_orphans_and_nulls(spark, tmp_path):
    """The fixture tables are integral (all-zero report), so pin the
    detection logic on a corpus WITH violations: null FKs and orphans
    must be counted separately and per-edge."""
    import shutil

    from data_engineering_capstone_project_spark.plans.relational import (
        fk_violations,
    )
    from tests.conftest import SF_SMALL

    sf = str(tmp_path)
    import os

    for t in ("orders", "lineitem", "part", "supplier", "customer",
              "nation", "region"):
        src = f"{SF_SMALL}/{t}.parquet"
        dst = f"{sf}/{t}.parquet"
        if os.path.isdir(src):
            shutil.copytree(src, dst)
        else:
            shutil.copy(src, dst)
    # Corrupt orders: 3 orphan custkeys, 2 null custkeys.
    o = spark.read.parquet(f"{sf}/orders.parquet")
    from pyspark.sql import functions as F

    corrupted = o.withColumn(
        "o_custkey",
        F.when(F.col("o_orderkey") % 500 == 0, F.lit(None))
        .when(F.col("o_orderkey") % 499 == 0, F.lit(99_999_999))
        .otherwise(F.col("o_custkey")),
    )
    n_null = corrupted.filter(F.col("o_custkey").isNull()).count()
    n_orphan = corrupted.filter(F.col("o_custkey") == 99_999_999).count()
    assert n_null > 0 and n_orphan > 0
    corrupted.write.mode("overwrite").parquet(f"{sf}/orders_new.parquet")
    dst = f"{sf}/orders.parquet"
    shutil.rmtree(dst) if os.path.isdir(dst) else os.remove(dst)
    shutil.move(f"{sf}/orders_new.parquet", dst)

    rows = {r.relationship: r for r in fk_violations(spark, sf).collect()}
    edge = rows["orders.o_custkey->customer"]
    assert edge.null_fk == n_null
    assert edge.orphans == n_orphan
    # The untouched nation edge stays clean.
    assert rows["customer.c_nationkey->nation"].orphans == 0
