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
