"""Unit tests for the temporal join and skew operators on tiny frames."""

from pyspark.sql import functions as F

from data_engineering_capstone_project_spark.operators.joins import (
    asof_join,
    range_join_bucketed,
)
from data_engineering_capstone_project_spark.operators.skew import salted_join


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_asof_join_basic(spark):
    left = spark.createDataFrame(
        [(1, 10), (1, 25), (2, 5), (3, 50)], "k int, lt int"
    )
    right = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (2, 6, "c")], "k int, rt int, v string"
    )
    out = asof_join(left, right, on="k", left_time="lt", right_time="rt",
                    value_cols=["rt", "v"])
    got = _rows(out, "k", "lt", "rt", "v")
    # (1,10) matches rt=10 inclusively; (1,25) takes latest rt=20;
    # (2,5) has no rt<=5 -> NULLs kept (left); (3,50) no right rows.
    assert got == [
        (1, 10, 10, "a"),
        (1, 25, 20, "b"),
        (2, 5, None, None),
        (3, 50, None, None),
    ]


def test_asof_join_inner_drops_unmatched(spark):
    left = spark.createDataFrame([(1, 10), (2, 5)], "k int, lt int")
    right = spark.createDataFrame([(1, 9, 1.5)], "k int, rt int, v double")
    out = asof_join(left, right, on="k", left_time="lt", right_time="rt",
                    value_cols=["v"], how="inner")
    assert _rows(out, "k", "lt", "v") == [(1, 10, 1.5)]


def test_asof_join_tiebreak_picks_max(spark):
    left = spark.createDataFrame([(1, 10)], "k int, lt int")
    right = spark.createDataFrame(
        [(1, 10, 1, "lo"), (1, 10, 9, "hi")], "k int, rt int, pri int, v string"
    )
    out = asof_join(left, right, on="k", left_time="lt", right_time="rt",
                    value_cols=["v"], right_tiebreak="pri")
    assert _rows(out, "k", "v") == [(1, "hi")]


def test_range_join_matches_naive_filter(spark):
    left = spark.createDataFrame(
        [(k, t) for k in (1, 2) for t in range(0, 100, 7)], "k int, lt int"
    )
    right = spark.createDataFrame(
        [(k, t, t * 10) for k in (1, 2, 3) for t in range(0, 100, 5)],
        "k int, rt int, rv int",
    )
    lower, upper = 0, 12
    got = _rows(
        range_join_bucketed(left, right, on="k", left_time="lt",
                            right_time="rt", lower=lower, upper=upper),
        "k", "lt", "rt", "rv",
    )
    naive = _rows(
        left.join(right, "k").filter(
            (F.col("rt") > F.col("lt") + lower)
            & (F.col("rt") <= F.col("lt") + upper)
        ),
        "k", "lt", "rt", "rv",
    )
    assert got == naive and len(got) > 0


def test_range_join_custom_bucket_width(spark):
    left = spark.createDataFrame([(1, 10)], "k int, lt int")
    right = spark.createDataFrame([(1, 15), (1, 40)], "k int, rt int")
    out = range_join_bucketed(left, right, on="k", left_time="lt",
                              right_time="rt", lower=0, upper=10, bucket=64)
    assert _rows(out, "k", "rt") == [(1, 15)]


def test_salted_join_equals_plain_join(spark):
    # One hot key (0) with many rows, plus a long tail.
    fact = spark.createDataFrame(
        [(i, 0 if i % 3 else i % 7, float(i)) for i in range(200)],
        "row_id int, k int, v double",
    )
    dim = spark.createDataFrame(
        [(k, f"dim_{k}") for k in range(7)], "k int, name string"
    )
    got = _rows(
        salted_join(fact, dim, on="k", salt_by=["row_id"], salts=4),
        "row_id", "k", "v", "name",
    )
    want = _rows(fact.join(dim, "k"), "row_id", "k", "v", "name")
    assert got == want and len(got) == 200


def test_salted_join_left_keeps_unmatched(spark):
    fact = spark.createDataFrame([(1, 99, 1.0)], "row_id int, k int, v double")
    dim = spark.createDataFrame([(1, "one")], "k int, name string")
    out = salted_join(fact, dim, on="k", salt_by=["row_id"], salts=3,
                      how="left")
    assert _rows(out, "k", "name") == [(99, None)]
