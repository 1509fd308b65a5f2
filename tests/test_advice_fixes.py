"""Regression tests for the round-1 ADVICE findings (edge-case
hardening of merge upsert, salted join, sign-LSH, and group z-score)."""

import pytest
from pyspark.sql import functions as F

from data_engineering_capstone_project_spark.operators.grouped import (
    group_zscore,
    group_zscore_window,
)
from data_engineering_capstone_project_spark.operators.similarity import (
    sign_lsh_bucket,
)
from data_engineering_capstone_project_spark.operators.skew import salted_join
from data_engineering_capstone_project_spark.sources.writers import (
    merge_upsert_partitioned,
    write_parquet_partitioned,
)


def test_merge_upsert_null_partition_value_keeps_survivors(spark, tmp_path):
    """Updates carrying a NULL partition value must still select the
    __HIVE_DEFAULT_PARTITION__ survivors (null-unsafe == would drop
    them while dynamic overwrite replaces that slice)."""
    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, None, 10.0), (2, None, 20.0), (3, "a", 30.0)],
        "id long, part string, v double",
    )
    write_parquet_partitioned(base, path, ["part"])
    updates = spark.createDataFrame(
        [(1, None, 99.0)], "id long, part string, v double"
    )
    merge_upsert_partitioned(spark, path, updates, ["id"], ["part"])
    got = {(r.id, r.part): r.v for r in spark.read.parquet(path).collect()}
    assert got == {
        (1, None): 99.0,  # replaced by key
        (2, None): 20.0,  # survivor in the NULL partition
        (3, "a"): 30.0,   # untouched partition
    }


def test_salted_join_rejects_unsupported_how(spark):
    df = spark.range(2).withColumnRenamed("id", "k")
    for bad in ("right", "full", "left_anti", "left_semi"):
        with pytest.raises(ValueError, match="salted_join"):
            salted_join(df, df, "k", salt_by=["k"], how=bad)


def test_sign_lsh_bucket_rejects_short_vectors(spark):
    short = spark.createDataFrame(
        [(1, [0.5] * 8)], "id long, embedding array<float>"
    )
    with pytest.raises(Exception, match="sign_lsh_bucket"):
        short.select(sign_lsh_bucket(F.col("embedding"))).collect()


def test_group_zscore_null_inputs_match_window_twin(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("a", None), ("b", None), ("b", None)],
        "k string, v double",
    )
    pandas_rows = {
        (r.k, r.v): r.zscore for r in group_zscore(df, ["k"], "v").collect()
    }
    window_rows = {
        (r.k, r.v): r.zscore
        for r in group_zscore_window(df, ["k"], "v").collect()
    }
    assert pandas_rows == window_rows
    assert pandas_rows[("a", None)] == 0.0
    assert pandas_rows[("b", None)] == 0.0


def test_read_parquet_evolving_merges_schema_generations(spark, tmp_path):
    from data_engineering_capstone_project_spark.sources.readers import (
        read_parquet_evolving,
    )

    path = str(tmp_path / "t")
    spark.createDataFrame([(1, "a")], "id long, name string").write.parquet(path)
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, name string, score double"
    ).write.mode("append").parquet(path)

    df = read_parquet_evolving(spark, path)
    assert set(df.columns) == {"id", "name", "score"}
    got = {(r.id): (r.name, r.score) for r in df.collect()}
    assert got == {1: ("a", None), 2: ("b", 9.5)}


def test_scoped_persist_reuses_same_plan_and_stays_bounded(spark):
    """scoped_persist must (a) serve the ALREADY-CACHED frame when the
    incoming DataFrame has an identical logical plan (repeated bench /
    driver invocations compute the staged subtree once), and (b) hold
    at most ONE cached frame per key when the plan changes (the r3
    leak must not return)."""
    from data_engineering_capstone_project_spark.plans.registry import (
        _PERSISTED,
        scoped_persist,
    )
    from tests.conftest import SF_SMALL

    key = "__test_scoped_persist__"
    try:
        a = spark.read.parquet(f"{SF_SMALL}/documents.parquet").groupBy(
            "lang"
        ).count()
        b = spark.read.parquet(f"{SF_SMALL}/documents.parquet").groupBy(
            "lang"
        ).count()
        p1 = scoped_persist(a, key)
        p1.count()
        assert scoped_persist(b, key) is p1  # same plan -> reused

        c = spark.read.parquet(f"{SF_SMALL}/documents.parquet").groupBy(
            "source"
        ).count()
        p2 = scoped_persist(c, key)
        assert p2 is not p1  # different plan -> replaced…
        assert p1.storageLevel.useMemory is False  # …and prev unpersisted
        assert _PERSISTED[key] is p2  # exactly one slot per key
    finally:
        prev = _PERSISTED.pop(key, None)
        if prev is not None:
            prev.unpersist()
