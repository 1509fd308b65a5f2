"""Dynamic partition overwrite: the incremental-load contract."""

from pyspark.sql import functions as F

from data_engineering_capstone_project_spark.sources.writers import (
    upsert_partitions,
    write_parquet_partitioned,
)


def test_upsert_replaces_only_touched_partitions(spark, tmp_path):
    path = str(tmp_path / "fact")
    base = spark.createDataFrame(
        [(1, 2024, 1, 10.0), (2, 2024, 1, 20.0),
         (3, 2024, 2, 30.0), (4, 2024, 3, 40.0)],
        "id long, year int, month int, v double",
    )
    write_parquet_partitioned(base, path, ["year", "month"])

    # Rerun month 2 with corrected data (fewer rows, new values).
    fix = spark.createDataFrame(
        [(30, 2024, 2, 99.0)], "id long, year int, month int, v double"
    )
    upsert_partitions(fix, path, ["year", "month"])

    got = {
        (r.year, r.month, r.id): r.v
        for r in spark.read.parquet(path).collect()
    }
    assert got == {
        (2024, 1, 1): 10.0,   # untouched
        (2024, 1, 2): 20.0,   # untouched
        (2024, 2, 30): 99.0,  # replaced wholesale
        (2024, 3, 4): 40.0,   # untouched
    }


def test_upsert_is_idempotent(spark, tmp_path):
    path = str(tmp_path / "fact")
    df = spark.createDataFrame(
        [(1, 2024, 1, 1.0)], "id long, year int, month int, v double"
    )
    write_parquet_partitioned(df, path, ["year", "month"])
    upsert_partitions(df, path, ["year", "month"])
    upsert_partitions(df, path, ["year", "month"])
    assert spark.read.parquet(path).count() == 1


def test_upsert_adds_new_partition(spark, tmp_path):
    path = str(tmp_path / "fact")
    write_parquet_partitioned(
        spark.createDataFrame(
            [(1, 2024, 1, 1.0)], "id long, year int, month int, v double"
        ),
        path,
        ["year", "month"],
    )
    upsert_partitions(
        spark.createDataFrame(
            [(2, 2024, 4, 2.0)], "id long, year int, month int, v double"
        ),
        path,
        ["year", "month"],
    )
    months = {
        r.month for r in spark.read.parquet(path).select("month").collect()
    }
    assert months == {1, 4}


def test_compact_parquet_merges_small_files(spark, tmp_path):
    from data_engineering_capstone_project_spark.sources.writers import (
        compact_parquet,
    )

    src, dst = str(tmp_path / "small"), str(tmp_path / "compact")
    df = spark.range(0, 10_000).selectExpr("id", "id * 2 AS v")
    df.repartition(40).write.mode("overwrite").parquet(src)
    n_small = len([p for p in (tmp_path / "small").glob("part-*")])
    assert n_small == 40

    n_files = compact_parquet(spark, src, dst, target_file_mb=128)
    assert n_files == 1
    assert len([p for p in (tmp_path / "compact").glob("part-*")]) == 1
    # content preserved exactly
    assert sorted(
        tuple(r) for r in spark.read.parquet(dst).collect()
    ) == sorted(tuple(r) for r in df.collect())


def test_merge_upsert_replaces_rows_by_key(spark, tmp_path):
    from data_engineering_capstone_project_spark.sources.writers import (
        merge_upsert_partitioned,
    )

    path = str(tmp_path / "fact")
    base = spark.createDataFrame(
        [(1, 2024, 1, 10.0), (2, 2024, 1, 20.0),
         (3, 2024, 2, 30.0), (4, 2024, 3, 40.0)],
        "id long, year int, month int, v double",
    )
    write_parquet_partitioned(base, path, ["year", "month"])

    updates = spark.createDataFrame(
        [(2, 2024, 1, 99.0),   # update existing row (same partition)
         (5, 2024, 1, 50.0)],  # brand-new key
        "id long, year int, month int, v double",
    )
    merge_upsert_partitioned(
        spark, path, updates, key_cols=["id"], partition_cols=["year", "month"]
    )
    got = {
        (r.id): (r.year, r.month, r.v)
        for r in spark.read.parquet(path).collect()
    }
    assert got == {
        1: (2024, 1, 10.0),   # untouched row in touched partition
        2: (2024, 1, 99.0),   # replaced
        3: (2024, 2, 30.0),   # untouched partition
        4: (2024, 3, 40.0),   # untouched partition
        5: (2024, 1, 50.0),   # inserted
    }


def test_merge_upsert_is_idempotent(spark, tmp_path):
    from data_engineering_capstone_project_spark.sources.writers import (
        merge_upsert_partitioned,
    )

    path = str(tmp_path / "fact")
    base = spark.createDataFrame(
        [(1, 2024, 1, 1.0), (2, 2024, 2, 2.0)],
        "id long, year int, month int, v double",
    )
    write_parquet_partitioned(base, path, ["year", "month"])
    up = spark.createDataFrame(
        [(1, 2024, 1, 7.0)], "id long, year int, month int, v double"
    )
    merge_upsert_partitioned(spark, path, up, ["id"], ["year", "month"])
    merge_upsert_partitioned(spark, path, up, ["id"], ["year", "month"])
    got = {r.id: (r.year, r.month, r.v) for r in spark.read.parquet(path).collect()}
    assert got == {1: (2024, 1, 7.0), 2: (2024, 2, 2.0)}


def test_range_clustered_files_have_disjoint_stats(spark, tmp_path):
    """write_range_clustered must produce files whose cluster-key
    ranges do not overlap — the property that makes parquet min/max
    row-group pruning selective (an unsorted write gives every file
    the full key range, so nothing ever prunes)."""
    import glob

    import pyarrow.parquet as pq

    from data_engineering_capstone_project_spark.sources.writers import (
        write_range_clustered,
    )

    path = str(tmp_path / "clustered")
    df = spark.range(100_000).select(
        (F.xxhash64("id") % 1_000_000).alias("k"), F.col("id").alias("v")
    )
    write_range_clustered(df, path, ["k"], n_files=4)

    ranges = []
    for f in glob.glob(f"{path}/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(0)
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    assert len(ranges) == 4
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping file ranges: {ranges}"


def test_zorder_layout_tightens_both_axes(spark, tmp_path):
    """Z-order vs single-axis range clustering: per-file min/max spans
    must be tight on BOTH cluster columns under Z-order, while
    single-axis clustering leaves the second column unpruned (full
    span per file)."""
    import glob

    from data_engineering_capstone_project_spark.plans.registry import events_table
    from data_engineering_capstone_project_spark.sources.writers import (
        write_range_clustered,
        write_zorder_clustered,
    )
    from tests.conftest import SF_SMALL

    ev = events_table(spark, SF_SMALL).select("user_id", "value").cache()
    zdir, rdir = str(tmp_path / "z"), str(tmp_path / "r")
    write_zorder_clustered(ev, zdir, ["user_id", "value"], n_files=8)
    write_range_clustered(ev, rdir, ["user_id"], n_files=8)

    def avg_span(d, col):
        spans = []
        for f in glob.glob(f"{d}/part-*.parquet"):
            row = (
                spark.read.parquet(f)
                .agg(F.min(col).alias("lo"), F.max(col).alias("hi"))
                .collect()[0]
            )
            spans.append(float(row.hi) - float(row.lo))
        assert len(spans) == 8
        return sum(spans) / len(spans)

    g = ev.agg(
        (F.max("value") - F.min("value")).alias("v"),
        (F.max("user_id") - F.min("user_id")).alias("u"),
    ).collect()[0]

    # Z-order must be substantially tighter than single-axis clustering
    # on the SECOND column (the one single-axis ignores)...
    assert avg_span(zdir, "value") < 0.5 * avg_span(rdir, "value")
    assert avg_span(zdir, "value") < 0.5 * g.v
    # ...while still localizing the first column below its full span
    # (single-axis wins its own axis outright — that's the trade).
    assert avg_span(zdir, "user_id") < 0.7 * g.u
    assert avg_span(rdir, "user_id") < avg_span(zdir, "user_id")
    ev.unpersist()


def test_zorder_approx_normalization_is_map_only(spark):
    """The default (approx) Z-order normalization must contain NO
    Exchange and no window sort: bucket assignment is a literal-array
    compare per row, so the keying step is one scan at any scale. The
    exact path keeps its documented single-partition ntile."""
    from data_engineering_capstone_project_spark.plans.registry import events_table
    from data_engineering_capstone_project_spark.sources.writers import zorder_keyed
    from tests.conftest import SF_SMALL

    ev = events_table(spark, SF_SMALL).select("user_id", "value")
    keyed, _ = zorder_keyed(ev, ["user_id", "value"], bits=8)
    plan = keyed._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "Window" not in plan, plan

    keyed_exact, _ = zorder_keyed(
        ev, ["user_id", "value"], bits=8, normalization="exact"
    )
    plan_exact = keyed_exact._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan_exact  # the documented exact-rank fallback


def test_delete_keys_partitioned_rewrites_only_touched(spark, tmp_path):
    """Targeted delete: doomed keys vanish, untouched rows in touched
    partitions survive, untouched partitions keep their files on disk
    (never rewritten), and the returned audit count is exact."""
    import glob
    import os

    from data_engineering_capstone_project_spark.sources.writers import (
        delete_keys_partitioned,
    )

    path = str(tmp_path / "fact")
    base = spark.createDataFrame(
        [(1, 2024, 1, 10.0), (2, 2024, 1, 20.0),
         (3, 2024, 2, 30.0), (4, 2024, 3, 40.0), (5, 2024, 3, 50.0)],
        "id long, year int, month int, v double",
    )
    write_parquet_partitioned(base, path, ["year", "month"])
    untouched_files = sorted(
        (f, os.path.getmtime(f))
        for f in glob.glob(f"{path}/year=2024/month=2/*.parquet")
    )

    doomed = spark.createDataFrame(
        [(2, 2024, 1), (5, 2024, 3), (99, 2024, 3)],  # 99: no such row
        "id long, year int, month int",
    )
    n = delete_keys_partitioned(
        spark, path, doomed, key_cols=["id"], partition_cols=["year", "month"]
    )
    assert n == 2
    got = {r.id for r in spark.read.parquet(path).collect()}
    assert got == {1, 3, 4}
    # month=2 partition was never touched: identical files, same mtime.
    assert untouched_files == sorted(
        (f, os.path.getmtime(f))
        for f in glob.glob(f"{path}/year=2024/month=2/*.parquet")
    )
    # Idempotent: re-running deletes nothing further.
    assert delete_keys_partitioned(
        spark, path, doomed, key_cols=["id"], partition_cols=["year", "month"]
    ) == 0


def test_delete_keys_partitioned_removes_fully_doomed_partition(spark, tmp_path):
    """Review-found bug pin: dynamic overwrite only replaces partitions
    present in the written frame, so a partition whose EVERY row is
    doomed must be removed by explicit directory deletion — previously
    its files silently survived and the audit count read 0."""
    import os

    from data_engineering_capstone_project_spark.sources.writers import (
        delete_keys_partitioned,
    )

    path = str(tmp_path / "fact")
    base = spark.createDataFrame(
        [(1, 2024, 1, 10.0), (2, 2024, 1, 20.0), (3, 2024, 2, 30.0)],
        "id long, year int, month int, v double",
    )
    write_parquet_partitioned(base, path, ["year", "month"])

    # month=1 is FULLY doomed; month=2 partially (not at all).
    doomed = spark.createDataFrame(
        [(1, 2024, 1), (2, 2024, 1)], "id long, year int, month int"
    )
    n = delete_keys_partitioned(
        spark, path, doomed, key_cols=["id"], partition_cols=["year", "month"]
    )
    assert n == 2
    assert not os.path.exists(f"{path}/year=2024/month=1")
    assert {r.id for r in spark.read.parquet(path).collect()} == {3}

    # Now doom the remainder: the whole table empties without error.
    doomed2 = spark.createDataFrame([(3, 2024, 2)], "id long, year int, month int")
    assert delete_keys_partitioned(
        spark, path, doomed2, key_cols=["id"], partition_cols=["year", "month"]
    ) == 1
    assert not os.path.exists(f"{path}/year=2024/month=2")
