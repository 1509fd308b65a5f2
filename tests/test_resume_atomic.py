"""Failure-recovery contracts: pipeline resume manifest and
crash-consistent compaction publish."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_capstone_project_spark.pipeline import star_schema
from data_engineering_capstone_project_spark.sources import writers
from data_engineering_capstone_project_spark.sources.writers import (
    compact_parquet_atomic,
    publish_swap,
    recover_publish,
    write_parquet,
)

RAW = "/root/reference/dags/data/raw-data"


def test_pipeline_resume_skips_committed_tables(spark, tmp_path, monkeypatch):
    """A run that dies at table k leaves k manifest entries; the rerun
    with resume=True rewrites only the tables after k."""
    out = str(tmp_path / "clean")
    written: list[str] = []
    real_write = writers.write_parquet

    def failing_write(df, path, mode="overwrite"):
        name = path.rsplit("/", 1)[-1].removesuffix(".parquet")
        if name == "dim_port_of_entry":
            raise RuntimeError("simulated cluster loss")
        written.append(name)
        real_write(df, path, mode)

    monkeypatch.setattr(star_schema, "write_parquet", failing_write)
    with pytest.raises(RuntimeError, match="simulated"):
        star_schema.run_pipeline(
            spark, RAW, out, run_quality_checks=False, resume=True
        )
    first_run = list(written)
    assert "dim_port_of_entry" not in first_run
    manifest = star_schema._load_manifest(out)
    assert set(manifest) == set(first_run)

    # Rerun without the failure: committed tables are skipped.
    written.clear()

    def counting_write(df, path, mode="overwrite"):
        written.append(path.rsplit("/", 1)[-1].removesuffix(".parquet"))
        real_write(df, path, mode)

    monkeypatch.setattr(star_schema, "write_parquet", counting_write)
    res = star_schema.run_pipeline(
        spark, RAW, out, run_quality_checks=False, resume=True
    )
    assert set(res.resumed) == set(first_run)
    assert not set(written) & set(first_run), written
    # Everything is now committed (fact_immigration goes through the
    # partitioned writer, so it shows up in the manifest, not `written`).
    manifest = star_schema._load_manifest(out)
    assert set(manifest) == set(res.tables)


def _rows(spark, path):
    return {tuple(r) for r in spark.read.parquet(path).collect()}


def test_failed_compaction_leaves_live_table_readable(spark, tmp_path, monkeypatch):
    live = str(tmp_path / "t")
    df = spark.range(100).select("id", (F.col("id") * 2).alias("v"))
    df.repartition(8).write.parquet(live)
    before = _rows(spark, live)

    def exploding_compact(spark_, src, dst, target_file_mb=128):
        # Simulate dying partway through the staged rewrite: some
        # staged files exist, no rename has happened.
        spark_.read.parquet(src).limit(10).write.mode("overwrite").parquet(dst)
        raise RuntimeError("executor storm")

    monkeypatch.setattr(writers, "compact_parquet", exploding_compact)
    with pytest.raises(RuntimeError, match="executor storm"):
        compact_parquet_atomic(spark, live)
    assert _rows(spark, live) == before  # live table untouched

    # Retry with the real implementation succeeds over the orphan.
    monkeypatch.undo()
    n = compact_parquet_atomic(spark, live)
    assert n >= 1
    assert _rows(spark, live) == before


def test_publish_swap_and_recover(spark, tmp_path):
    live = str(tmp_path / "t")
    staged = str(tmp_path / "staged")
    write_parquet(spark.range(5).select("id"), live)
    write_parquet(spark.range(10).select("id"), staged)

    publish_swap(spark, staged, live)
    assert len(_rows(spark, live)) == 10

    # Simulate a crash between publish_swap's two renames: live is
    # gone, live.__old__ holds the previous table.
    import os

    os.rename(live, live + writers._OLD_SUFFIX)
    assert recover_publish(spark, live)
    assert len(_rows(spark, live)) == 10
    assert not recover_publish(spark, live)  # no-op when live exists
