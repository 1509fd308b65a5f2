"""Materialized PQ codes index (pq_codes_table / ann_pq_topk_indexed):

(a) the indexed query answers EXACTLY like the per-query-encode form —
    same ADC arithmetic, codes just come from the catalog table;
(b) an unchanged embeddings source reuses the existing index table
    (no re-encode);
(c) a regenerated source (same path, new mtime) invalidates the
    fingerprinted name and re-encodes, dropping the stale table —
    the same reuse-is-validated contract as the bucketed pair.
"""

from __future__ import annotations

import re
import shutil

import pytest

from tests.conftest import SF_SMALL


@pytest.fixture()
def src_dir(tmp_path):
    shutil.copy(f"{SF_SMALL}/embeddings.parquet", tmp_path / "embeddings.parquet")
    yield str(tmp_path)
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    tag = re.sub(r"[^0-9A-Za-z]+", "_", str(tmp_path)).strip("_")
    for t in spark.catalog.listTables():
        if tag in t.name:
            spark.sql(f"DROP TABLE IF EXISTS {t.name}")


def _index_names(spark, src_dir):
    tag = re.sub(r"[^0-9A-Za-z]+", "_", src_dir).strip("_")
    return sorted(
        t.name
        for t in spark.catalog.listTables()
        if t.name.startswith(f"pq_codes_{tag}_")
    )


def test_indexed_matches_reencode(spark):
    from data_engineering_capstone_project_spark.plans.similarity_search import (
        ann_pq_topk,
        ann_pq_topk_indexed,
    )

    direct = {tuple(r) for r in ann_pq_topk(spark, SF_SMALL).collect()}
    indexed = {tuple(r) for r in ann_pq_topk_indexed(spark, SF_SMALL).collect()}
    assert indexed == direct and len(indexed) > 0
    # cleanup: the SF_SMALL index is cheap to rebuild, don't leak it
    tag = re.sub(r"[^0-9A-Za-z]+", "_", SF_SMALL).strip("_")
    for t in spark.catalog.listTables():
        if t.name.startswith(f"pq_codes_{tag}_"):
            spark.sql(f"DROP TABLE IF EXISTS {t.name}")


def test_index_reused_then_invalidated_on_source_change(spark, src_dir):
    import os

    from data_engineering_capstone_project_spark.plans.similarity_search import (
        pq_codes_table,
    )

    codes1 = pq_codes_table(spark, src_dir)
    names1 = _index_names(spark, src_dir)
    assert len(names1) == 1
    n1 = codes1.count()
    assert n1 > 0

    # unchanged source -> same catalog table, nothing rebuilt
    pq_codes_table(spark, src_dir)
    assert _index_names(spark, src_dir) == names1

    # regenerated source (same path, new mtime) -> new fingerprint,
    # fresh encode, stale table dropped
    os.utime(f"{src_dir}/embeddings.parquet")
    codes2 = pq_codes_table(spark, src_dir)
    names2 = _index_names(spark, src_dir)
    assert names2 != names1 and len(names2) == 1
    assert codes2.count() == n1


def test_complete_dir_is_adopted_not_reencoded(spark, src_dir):
    """A fresh catalog (second process) meeting a COMPLETE fingerprint
    dir must ADOPT it as an external table — same rows, same part
    files, no rewrite — instead of rmtree'ing it under a concurrent
    reader (the race the r6 pytest/gate overlap actually hit)."""
    import pathlib

    from data_engineering_capstone_project_spark.plans.similarity_search import (
        pq_codes_table,
    )

    n1 = pq_codes_table(spark, src_dir).count()
    name = _index_names(spark, src_dir)[0]
    warehouse = pathlib.Path(
        spark.conf.get("spark.sql.warehouse.dir").replace("file:", "")
    )
    loc = warehouse / name
    parts_before = sorted(p.name for p in loc.glob("*.parquet"))
    assert parts_before and (loc / "_SUCCESS").exists()

    # simulate the second process's view: dir on disk, no catalog
    # entry. Since r12 every registration is external (commit_build),
    # so DROP keeps the files; the stash only restores them if a
    # legacy managed entry deleted them.
    stash = loc.with_suffix(".stash")
    shutil.copytree(loc, stash)
    spark.sql(f"DROP TABLE {name}")
    if loc.exists():
        shutil.rmtree(stash)  # external: files survived the DROP
    else:
        stash.rename(loc)

    codes2 = pq_codes_table(spark, src_dir)
    assert codes2.count() == n1
    parts_after = sorted(p.name for p in loc.glob("*.parquet"))
    assert parts_after == parts_before  # adopted, not rewritten
    assert _index_names(spark, src_dir) == [name]
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    shutil.rmtree(loc, ignore_errors=True)  # external drop keeps files


def test_cell_partitioned_dir_adopted_with_partitions_recovered(spark, src_dir):
    """Adoption of the IVF+PQ layout must also RECOVER the cell_id
    partitions — an adopted external table with zero recovered
    partitions reads as empty, which is worse than a rebuild."""
    import pathlib

    from data_engineering_capstone_project_spark.plans.similarity_search import (
        pq_codes_table,
    )

    codes1 = pq_codes_table(spark, src_dir, with_cells=True)
    n1 = codes1.count()
    assert n1 > 0
    name = next(
        t.name
        for t in spark.catalog.listTables()
        if t.name.startswith("ivfpq_codes_")
        and re.sub(r"[^0-9A-Za-z]+", "_", src_dir).strip("_") in t.name
    )
    warehouse = pathlib.Path(
        spark.conf.get("spark.sql.warehouse.dir").replace("file:", "")
    )
    loc = warehouse / name
    stash = loc.with_suffix(".stash")
    shutil.copytree(loc, stash)
    spark.sql(f"DROP TABLE {name}")
    if loc.exists():
        shutil.rmtree(stash)  # external since r12: files survive DROP
    else:
        stash.rename(loc)

    codes2 = pq_codes_table(spark, src_dir, with_cells=True)
    assert codes2.count() == n1  # partitions recovered, not empty
    assert "cell_id" in codes2.columns
    desc = spark.sql(f"DESCRIBE TABLE {name}").collect()
    assert "# Partition Information" in [r.col_name for r in desc]
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    shutil.rmtree(loc, ignore_errors=True)


def test_ivfpq_indexed_matches_inline_and_is_cell_partitioned(spark):
    from data_engineering_capstone_project_spark.plans.similarity_search import (
        ann_ivfpq_topk,
        ann_ivfpq_topk_indexed,
    )

    inline = {tuple(r) for r in ann_ivfpq_topk(spark, SF_SMALL).collect()}
    indexed = {
        tuple(r) for r in ann_ivfpq_topk_indexed(spark, SF_SMALL).collect()
    }
    assert indexed == inline and len(indexed) > 0

    # the index table must be hive-partitioned by cell_id, so probed
    # queries prune to their cells' directories
    tag = re.sub(r"[^0-9A-Za-z]+", "_", SF_SMALL).strip("_")
    names = [
        t.name
        for t in spark.catalog.listTables()
        if t.name.startswith(f"ivfpq_codes_{tag}_")
    ]
    assert len(names) == 1
    desc = spark.sql(f"DESCRIBE TABLE {names[0]}").collect()
    part_rows = [r.col_name for r in desc]
    assert "# Partition Information" in part_rows, part_rows
    assert "cell_id" in [r.col_name for r in desc], part_rows
    for n in names:
        spark.sql(f"DROP TABLE IF EXISTS {n}")
