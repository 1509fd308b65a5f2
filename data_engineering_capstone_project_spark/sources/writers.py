"""Sink operators K1-K3 (SURVEY.md §2.2).

All writes are overwrite-idempotent, matching the reference's
full-refresh semantics (data_preparation.py:196 et al.; Redshift
REPLACE loads at dag_immigration.py:191-331). K3's Redshift hop is
replaced by Spark-managed tables -- the serving layer is Spark SQL over
Parquet, no second system.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """K1: full-refresh parquet write (data_preparation.py:196-197)."""
    df.write.mode(mode).parquet(path)


def write_parquet_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    mode: str = "overwrite",
) -> None:
    """K2: hive-style partitioned write (data_preparation.py:459-460).

    This is the reference's 100x-scale answer (README.md:114-117) and
    ours: a year=/month= (or date=) layout means predicates on those
    columns prune whole directories before any I/O. At 100 TB, partition
    columns should be the dominant filter axes of the workload.
    """
    df.write.partitionBy(*partition_cols).mode(mode).parquet(path)


def write_table(
    df: DataFrame,
    name: str,
    partition_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """K3: warehouse table (replaces the S3->Redshift COPY,
    dag_immigration.py:191-331). saveAsTable registers it in the Spark
    catalog so the E3-style ad-hoc SQL surface hits it directly.
    """
    writer = df.write.mode(mode)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.saveAsTable(name)
