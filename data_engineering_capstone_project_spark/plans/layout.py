"""Data-layout engineering: Z-order clustering and zone-map skipping.

At 100 TB the fastest scan is the one that never happens: parquet
readers skip whole files (and row groups) whose min/max statistics
exclude the predicate. Which files CAN be skipped is decided at write
time by the clustering key. These queries quantify that choice on the
engine's own tables: Morton-interleaved (Z-order) file assignment
versus the arrival-order layout, audited by the zone maps each layout
would produce and the file-skipping each predicate then achieves —
the audit a table-maintenance job (Delta ``OPTIMIZE ZORDER``,
Iceberg ``rewrite_data_files`` with a z-order strategy) runs to
decide whether a rewrite pays for itself.

Everything here is metadata-sized after one scan: the per-file
min/max grid is files × 4 integers no matter how large the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_capstone_project_spark.functions.layout import (
    morton_interleave_sql,
)
from data_engineering_capstone_project_spark.sources.writers import zorder_key
from data_engineering_capstone_project_spark.plans.registry import query, table

_N_FILES = 64
_CUSTKEY_BUCKETS = 16
_PRED_CUSTKEY_BUCKET = 7
_PRED_MONTH_BUCKET = 5

_MORTON_SQL = morton_interleave_sql(
    f"(o_custkey % {_CUSTKEY_BUCKETS})", "(month(o_orderdate) - 1)", bits=4
)


@query(
    "zorder_zone_map",
    oracle=f"""
    WITH keyed AS (
        SELECT (o_custkey % {_CUSTKEY_BUCKETS}) AS b1,
               (month(o_orderdate) - 1) AS b2,
               {_MORTON_SQL} // 4 AS file_z,
               o_orderkey // ((SELECT max(o_orderkey) FROM orders)
                              // {_N_FILES} + 1) AS file_l
        FROM orders
    ),
    zones AS (
        SELECT 'zorder' AS layout, file_z AS file_id,
               min(b1) AS min_b1, max(b1) AS max_b1,
               min(b2) AS min_b2, max(b2) AS max_b2,
               count(*) AS n
        FROM keyed GROUP BY 1, 2
        UNION ALL
        SELECT 'linear' AS layout, file_l AS file_id,
               min(b1), max(b1), min(b2), max(b2), count(*)
        FROM keyed GROUP BY 1, 2
    )
    SELECT layout,
           CAST(count(*) AS BIGINT) AS files_total,
           CAST(sum(n) AS BIGINT) AS rows_total,
           CAST(sum(CASE WHEN min_b1 <= {_PRED_CUSTKEY_BUCKET}
                          AND max_b1 >= {_PRED_CUSTKEY_BUCKET}
                         THEN 1 ELSE 0 END) AS BIGINT)
               AS files_scan_custkey,
           CAST(sum(CASE WHEN min_b2 <= {_PRED_MONTH_BUCKET}
                          AND max_b2 >= {_PRED_MONTH_BUCKET}
                         THEN 1 ELSE 0 END) AS BIGINT)
               AS files_scan_month
    FROM zones GROUP BY 1
    """,
)
def zorder_zone_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order versus arrival-order layout, judged by the zone maps
    each would write. Rows get two candidate file assignments: the
    Morton code of (custkey bucket, order month) chunked into 64
    z-ranges — exactly what ``repartitionByRange`` on the Morton key
    would produce at write time — and the arrival-order layout
    (contiguous o_orderkey ranges, what plain ingestion writes). For
    each layout the audit builds the per-file min/max zone map of
    BOTH predicate columns and counts how many files a point
    predicate on each dimension must scan. The expected picture at
    any scale: the linear layout prunes nothing on either dimension
    (every orderkey-range file spans all custkey buckets and all
    months), while z-range files stay narrow in both — the
    multi-dimensional skipping that makes a 100 TB scan touch ~1/16
    of its files for either predicate, from ONE clustering key.

    Scale shape: one scan computes buckets + Morton code (pure
    integer Catalyst arithmetic inside whole-stage codegen; the
    max-orderkey scalar is a broadcast one-row join, not a collect);
    the zone grid is files-sized from the first groupBy on; the final
    audit aggregates 128 rows. The Morton key itself is the
    write-path artifact: sorting by it is how the optimized layout
    is actually produced."""
    o = table(spark, sf_dir, "orders")
    max_ok = o.agg(F.max("o_orderkey").alias("max_ok"))
    keyed = o.crossJoin(F.broadcast(max_ok)).select(
        F.pmod(F.col("o_custkey"), F.lit(_CUSTKEY_BUCKETS)).alias("b1"),
        (F.month("o_orderdate") - F.lit(1)).alias("b2"),
        F.col("o_orderkey"),
        (F.floor(F.col("max_ok") / F.lit(_N_FILES)) + F.lit(1)).alias("chunk"),
    )
    keyed = keyed.select(
        "b1",
        "b2",
        F.floor(zorder_key(["b1", "b2"], bits=4) / F.lit(4))
        .cast("bigint")
        .alias("file_z"),
        F.floor(F.col("o_orderkey") / F.col("chunk"))
        .cast("bigint")
        .alias("file_l"),
    )

    def zone(file_col: str, layout: str) -> DataFrame:
        return (
            keyed.groupBy(F.col(file_col).alias("file_id"))
            .agg(
                F.min("b1").alias("min_b1"),
                F.max("b1").alias("max_b1"),
                F.min("b2").alias("min_b2"),
                F.max("b2").alias("max_b2"),
                F.count("*").alias("n"),
            )
            .withColumn("layout", F.lit(layout))
        )

    zones = zone("file_z", "zorder").unionByName(zone("file_l", "linear"))
    scan1 = (F.col("min_b1") <= _PRED_CUSTKEY_BUCKET) & (
        F.col("max_b1") >= _PRED_CUSTKEY_BUCKET
    )
    scan2 = (F.col("min_b2") <= _PRED_MONTH_BUCKET) & (
        F.col("max_b2") >= _PRED_MONTH_BUCKET
    )
    return zones.groupBy("layout").agg(
        F.count("*").cast("bigint").alias("files_total"),
        F.sum("n").cast("bigint").alias("rows_total"),
        F.sum(scan1.cast("int")).cast("bigint").alias("files_scan_custkey"),
        F.sum(scan2.cast("int")).cast("bigint").alias("files_scan_month"),
    )
