"""SparkSession factory with scale-ready defaults.

Replaces the reference's ``create_spark_session`` (reference:
dags/scripts/spark/data_preparation.py:90-107), which only pulled in
hadoop-aws. Ours bakes in the settings that matter at 100 TB:

* AQE on (runtime coalescing, skew-join splitting, dynamic join
  selection) -- the single biggest lever for unpredictable data.
* Explicit shuffle partitioning sized by env so the same code runs
  local[32] in tests and 1000-executor clusters in prod.
* Arrow enabled so any Pandas-UDF path is batch-vectorized, never
  row-at-a-time.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "data-engineering-capstone-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a
    real cluster pass ``None`` and let spark-submit own it.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))

    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # In local mode the driver IS the cluster; the 1g default is the
        # first OOM at any scale. Only effective when this builder
        # launches the JVM (ignored if a session already exists).
        .config("spark.driver.memory", driver_mem)
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
        # AQE: runtime partition coalescing + skew-join handling. At 100 TB
        # the static shuffle-partition guess is always wrong somewhere; AQE
        # re-plans from actual map-output sizes.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow for any pandas_udf / mapInPandas path (similarity, multimodal).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Deterministic, portable timestamps regardless of host TZ.
        .config("spark.sql.session.timeZone", "UTC")
        # Dims up to 64 MB broadcast automatically; we still mark known dims
        # with F.broadcast explicitly (SURVEY.md §4).
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Keep parquet scans vectorized + pushdown-friendly.
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # The driver's events table has shipped as both timestamp[us]
        # (no UTC flag -> TIMESTAMP_NTZ) and TIMESTAMP(NANOS); the source
        # wrapper (plans.registry.events_table) normalizes both. nanosAsLong
        # makes the nanos encoding readable at all (Spark has no nanos type).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    return spark


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] | None = None):
    """Read the driver's parquet tables and register each as a temp view.

    Mirrors the reference's invariant that every intermediate relation is
    visible to both the DataFrame API and SQL (SURVEY.md §3 E2:
    data_preparation.py:121-484 mixes both against the same views).
    Returns {name: DataFrame}.
    """
    names = names or (
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    )
    out = {}
    for name in names:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
