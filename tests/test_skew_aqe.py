"""AQE skew-join handling: the session defaults must actually split a
hot-key partition at runtime. This is the safety net behind every
non-salted join in the engine — if a config change ever disables it,
this test fails rather than a production job running one straggler
task with 60% of the data."""

from pyspark.sql import functions as F


def test_aqe_splits_hot_key_partition(spark):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # Shrink the skew thresholds so the behavior triggers at test size;
    # at production sizes the defaults (256MB) do the same thing.
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    # skew test needs enough partitions that the hot one exceeds
    # factor x median (the test session runs only 4 by default)
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        fact = spark.range(0, 300_000).select(
            F.when(F.col("id") % 5 < 3, 0)  # 60% of rows on key 0
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            F.col("id").alias("v"),
        )
        dim = spark.range(0, 1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        joined = fact.join(dim, "k")
        assert len(joined.collect()) == 300_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
        )
        spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
        spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionFactor")
        spark.conf.set("spark.sql.shuffle.partitions", "4")
