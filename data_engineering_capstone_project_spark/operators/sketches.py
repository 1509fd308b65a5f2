"""Mergeable sketch primitives.

KMV (k-minimum-values) distinct sketch, Bar-Yossef et al. 2002: keep
the k smallest values of a deterministic integer hash of the id; the
k-th smallest estimates the distinct count as (k-1)*M/kth. Built on
the repo's Knuth multiplicative hash, the WHOLE sketch — state and
estimate — is bit-identical in any engine (unlike HLL, whose sketch
is implementation-defined), and the k-min set is mergeable: union two
sketches and re-take the k smallest.

This module is THE single definition used by both the registered
``kmv_distinct_users`` query and the property tests — a regression in
the sketch cannot slip past a test that exercises a copy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

KMV_K = 32
KMV_M = 1000000007
KMV_A = 2654435761


def kmv_sketch(
    df: DataFrame,
    group_col: str,
    id_col: str,
    k: int = KMV_K,
) -> DataFrame:
    """(group, kth, n): the per-group KMV state — the k smallest
    distinct hash values' max (``kth``) and how many were kept
    (``n`` < k means the group's full distinct set fit in the
    sketch). One distinct agg over (group, hash) — partial map-side
    dedup collapses the Zipf head — then the per-group k-smallest
    runs as WindowGroupLimit (running top-k per partition, never a
    full per-group sort).

    NULL ids are dropped BEFORE hashing: a NULL id is not a distinct
    entity (count_distinct ignores it too), and a NULL hash is where
    engines disagree — Spark's asc() sorts NULLS FIRST (the NULL
    would displace a real hash from the k-min set) while DuckDB's
    ASC sorts NULLS LAST, so an unfiltered sketch silently diverges
    between engines for any group holding >= k hashes plus a NULL."""
    hashes = (
        df.where(F.col(id_col).isNotNull())
        .select(
            F.col(group_col).alias("g"),
            F.pmod(F.col(id_col) * F.lit(KMV_A), F.lit(KMV_M)).alias("h"),
        )
        .distinct()
    )
    w = Window.partitionBy("g").orderBy(F.asc("h"))
    return (
        hashes.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= k)
        .groupBy("g")
        .agg(F.max("h").alias("kth"), F.count("*").alias("n"))
        .withColumnRenamed("g", group_col)
    )


def kmv_partials(
    df: DataFrame,
    group_col: str,
    slice_col: str,
    id_col: str,
    k: int = KMV_K,
) -> DataFrame:
    """Per-(group, slice) PARTIAL sketches: the k smallest distinct
    hash rows ``(group, slice, h)`` for every slice of the data (a
    day, a shard, a micro-batch). This is the state you'd persist per
    partition at 100 TB — k int64s per (group, slice) — and exactly
    what ``kmv_merge`` consumes. One distinct agg over (group, slice,
    hash); the per-cell k-smallest is WindowGroupLimit, same as the
    direct sketch."""
    hashes = (
        df.where(F.col(id_col).isNotNull())
        .select(
            F.col(group_col).alias("g"),
            F.col(slice_col).alias("slc"),
            F.pmod(F.col(id_col) * F.lit(KMV_A), F.lit(KMV_M)).alias("h"),
        )
        .distinct()
    )
    w = Window.partitionBy("g", "slc").orderBy(F.asc("h"))
    return (
        hashes.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= k)
        .select(
            F.col("g").alias(group_col), F.col("slc").alias(slice_col), "h"
        )
    )


def kmv_merge(partials: DataFrame, group_col: str, k: int = KMV_K) -> DataFrame:
    """Union-merge partial sketches back into one (group, kth, n)
    sketch: pool every slice's k-min hash rows, drop duplicates
    (hash collisions across slices), re-take the k smallest. The KMV
    guarantee that makes this EXACT — not approximately-mergeable —
    is that any of the global k smallest hashes ranks <= k within
    its own slice, so it is guaranteed to be present in the pooled
    rows; the merged sketch is therefore BIT-IDENTICAL to the sketch
    a single pass over the union would build (driver-verified by
    ``kmv_merge_parity`` against the direct-sketch oracle). Input is
    slices x k rows per group — aggregate-sized, never corpus-sized."""
    pooled = partials.select(F.col(group_col).alias("g"), "h").distinct()
    w = Window.partitionBy("g").orderBy(F.asc("h"))
    return (
        pooled.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= k)
        .groupBy("g")
        .agg(F.max("h").alias("kth"), F.count("*").alias("n"))
        .withColumnRenamed("g", group_col)
    )


def kmv_estimate(k: int = KMV_K) -> Column:
    """Distinct-count estimate from (kth, n) sketch state: exact n
    when the group fit in the sketch, else the (k-1)*M/kth estimator
    in pure int64 floor-division — engine-exact ((k-1)*M ~ 3.1e10,
    far inside the bound)."""
    return (
        F.when(F.col("n") < k, F.col("n"))
        .otherwise(F.expr(f"{(k - 1) * KMV_M} div kth"))
        .cast("bigint")
    )
