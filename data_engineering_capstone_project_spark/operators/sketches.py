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

CMS_W = 256
CMS_P = 1000000007
# (a, b) pairs for the d=4 CMS rows: fixed multiplicative-hash
# constants (xxhash/Knuth primes), all < 2^32. Overflow bound: the
# largest intermediate is a*key + b < 2^32 * 2^30 ~ 2^62 < 2^63 for
# any key below ~2^30 — same envelope as the KMV hash. ANSI mode
# fails loudly past it.
CMS_HASHES = (
    (2654435761, 1),
    (2246822519, 3),
    (3266489917, 7),
    (668265263, 31),
)


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
    return (
        kmv_min_set(df, group_col, id_col, k)
        .groupBy(group_col)
        .agg(F.max("h").alias("kth"), F.count("*").alias("n"))
    )


def kmv_min_set(
    df: DataFrame,
    group_col: str,
    id_col: str,
    k: int = KMV_K,
) -> DataFrame:
    """(group, h) rows: the per-group k-min hash SET itself — the
    full KMV state (``kmv_sketch``'s (kth, n) is an agg of this; the
    set form is what sketch SET ALGEBRA needs, because intersection
    estimation inspects which hashes the sets share). Same plan shape
    as the scalar sketch: one distinct agg over (group, hash), then
    WindowGroupLimit for the per-group k-smallest. NULL-id contract
    identical to ``kmv_sketch``."""
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
        .select(F.col("g").alias(group_col), "h")
    )


def kmv_pair_intersection(
    sets: DataFrame, group_col: str, k: int = KMV_K
) -> DataFrame:
    """KMV set algebra (Beyer et al., SIGMOD 2007): for every
    unordered pair of groups, estimate |A ∩ B| from the two k-min
    sets ALONE — no second corpus pass. Union-merge the pair's hash
    sets and re-take the k smallest (exact, by the same guarantee as
    ``kmv_merge``); within that k-min union, count hashes present in
    BOTH original sets (``overlap``). overlap/n_u estimates the
    Jaccard similarity, and (overlap · U) / n_u estimates the
    intersection, where U is the union's KMV estimate. When n_u < k
    both sets fit entirely, so overlap IS the exact hash-set
    intersection. All arithmetic is int64 floor-division —
    engine-exact.

    Input is the groups×k set frame (aggregate-sized); every join
    here is on that frame, so pair estimation costs nothing at corpus
    scale — the whole point versus the exact self-join matrix
    (``audience_overlap_matrix``), whose distinct (user, type) frame
    is corpus-sized at 100 TB."""
    a = sets.select(F.col(group_col).alias("type_a"), "h")
    b = sets.select(F.col(group_col).alias("type_b"), "h")
    ga = a.select("type_a").distinct()
    gb = b.select("type_b").distinct()
    pairs = ga.crossJoin(gb).filter(F.col("type_a") < F.col("type_b"))
    la = pairs.join(a, "type_a").select(
        "type_a", "type_b", "h",
        F.lit(1).alias("in_a"), F.lit(0).alias("in_b"),
    )
    lb = pairs.join(b, "type_b").select(
        "type_a", "type_b", "h",
        F.lit(0).alias("in_a"), F.lit(1).alias("in_b"),
    )
    pooled = (
        la.unionByName(lb)
        .groupBy("type_a", "type_b", "h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    w = Window.partitionBy("type_a", "type_b").orderBy(F.asc("h"))
    kmin = pooled.withColumn("r", F.row_number().over(w)).filter(
        F.col("r") <= k
    )
    agg = kmin.groupBy("type_a", "type_b").agg(
        F.max("h").alias("kth"),
        F.count("*").alias("n"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("overlap"),
    )
    union_est = kmv_estimate(k)
    return agg.select(
        "type_a",
        "type_b",
        F.col("n").cast("bigint").alias("n_u"),
        F.col("overlap").cast("bigint").alias("overlap"),
        union_est.alias("union_est"),
        # floor((overlap * U) / n_u): both factors are non-negative
        # int64 (product <= 32 * ~1e9 ~ 3.2e10, exact in double), so
        # floor() == integer div — same value DuckDB's // yields.
        F.floor(F.col("overlap") * union_est / F.col("n"))
        .cast("bigint")
        .alias("inter_est"),
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


def _cms_bucket(key: Column, a: int, b: int) -> Column:
    """Row hash ((a*key + b) mod P) mod w — pure int64, identical in
    any engine (DuckDB writes it as the same arithmetic)."""
    return F.pmod(
        F.pmod(key.cast("bigint") * F.lit(a) + F.lit(b), F.lit(CMS_P)),
        F.lit(CMS_W),
    ).cast("int")


def cms_cells(df: DataFrame, key_col: str, *, count_col: str | None = None) -> DataFrame:
    """Count-Min sketch state (Cormode & Muthukrishnan 2005) over an
    integer key column: d=4 rows x w=256 buckets of ADDITIVE counts
    ``(r, b, cnt)`` — at most 1024 rows regardless of corpus size.
    ONE corpus scan: each key fans out map-side to its d (row, bucket)
    cells via a 4-element explode, then a partial-aggregating groupBy
    collapses to the grid. Additivity is the point — cells from
    slices, days, or micro-batches merge by plain summation, so the
    sketch slots straight into the ``apply_additive_batch`` serving
    protocol (unlike KMV, whose merge needs the k-min re-take).
    NULL keys are dropped, same contract as ``kmv_sketch``.

    ``count_col`` weights each input row by an integer column instead
    of 1 (a pre-aggregated (key, cnt) frame folds in exactly)."""
    weight = (
        F.col(count_col).cast("bigint") if count_col else F.lit(1).cast("bigint")
    )
    structs = F.array(
        *[
            F.struct(
                F.lit(r).alias("r"),
                _cms_bucket(F.col(key_col), a, b).alias("b"),
            )
            for r, (a, b) in enumerate(CMS_HASHES)
        ]
    )
    return (
        df.where(F.col(key_col).isNotNull())
        .select(F.explode(structs).alias("rb"), weight.alias("wt"))
        .groupBy(F.col("rb.r").alias("r"), F.col("rb.b").alias("b"))
        .agg(F.sum("wt").alias("cnt"))
    )


def cms_lookup(cells: DataFrame, keys: DataFrame, key_col: str) -> DataFrame:
    """Point-query the sketch for every row of a SMALL ``keys`` frame:
    recompute each key's d (row, bucket) pairs, join the (broadcast,
    <=1024-row) cells grid, and take min(cnt) over the d rows — the
    CMS estimate, which can only OVERESTIMATE the true count (each
    cell holds the key's count plus non-negative collision mass).
    Extra columns on ``keys`` pass through."""
    probes = keys.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        _cms_bucket(F.col(key_col), a, b).alias("b"),
                    )
                    for r, (a, b) in enumerate(CMS_HASHES)
                ]
            )
        ).alias("rb"),
    ).select("*", F.col("rb.r").alias("r"), F.col("rb.b").alias("b")).drop("rb")
    passthrough = [c for c in keys.columns]
    return (
        probes.join(F.broadcast(cells), ["r", "b"], "left")
        .groupBy(*passthrough)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_estimate"))
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
