"""Similarity-search query surface over the ``embeddings`` table
(array<float>): exact brute-force cosine top-k and the LSH-bucketed
approximate variant (SURVEY.md §7 M5).

The oracle reproduces the dot product with per-element double casts;
both engines rank by the cosine ROUNDED to 4 decimals (with neighbor id
as tiebreak) so a 1-ulp summation difference can never reorder the
top-k boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from data_engineering_capstone_project_spark.operators import similarity as S
from data_engineering_capstone_project_spark.plans.registry import query, table


def _dot(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(generate_series(1, len({a})), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    )


def _valid(col: str) -> str:
    """SQL twin of ``operators.similarity.indexable``: non-NULL vector
    with a positive norm. Every similarity-family oracle filters its
    embedding sources on this, mirroring the Spark-side quarantine
    (r8 adversarial-embeddings audit)."""
    return f"({col} IS NOT NULL AND {_dot(col, col)} > 0)"


_COS = f"floor({_dot('q.qv', 'c.cv')} / (sqrt({_dot('q.qv', 'q.qv')}) * sqrt({_dot('c.cv', 'c.cv')})) * 10000) / 10000.0"


@query(
    "cosine_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
               WHERE vec_id < 10 AND {_valid('embedding')}),
         c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings
               WHERE {_valid('embedding')}),
         scored AS (
             SELECT q.query_id, c.neighbor_id, {_COS} AS cos
             FROM q CROSS JOIN c
             WHERE q.query_id <> c.neighbor_id
         )
    SELECT * FROM (
        SELECT query_id, neighbor_id, cos,
               CAST(row_number() OVER (PARTITION BY query_id
                                       ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rnk
        FROM scored
    ) WHERE rnk <= 3
    """,
)
def cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    return S.brute_force_topk(
        emb.filter(F.col("vec_id") < 10), emb, k=3
    )


_BKT = (
    "concat("
    + ", ".join(
        f"CASE WHEN {{v}}[{d}] >= 0 THEN '1' ELSE '0' END" for d in S.SIGN_DIMS
    )
    + ")"
)


@query(
    "ann_lsh_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv,
                      {_BKT.format(v='embedding')} AS bkt
               FROM embeddings
               WHERE vec_id < 10 AND {_valid('embedding')}),
         c AS (SELECT vec_id AS neighbor_id, embedding AS cv,
                      {_BKT.format(v='embedding')} AS bkt
               FROM embeddings WHERE {_valid('embedding')}),
         scored AS (
             SELECT q.query_id, c.neighbor_id, {_COS} AS cos
             FROM q JOIN c USING (bkt)
             WHERE q.query_id <> c.neighbor_id
         )
    SELECT * FROM (
        SELECT query_id, neighbor_id, cos,
               CAST(row_number() OVER (PARTITION BY query_id
                                       ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rnk
        FROM scored
    ) WHERE rnk <= 3
    """,
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    return S.ann_lsh_topk(emb.filter(F.col("vec_id") < 10), emb, k=3)


@query(
    "lsh_bucket_histogram",
    oracle=f"""
    SELECT {_BKT.format(v='embedding')} AS bkt,
           count(*) AS vectors,
           CAST(count(DISTINCT label) AS BIGINT) AS labels
    FROM embeddings
    WHERE {_valid('embedding')}
    GROUP BY 1
    """,
)
def lsh_bucket_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-occupancy diagnostics for the sign-LSH index: shows skew
    a production deployment would need to salt/split. Scoped to the
    INDEXABLE vectors (similarity.indexable) — the histogram describes
    the index, and non-indexable rows are quarantined out of it."""
    emb = table(spark, sf_dir, "embeddings").filter(
        S.indexable(F.col("embedding"))
    )
    return emb.groupBy(
        S.sign_lsh_bucket(F.col("embedding")).alias("bkt")
    ).agg(
        F.count("*").alias("vectors"),
        F.count_distinct("label").alias("labels"),
    )


@query(
    "embedding_near_dups",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding, {_BKT.format(v='embedding')} AS bkt
               FROM embeddings WHERE {_valid('embedding')}),
         a AS (SELECT vec_id AS id_a, embedding AS qv, bkt FROM e),
         b AS (SELECT vec_id AS id_b, embedding AS cv, bkt FROM e)
    SELECT id_a, id_b, cos
    FROM (
        SELECT a.id_a, b.id_b,
               {_COS.replace('q.qv', 'a.qv').replace('c.cv', 'b.cv')} AS cos
        FROM a JOIN b USING (bkt)
        WHERE a.id_a < b.id_b
    )
    WHERE cos >= 0.35
    """,
)
def embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate detection: candidate pairs from
    the sign-LSH bucket equi-join, exact cosine as the residual filter.
    The dedup twin of ann_lsh_topk — at 100 TB the all-pairs compare is
    impossible; the bucket join bounds it to O(n x bucket_size)."""
    # Squared norm computed ONCE per row and reused by the
    # indexability filter and the cosine denominator (r13, same move
    # as operators.similarity: dot() is an interpreted higher-order
    # expression, and the candidate PAIR count is quadratic in bucket
    # size — per-pair norms paid ~3x the lambda evaluations).
    sq = S.dot(F.col("embedding"), F.col("embedding"))
    withb = (
        table(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            "embedding",
            sq.alias("sq"),
            S.sign_lsh_bucket(F.col("embedding")).alias("bkt"),
        )
        .filter(F.col("embedding").isNotNull() & (F.col("sq") > 0))
    )
    a = withb.select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("qv"),
        F.col("sq").alias("qsq"),
        "bkt",
    )
    b = withb.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("cv"),
        F.col("sq").alias("csq"),
        "bkt",
    )
    cos = S.dot(F.col("qv"), F.col("cv")) / (
        F.sqrt(F.col("qsq")) * F.sqrt(F.col("csq"))
    )
    return (
        a.join(b, "bkt")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            (F.floor(cos * 10000) / F.lit(10000.0)).alias("cos"),
        )
        .filter(F.col("cos") >= 0.35)
    )


# IVF over the deterministic sampled-centroid quantizer (the 8
# lowest-id vectors): the whole index — assignment, probing, ranking —
# is reproduced by the DuckDB oracle, so IVF is value-checked end to
# end. The k-means quantizer path (train_centroids) is the quality
# variant; its parity is pinned by the recall-vs-brute-force bound in
# tests/test_vector_grouped.py instead (iterative fit, not SQL).
_IVF_FSIM = (
    f"floor({_dot('e.embedding', 'cent.centroid')} / "
    f"(sqrt({_dot('e.embedding', 'e.embedding')}) * "
    f"sqrt({_dot('cent.centroid', 'cent.centroid')})) * 10000)"
)


@query(
    "ann_ivf_topk",
    oracle=f"""
    WITH ids AS (SELECT vec_id, embedding FROM embeddings
           WHERE {_valid('embedding')} ORDER BY vec_id LIMIT 8),
    cent AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cell_id,
                    embedding AS centroid
             FROM ids),
    sc AS (
        SELECT e.vec_id, cent.cell_id, {_IVF_FSIM} AS fsim
        FROM embeddings e CROSS JOIN cent
        WHERE {_valid('e.embedding')}
    ),
    corpus_assign AS (
        SELECT vec_id, cell_id FROM (
            SELECT vec_id, cell_id,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY fsim DESC, cell_id) AS r
            FROM sc) WHERE r = 1
    ),
    query_assign AS (
        SELECT vec_id, cell_id FROM (
            SELECT vec_id, cell_id,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY fsim DESC, cell_id) AS r
            FROM sc WHERE vec_id < 10) WHERE r <= 2
    ),
    q AS (SELECT qa.vec_id AS query_id, e.embedding AS qv, qa.cell_id
          FROM query_assign qa JOIN embeddings e ON e.vec_id = qa.vec_id),
    c AS (SELECT ca.vec_id AS neighbor_id, e.embedding AS cv, ca.cell_id
          FROM corpus_assign ca JOIN embeddings e ON e.vec_id = ca.vec_id),
    scored AS (
        SELECT DISTINCT q.query_id, c.neighbor_id, {_COS} AS cos
        FROM q JOIN c USING (cell_id)
        WHERE q.query_id <> c.neighbor_id
    )
    SELECT * FROM (
        SELECT query_id, neighbor_id, cos,
               CAST(row_number() OVER (PARTITION BY query_id
                                       ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rnk
        FROM scored
    ) WHERE rnk <= 3
    """,
)
def ann_ivf_topk_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_engineering_capstone_project_spark.operators.vector_index import (
        ann_ivf_topk,
        sampled_centroids,
    )

    emb = table(spark, sf_dir, "embeddings")
    return ann_ivf_topk(
        emb.filter(F.col("vec_id") < 10), emb, k=3, n_cells=8, n_probe=2,
        centroids=sampled_centroids(emb, n_cells=8),
    )


@query(
    "cluster_balanced_sample",
    oracle=f"""
    WITH ids AS (SELECT vec_id, embedding FROM embeddings
           WHERE {_valid('embedding')} ORDER BY vec_id LIMIT 8),
    cent AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cell_id,
                    embedding AS centroid
             FROM ids),
    sc AS (
        SELECT e.vec_id, cent.cell_id, {_IVF_FSIM} AS fsim
        FROM embeddings e CROSS JOIN cent
        WHERE {_valid('e.embedding')}
    ),
    corpus_assign AS (
        SELECT vec_id, cell_id FROM (
            SELECT vec_id, cell_id,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY fsim DESC, cell_id) AS r
            FROM sc) WHERE r = 1
    ),
    counts AS (SELECT cell_id, count(*) AS cell_n
               FROM corpus_assign GROUP BY 1),
    ranked AS (
        SELECT vec_id, cell_id,
               row_number() OVER (
                   PARTITION BY cell_id
                   ORDER BY (vec_id * 2654435761) % 1000000007, vec_id
               ) AS rnk
        FROM corpus_assign
    )
    SELECT r.cell_id, r.vec_id, c.cell_n, CAST(r.rnk AS INTEGER) AS rank
    FROM ranked r JOIN counts c USING (cell_id)
    WHERE r.rnk <= 10
    """,
)
def cluster_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity-balanced selection: an EQUAL uniform quota from every
    coarse-quantizer cell of the embedding space — the cluster-
    balancing step training-data pipelines run after dedup so a
    dominant mode cannot crowd the mixture (the cluster-quota idea
    behind SemDeDup-style semantic curation, applied to selection
    instead of removal). Assignment reuses the deterministic
    sampled-centroid quantizer (operators/vector_index.py), so the
    whole query is oracle-checkable; within each cell, rows are drawn
    by the house multiplicative hash ((vec_id x 2654435761) mod
    1000000007 — uniform, engine-exact; overflow-safe to vec_id
    ~3.4e9), top-10 per cell. ``cell_n`` rides along so the readout
    shows the imbalance being corrected.

    Scale shape: centroid assignment is the map-only literal
    projection (zero corpus Exchange — the assign_cells contract);
    the per-cell rank is ONE Exchange on cell_id with a
    WindowGroupLimit top-10 (the count is a separate 8-row aggregate
    broadcast back AFTER the quota filter, so the rank window stays
    frame-free and partial top-k prunes before the shuffle)."""
    from data_engineering_capstone_project_spark.operators.vector_index import (
        assign_cells,
        sampled_centroids,
    )
    from pyspark.sql.window import Window

    emb = table(spark, sf_dir, "embeddings")
    assigned = assign_cells(
        emb.select("vec_id", "embedding"),
        sampled_centroids(emb, n_cells=8),
        n_probe=1,
    ).select("vec_id", "cell_id")
    counts = assigned.groupBy("cell_id").agg(F.count("*").alias("cell_n"))
    skey = F.expr("(vec_id * 2654435761) % 1000000007")
    w = Window.partitionBy("cell_id").orderBy(skey, F.asc("vec_id"))
    return (
        assigned.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .join(broadcast(counts), "cell_id")
        .select("cell_id", "vec_id", "cell_n", "rank")
    )


@query(
    "label_centroids",
    oracle="""
    SELECT label,
           CAST(i - 1 AS INTEGER) AS dim,
           (sum(CAST(floor(CAST(embedding[i] AS DOUBLE) * 10000000) AS BIGINT))
            / count(*)) / 10000000.0 AS mean_val
    FROM embeddings, unnest(generate_series(1, len(embedding))) t(i)
    GROUP BY 1, 2
    """,
)
def label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid vectors (class prototypes — the building
    block for nearest-class-mean classification, dataset cartography,
    and IVF retraining). posexplode is map-side; the shuffle carries
    (label, dim, int64 partial sum, count) — 64 small rows per label
    after partial agg, regardless of corpus size. The mean is
    fixed-point: int64 sum / count divided once, engine-identical."""
    emb = table(spark, sf_dir, "embeddings")
    e = emb.select("label", F.posexplode("embedding").alias("dim", "x"))
    return (
        e.groupBy("label", "dim")
        .agg(
            (
                (
                    F.sum(F.floor(F.col("x").cast("double") * 10000000).cast("bigint"))
                    / F.count("*")
                )
                / F.lit(10000000.0)
            ).alias("mean_val")
        )
    )


@query(
    "embedding_stats",
    oracle="""
    SELECT vec_id,
           label,
           CAST(len(embedding) AS INTEGER) AS dim,
           list_sum(list_transform(embedding,
                    x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT)))
               / 10000.0 AS comp_sum,
           list_max(list_transform(embedding,
                    x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT)))
               / 10000.0 AS comp_max,
           list_min(list_transform(embedding,
                    x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT)))
               / 10000.0 AS comp_min
    FROM embeddings
    """,
)
def embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector component statistics via higher-order functions —
    the array-column profiling pass (dead/NaN dimension detection,
    normalization QA) a vector pipeline runs before indexing. All
    JVM-side (transform/aggregate/array_max inside codegen, no
    Python); elements are fixed-pointed BEFORE the fold so the sum is
    exact int64 and order-independent — float32 widening to double is
    value-preserving in every engine, which makes the whole row
    hash-checkable."""
    emb = table(spark, sf_dir, "embeddings")
    fp = F.transform(
        F.col("embedding"),
        lambda x: F.floor(x.cast("double") * 10000).cast("long"),
    )
    staged = emb.select("vec_id", "label", fp.alias("fp"))
    return staged.select(
        "vec_id",
        "label",
        F.size("fp").alias("dim"),
        (
            F.aggregate(F.col("fp"), F.lit(0).cast("long"), lambda a, x: a + x)
            / F.lit(10000.0)
        ).alias("comp_sum"),
        (F.array_max("fp") / F.lit(10000.0)).alias("comp_max"),
        (F.array_min("fp") / F.lit(10000.0)).alias("comp_min"),
    )


# The JL sign matrix is a COMPILE-TIME constant: ((i*2654435761 +
# j*40503) % 1000003) % 2 depends only on the indices, so it is
# evaluated once here in Python (all operands non-negative, so % and
# SQL pmod agree). S[i][j] in {+1, -1}, i = input dim 0..63,
# j = output dim 0..15.
_JL_SIGNS = [
    [
        1 if ((i * 2654435761 + j * 40503) % 1000003) % 2 == 0 else -1
        for j in range(16)
    ]
    for i in range(64)
]

_I64_MAX = (1 << 63) - 1
_I64_MIN = -(1 << 63)
# Smallest double >= 2**63 (2**63 itself); doubles below this cast to
# int64 exactly the way Scala's Double.toLong does.
_TWO63 = float(1 << 63)


def _jl_project_batches(batches):
    """Arrow kernel for embedding_projection: one numpy int64 matmul
    per batch (guide §4.2 — hand whole batches to vectorized native
    code). Replicates the r12 JVM expression semantics bit-for-bit:

    * fp_i = CAST(floor(CAST(emb[i] AS double) * 10000) AS long) —
      float32->float64 widening, the *10000.0 product and floor are
      IEEE-exact in both engines; under ANSI (the session default)
      NaN casts to 0 and an out-of-range/non-finite floor RAISES, so
      the kernel raises too (verified against the expression form).
    * dim_j = sum_i S[i][j] * fp_i over i = 0..63 (exact int64).
    * A row with a NULL among its first 64 elements made EVERY dim
      NULL in the expression form (each dim sums all 64 element_at
      terms), and concat_ws skips NULLs -> the projection is the
      empty string. An array SHORTER than 64 raised
      INVALID_ARRAY_INDEX_IN_ELEMENT_AT under ANSI -> raise here too.
    * NULL embedding -> NULL projection.
    """
    import numpy as np
    import pyarrow as pa

    S = np.asarray(_JL_SIGNS, dtype=np.int64)  # (64, 16)
    for batch in batches:
        vec_id = batch.column(0)
        emb = pa.chunked_array([batch.column(1)]).combine_chunks()
        n = len(emb)
        offsets = emb.offsets.to_numpy(zero_copy_only=False)
        row_null = (
            ~emb.is_valid().to_numpy(zero_copy_only=False)
            if emb.null_count
            else np.zeros(n, dtype=bool)
        )
        lengths = offsets[1:] - offsets[:-1]
        if ((~row_null) & (lengths < 64)).any():
            raise IndexError(
                "embedding_projection: array shorter than 64 — "
                "element_at index out of bounds (ANSI parity)"
            )
        values = emb.values
        vals_np = values.to_numpy(zero_copy_only=False).astype(np.float64)
        good = (~row_null) & (lengths >= 64)
        if values.null_count:
            # NULL element among the first 64 -> every dim NULL -> "".
            elem_ok = np.asarray(
                [v is not None for v in values.to_pylist()], dtype=bool
            )
            first64_ok = np.ones(n, dtype=bool)
            idx_all = np.flatnonzero(good)
            for r in idx_all:
                s = offsets[r]
                if not elem_ok[s : s + 64].all():
                    first64_ok[r] = False
            good &= first64_ok
        proj = np.full(n, None, dtype=object)
        proj[~row_null & ~good] = ""
        gi = np.flatnonzero(good)
        if gi.size:
            take = offsets[gi][:, None] + np.arange(64)[None, :]
            v = vals_np[take] * 10000.0
            f = np.floor(v)
            # ANSI parity: NaN casts to 0; anything outside int64
            # range (incl. +-Inf) raised ARITHMETIC_OVERFLOW there.
            out_of_range = (f >= _TWO63) | (f < -_TWO63)
            if out_of_range.any():
                raise OverflowError(
                    "embedding_projection: fixed-point term overflows "
                    "int64 (ANSI parity)"
                )
            fp = np.where(np.isnan(f), 0.0, f).astype(np.int64)
            # Conservative twin of ANSI's add-overflow: with every
            # |term| <= (2^63-1)/64 no 64-term signed sum can wrap.
            # Terms beyond that bound need |x| > 1.4e13 (the corpus is
            # uniform(-1,1) x scale <= 1e3), where the expression form
            # raised on some accumulation orders anyway.
            if np.abs(fp).max(initial=0) > _I64_MAX // 64:
                raise OverflowError(
                    "embedding_projection: signed sum may overflow "
                    "int64 (ANSI parity)"
                )
            dims = fp @ S  # (g, 16) exact int64
            for k, row in zip(gi, dims.tolist()):
                proj[k] = ",".join(map(str, row))
        yield pa.RecordBatch.from_arrays(
            [vec_id, pa.array(proj.tolist(), type=pa.string())],
            ["vec_id", "proj"],
        )


@query(
    "embedding_projection",
    oracle="""
    SELECT vec_id,
           array_to_string(list_transform(generate_series(0, 15), j ->
               CAST(list_sum(list_transform(generate_series(0, 63), i ->
                   CAST(floor(CAST(embedding[i + 1] AS DOUBLE) * 10000) AS BIGINT)
                   * (CASE WHEN ((i * 2654435761 + j * 40503) % 1000003) % 2 = 0
                           THEN 1 ELSE -1 END)
               )) AS BIGINT)
           ), ',') AS proj
    FROM embeddings
    """,
)
def embedding_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss-style random projection 64 -> 16 dims with
    a deterministic pseudo-random sign matrix (sign(i,j) from an
    integer hash both engines compute identically — no stored matrix,
    no RNG state). This is the dimensionality-reduction stage in front
    of ANN at 100 TB: a 4x smaller vector shrinks every downstream
    shuffle, index, and distance evaluation while approximately
    preserving cosine geometry. Scale shape: strictly MAP-ONLY — one
    scan, one Arrow map, ZERO Exchange on the corpus (asserted in
    test_plan_shapes).

    r13: the projection moved from nested transform/aggregate lambdas
    (CodegenFallback — the whole 1024-term sum ran per row in the
    INTERPRETED expression evaluator, ~60% of the query's bench time)
    to a vectorized Arrow kernel (guide §4.2): one int64 matmul per
    batch against the precomputed sign matrix. The flat-expression
    alternative (1024-node codegen tree) was measured WORSE (4.7s vs
    0.77s at sf0.1): the per-invocation Catalyst analyze/optimize cost
    of the huge tree dwarfed the eval win. Exactness contract is in
    ``_jl_project_batches``'s docstring; the 16 dims are exchanged as
    a CSV string per the house rule (relational.py
    customer_order_keys)."""
    return (
        table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .mapInArrow(_jl_project_batches, "vec_id bigint, proj string")
    )


_CENTROID_CACHE: dict[tuple, dict[int, dict[int, float]]] = {}


def _cached_label_centroids(
    spark: SparkSession, sf_dir: str
) -> dict[int, dict[int, float]]:
    """Collected label centroids memoized on the embeddings table's
    file signature (same scheme as ``registry.cached_rowcount``): the
    centroid aggregate is a plan-BUILD-time Spark job, and without the
    memo every EXPLAIN-only inspection and repeated driver/bench
    invocation would pay a full corpus aggregation. An unknown
    signature (non-local path) disables memoization rather than caching
    under a key that can never change."""
    from data_engineering_capstone_project_spark.plans.registry import (
        file_signature,
    )

    sig = file_signature(sf_dir, "embeddings")
    key = (sf_dir, sig)
    if sig and key in _CENTROID_CACHE:
        return _CENTROID_CACHE[key]
    by_label: dict[int, dict[int, float]] = {}
    for r in label_centroids(spark, sf_dir).collect():
        # A NULL label is not a class: it cannot seed a centroid (and
        # a None key would crash the sorted() over labels downstream) —
        # r8 adversarial-embeddings audit; the oracle's cent CTE
        # filters label IS NOT NULL identically.
        if r["label"] is None:
            continue
        by_label.setdefault(r["label"], {})[r["dim"]] = r["mean_val"]
    if not by_label:
        # Training a codebook on nothing is undefined (FAISS raises
        # too); without this guard the empty codebook surfaces later
        # as an opaque Catalyst INVALID_EXTRACT_BASE_FIELD_TYPE on
        # array_min(array()) — r7 empty-input audit.
        raise ValueError(
            f"empty embeddings corpus in {sf_dir}: PQ/centroid "
            "codebooks cannot be derived from zero vectors"
        )
    if sig:
        _CENTROID_CACHE[key] = by_label
    return by_label


# The assignment CTEs of nearest_centroid_assign's oracle, shared with
# kmeans_refine: per-label centroids -> fixed-point squared distances
# -> rank-1 assignment per vector.
_CENT_ASSIGN_CTES = """cent AS (
        SELECT label AS clabel,
               CAST(i - 1 AS INTEGER) AS dim,
               (sum(CAST(floor(CAST(embedding[i] AS DOUBLE) * 10000000)
                         AS BIGINT)) / count(*)) / 10000000.0 AS mean_val
        FROM embeddings, unnest(generate_series(1, len(embedding))) t(i)
        WHERE label IS NOT NULL
        GROUP BY 1, 2
    ),
    dist AS (
        SELECT e.vec_id, e.label, c.clabel,
               sum(CAST(floor((CAST(e.embedding[c.dim + 1] AS DOUBLE) - c.mean_val)
                              * (CAST(e.embedding[c.dim + 1] AS DOUBLE) - c.mean_val)
                              * 10000000) AS BIGINT)) AS dist_fp
        FROM embeddings e JOIN cent c ON TRUE
        WHERE e.embedding IS NOT NULL
        GROUP BY 1, 2, 3
    ),
    asg AS (
        SELECT vec_id, label, clabel AS assigned
        FROM (
            SELECT vec_id, label, clabel,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY dist_fp ASC, clabel ASC) AS rn
            FROM dist
        )
        WHERE rn = 1
    )"""


def _nearest_label_expr(by_label: dict[int, dict[int, float]]):
    """argmin-over-literal-centroids expression (fixed-point squared
    L2, label id as tiebreak) — the strictly map-only assignment stage
    shared by ``nearest_centroid_assign`` and ``kmeans_refine``."""

    def dist_to(lab: int):
        means = by_label[lab]
        cent = F.array(*[F.lit(float(means[d])) for d in sorted(means)])
        terms = F.zip_with(
            F.col("embedding"),
            cent,
            lambda x, m: F.floor(
                (x.cast("double") - m) * (x.cast("double") - m) * 10000000
            ).cast("long"),
        )
        return F.aggregate(terms, F.lit(0).cast("long"), lambda a, v: a + v)

    cand = F.array(
        *[
            F.struct(dist_to(lab).alias("dist"), F.lit(lab).alias("lab"))
            for lab in sorted(by_label)
        ]
    )
    return F.array_min(cand)["lab"]


@query(
    "nearest_centroid_assign",
    oracle=f"""
    WITH {_CENT_ASSIGN_CTES}
    SELECT label, assigned, count(*) AS n
    FROM asg
    GROUP BY 1, 2
    """,
)
def nearest_centroid_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-class-mean classification with a confusion-matrix
    summary — the label-propagation / auto-labeling pass of a vector
    pipeline (Rocchio classifier). Two stages: (1) the per-label
    centroid aggregate (the ``label_centroids`` plan — the shuffle
    carries labels x dims fixed-point partial sums, O(1) in corpus
    size), collected to the driver exactly like the IVF centroid set
    (bounded: n_labels x dim doubles); (2) a strictly MAP-ONLY
    assignment — each row evaluates zip_with/aggregate distances to
    LITERAL centroid arrays inside codegen, so the corpus never
    shuffles for assignment; the only remaining Exchange carries the
    (label, assigned) partial counts. Engine-exactness: centroid =
    (int64 fixed-point sum / count) / 1e7 (bit-identical division in
    both engines) and each squared-error term is floored to int64
    BEFORE summation, so the argmin is over exact integers with the
    class id as tiebreak — no float summation order anywhere."""
    assigned = _nearest_label_expr(_cached_label_centroids(spark, sf_dir))
    # embedding IS NOT NULL: a vector-less row cannot be assigned (its
    # NULL distances would tie-rank arbitrarily) — oracle's dist CTE
    # filters identically (r8 adversarial-embeddings audit).
    emb = table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    return (
        emb.select("label", assigned.alias("assigned"))
        .groupBy("label", "assigned")
        .agg(F.count("*").alias("n"))
    )


@query(
    "kmeans_refine",
    oracle=f"""
    WITH {_CENT_ASSIGN_CTES}
    SELECT s.assigned,
           CAST(i - 1 AS INTEGER) AS dim,
           (sum(CAST(floor(CAST(e.embedding[i] AS DOUBLE) * 10000000)
                     AS BIGINT)) / count(*)) / 10000000.0 AS mean_val,
           CAST(count(*) AS BIGINT) AS n_members
    FROM asg s
    JOIN embeddings e USING (vec_id),
         unnest(generate_series(1, len(e.embedding))) t(i)
    GROUP BY 1, 2
    """,
)
def kmeans_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One full Lloyd (k-means) iteration, distributed: assign every
    vector to its nearest current centroid, then recompute each
    cluster's centroid from its members — the refinement step that
    turns the label-seeded prototypes into data-driven clusters (and,
    iterated, the IVF cell-retraining loop behind ``ann_ivf_topk``).
    Seeds are the per-label centroids (deterministic — no RNG init).

    Scale shape: this is THE template for iterative ML on 100 TB —
    the assignment stage is strictly MAP-ONLY (literal centroid arrays
    evaluated inside codegen; the corpus never shuffles to be
    assigned), and the recompute stage's only Exchange carries
    (cluster, dim) fixed-point partial sums: O(k x dim) rows per
    executor, independent of corpus size. Each further Lloyd iteration
    costs exactly one corpus scan + one tiny shuffle; nothing
    accumulates on the driver except the k x dim centroid literals
    (same bounded collect as the IVF index). Engine-exactness: members
    are selected by exact integer argmin (label tiebreak), and the new
    means are int64 fixed-point sums / count divided once — the same
    scheme label_centroids hash-verifies."""
    assigned = _nearest_label_expr(_cached_label_centroids(spark, sf_dir))
    # embedding IS NOT NULL: same assignability contract as
    # nearest_centroid_assign (the oracle's dist CTE filters it).
    emb = table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    e = emb.select(assigned.alias("assigned"), "embedding").select(
        "assigned", F.posexplode("embedding").alias("dim", "x")
    )
    return e.groupBy("assigned", "dim").agg(
        (
            (
                F.sum(
                    F.floor(F.col("x").cast("double") * 10000000).cast(
                        "bigint"
                    )
                )
                / F.count("*")
            )
            / F.lit(10000000.0)
        ).alias("mean_val"),
        F.count("*").alias("n_members"),
    )


_Q_COS = (
    f"floor({_dot('q.qv', 'c.embedding')} / "
    f"(sqrt({_dot('q.qv', 'q.qv')}) * "
    f"sqrt({_dot('c.embedding', 'c.embedding')})) * 10000) / 10000.0"
)


def _rrf_oracle() -> str:
    from data_engineering_capstone_project_spark.plans.text_analysis import (
        BM25_CTES,
    )

    return f"""
    WITH {BM25_CTES},
    lex AS (
        SELECT doc_id,
               CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id)
                    AS INTEGER) AS lex_rank
        FROM bm
    ),
    lex10 AS (SELECT * FROM lex WHERE lex_rank <= 10),
    qv AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    scored AS (
        SELECT c.vec_id AS doc_id, {_Q_COS} AS cos
        FROM embeddings c CROSS JOIN qv q
        WHERE c.vec_id <> 0
    ),
    sem AS (
        SELECT doc_id,
               CAST(row_number() OVER (ORDER BY cos DESC, doc_id)
                    AS INTEGER) AS sem_rank
        FROM scored
    ),
    sem10 AS (SELECT * FROM sem WHERE sem_rank <= 10)
    SELECT coalesce(l.doc_id, s2.doc_id) AS doc_id,
           coalesce(l.lex_rank, 0) AS lex_rank,
           coalesce(s2.sem_rank, 0) AS sem_rank,
           CAST((CASE WHEN l.lex_rank IS NULL THEN 0
                      ELSE 1000000 // (60 + l.lex_rank) END)
              + (CASE WHEN s2.sem_rank IS NULL THEN 0
                      ELSE 1000000 // (60 + s2.sem_rank) END)
                 AS BIGINT) / 1000000.0 AS rrf
    FROM lex10 l FULL OUTER JOIN sem10 s2 ON l.doc_id = s2.doc_id
    """


@query("hybrid_retrieval_rrf", oracle=_rrf_oracle())
def hybrid_retrieval_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval by Reciprocal Rank Fusion (Cormack et al.
    SIGIR'09, k=60) — the standard first-stage of a RAG / curation
    pipeline: fuse the LEXICAL ranking (``bm25_topk``'s fixed 3-term
    query) with the SEMANTIC ranking (exact cosine neighbors of the
    vec_id-0 embedding; ids align with doc ids by the fixtures'
    convention) as rrf(d) = sum over lists of 1/(60 + rank(d)).
    1/(60+r) is computed as the exact integer 1000000 div (60+r), so
    the fused score is engine-identical without any float reciprocal;
    docs missing from a list contribute 0 (rank reported as 0).

    Scale shape: each side is its own already-scale-shaped retriever
    (BM25: term-restricted shuffle + TakeOrdered; cosine: broadcast
    single query vector, map-side scores, per-query top-k window); the
    fusion itself is a full-outer join of two <= 10-row frames — at
    production scale the candidate lists are per-query TakeOrdered
    outputs, so fusion cost never grows with the corpus, only with
    k x queries. RRF needs no score calibration between the two
    retrievers — rank-only fusion is exactly what makes mixing a
    10000-scaled BM25 with a [-1, 1] cosine principled."""
    from data_engineering_capstone_project_spark.plans.text_analysis import (
        bm25_topk,
    )
    from pyspark.sql.window import Window

    lex = bm25_topk(spark, sf_dir).select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("bm25"), F.asc("doc_id")))
        .alias("lex_rank"),
    )
    emb = table(spark, sf_dir, "embeddings")
    sem = S.brute_force_topk(
        emb.filter(F.col("vec_id") == 0), emb, k=10
    ).select(
        F.col("neighbor_id").alias("doc_id"),
        F.col("rnk").alias("sem_rank"),
    )
    fused = lex.join(sem, "doc_id", "full_outer").select(
        "doc_id",
        F.coalesce("lex_rank", F.lit(0)).cast("int").alias("lex_rank"),
        F.coalesce("sem_rank", F.lit(0)).cast("int").alias("sem_rank"),
    )
    contrib = lambda c: F.when(  # noqa: E731
        F.col(c) > 0, F.expr(f"1000000 div (60 + {c})")
    ).otherwise(F.lit(0))
    return fused.withColumn(
        "rrf",
        (contrib("lex_rank") + contrib("sem_rank")).cast("bigint")
        / F.lit(1000000.0),
    )


# --- Product quantization (PQ): 64 dims -> 8 subspaces x 8 dims,
# codebook per subspace = the label centroids restricted to that
# subspace (deterministic seeds, same rationale as kmeans_refine).
_PQ_SUBSPACES = 8
_PQ_SUBDIM = 8

_PQ_SCODE_CTES = """cent AS (
        SELECT label AS clabel,
               CAST(i - 1 AS INTEGER) AS dim,
               (sum(CAST(floor(CAST(embedding[i] AS DOUBLE) * 10000000)
                         AS BIGINT)) / count(*)) / 10000000.0 AS mean_val
        FROM embeddings, unnest(generate_series(1, len(embedding))) t(i)
        WHERE label IS NOT NULL
        GROUP BY 1, 2
    ),
    scode AS (
        SELECT e.vec_id, CAST(c.dim // 8 AS INTEGER) AS s, c.clabel,
               CAST(sum(CAST(floor(
                   (CAST(e.embedding[c.dim + 1] AS DOUBLE) - c.mean_val)
                   * (CAST(e.embedding[c.dim + 1] AS DOUBLE) - c.mean_val)
                   * 10000000) AS BIGINT)) AS BIGINT) AS d
        FROM embeddings e JOIN cent c ON TRUE
        WHERE e.embedding IS NOT NULL
        GROUP BY 1, 2, 3
    ),
    codes AS (
        SELECT vec_id, s, clabel AS code FROM (
            SELECT vec_id, s, clabel,
                   row_number() OVER (PARTITION BY vec_id, s
                                      ORDER BY d ASC, clabel ASC) AS rn
            FROM scode
        ) WHERE rn = 1
    ),
    qd AS (
        SELECT vec_id AS query_id, s, clabel AS label, d
        FROM scode WHERE vec_id < 10
    )"""


@query(
    "ann_pq_topk",
    oracle=f"""
    WITH {_PQ_SCODE_CTES},
    adc AS (
        SELECT q.query_id, c2.vec_id AS neighbor_id,
               CAST(sum(q.d) AS BIGINT) AS approx_d
        FROM codes c2 JOIN qd q ON q.s = c2.s AND q.label = c2.code
        WHERE q.query_id <> c2.vec_id
        GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id, approx_d,
           CAST(rnk AS INTEGER) AS rnk
    FROM (
        SELECT query_id, neighbor_id, approx_d,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY approx_d ASC, neighbor_id ASC)
                   AS rnk
        FROM adc
    ) WHERE rnk <= 3
    """,
)
def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN with asymmetric distance computation
    (ADC, Jegou et al. TPAMI'11) — the fourth point of the ANN design
    space (brute-force exact -> sign-LSH -> IVF -> PQ): vectors
    compress to 8 sub-codes (8 x 8-dim subspaces, codebook = the
    deterministic label centroids restricted to each subspace), and a
    query's distance to ANY database vector is a sum of 8
    precomputed query-to-codeword distances — at
    100 TB the index is ~4 bytes/vector instead of 256, and scoring
    reads codes, never raw vectors.

    Scale shape: corpus ENCODING is strictly map-only (per-subspace
    argmin against literal centroid slices inside codegen — zero
    corpus Exchange before the code explode, same discipline as
    IVF/Rocchio); the query-to-codeword table is subspaces x codebook
    x queries rows (tiny, broadcast); ADC is one equi-join of the
    exploded (vec, subspace, code) rows against that broadcast table
    plus a per-(query, vec) partial-agg sum, then per-query top-k via
    WindowGroupLimit. Engine-exactness: every squared-error term is
    floored to int64 BEFORE summation (the _CENT_ASSIGN discipline),
    so codes, ADC sums, and the rank order are all exact integers with
    deterministic tiebreaks."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(
        F.asc("approx_d"), F.asc("neighbor_id")
    )
    return (
        _pq_adc(spark, sf_dir)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("query_id", "neighbor_id", "approx_d", "rnk")
    )


def _pq_encode_kernel(labels, cent_rows, subspaces, subdim):
    """Build the Arrow batch function for the PQ corpus encode (r13,
    guide §4.2): one vectorized numpy distance grid + argmin per batch
    instead of the r12 per-row (subspaces x labels) grid of zip_with/
    aggregate lambdas — those are CodegenFallback expressions, so the
    whole ~1,280-lambda-per-row encode ran in the INTERPRETED
    evaluator (measured ~60% of ann_pq_topk's wall at sf0.1).

    Exactness (the _CENT_ASSIGN discipline, replicated bit-for-bit):
    per element, floor((CAST(x AS double) - m) * (x - m) * 1e7) as
    int64 — float32->float64 widening and the IEEE product/floor are
    identical in numpy; the per-subspace sum of 8 int64 terms is exact
    and order-free; the code is the label with the smallest (d, label)
    pair, which is numpy argmin over the label axis with labels
    pre-sorted ascending (argmin returns the FIRST minimum = smallest
    label, the array_min struct ordering). The encode contract covers
    WELL-FORMED vectors (the r8 adversarial audit pins NULL-element /
    short vectors as non-indexable corruption elsewhere): NULL
    embeddings are filtered before the kernel exactly as r12 did, and
    a short / NULL-element / non-finite vector RAISES loudly instead
    of the r12 form's silent NULL-distance argmin garbage."""

    def encode(batches):
        import numpy as np
        import pyarrow as pa

        dims = subspaces * subdim
        C = np.asarray(cent_rows, dtype=np.float64)  # (n_labels, dims)
        labs = np.asarray(labels, dtype=np.int64)
        two63 = float(1 << 63)
        for batch in batches:
            n = batch.num_rows
            emb = pa.chunked_array([batch.column(batch.num_columns - 1)])
            emb = emb.combine_chunks()
            if n == 0:
                continue
            if emb.null_count:
                raise ValueError(
                    "pq encode: NULL embedding reached the kernel — "
                    "callers filter these before encoding"
                )
            offsets = emb.offsets.to_numpy(zero_copy_only=False)
            lengths = offsets[1:] - offsets[:-1]
            if (lengths < dims).any():
                raise ValueError(
                    f"pq encode: vector shorter than {dims} dims — "
                    "non-well-formed input (corruption contract)"
                )
            if emb.values.null_count:
                raise ValueError(
                    "pq encode: vector with NULL element — "
                    "non-well-formed input (corruption contract)"
                )
            vals = emb.values.to_numpy(zero_copy_only=False).astype(
                np.float64
            )
            take = offsets[:-1][:, None] + np.arange(dims)[None, :]
            x = vals[take]  # (n, dims)
            if not np.isfinite(x).all():
                raise ValueError(
                    "pq encode: non-finite element — the expression "
                    "form raised under ANSI too"
                )
            diff = x[:, None, :] - C[None, :, :]  # (n, labels, dims)
            terms = np.floor(diff * diff * 10000000.0)
            if (np.abs(terms) >= two63).any():
                raise OverflowError(
                    "pq encode: fixed-point term overflows int64 "
                    "(ANSI parity)"
                )
            # Conservative twin of ANSI's add-overflow (r14 advice
            # fix, the _jl_project_batches guard): with every
            # |term| <= (2^63-1)/subdim no subdim-term signed sum can
            # wrap — numpy int64 wraps SILENTLY where the r12 ANSI
            # aggregate add raised. Terms beyond the bound need
            # |x - m| >= ~3.4e5, far outside any well-formed corpus,
            # where the expression form raised too.
            if np.abs(terms).max(initial=0.0) > (two63 - 1.0) / subdim:
                raise OverflowError(
                    "pq encode: subspace sum may overflow int64 "
                    "(ANSI parity)"
                )
            d = (
                terms.astype(np.int64)
                .reshape(n, len(labels), subspaces, subdim)
                .sum(axis=3)
            )  # (n, labels, subspaces) exact int64
            codes = labs[np.argmin(d, axis=1)]  # (n, subspaces)
            idx = np.repeat(np.arange(n), subspaces)
            out = [batch.column(i).take(pa.array(idx)) for i in
                   range(batch.num_columns - 1)]
            out.append(
                pa.array(
                    np.tile(np.arange(subspaces, dtype=np.int32), n)
                )
            )
            out.append(pa.array(codes.reshape(-1).astype(np.int32)))
            names = batch.schema.names[:-1] + ["s", "code"]
            yield pa.RecordBatch.from_arrays(out, names)

    return encode


def _pq_corpus_codes(
    spark: SparkSession,
    sf_dir: str,
    source: DataFrame | None = None,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(vec_id, *extra_cols, s, code): the map-only PQ ENCODE of the
    whole corpus — one vectorized Arrow kernel (``_pq_encode_kernel``),
    zero corpus Exchange (same discipline as IVF/Rocchio). This is the
    expensive half of ADC scoring; ``pq_codes_table`` materializes it
    once at ingest. ``source``/``extra_cols`` let a caller encode an
    already-derived frame (e.g. one carrying the IVF cell_id) in the
    same single map-only pass instead of joining codes back
    afterwards."""
    by_label = _cached_label_centroids(spark, sf_dir)
    labels = sorted(by_label)
    cent_rows = [
        [float(by_label[lab][d]) for d in range(_PQ_SUBSPACES * _PQ_SUBDIM)]
        for lab in labels
    ]
    emb = source if source is not None else table(spark, sf_dir, "embeddings")
    # A NULL embedding has no codes (its sub-distances are all NULL and
    # the argmin garbage); the oracle's scode CTE filters identically.
    # Zero-norm vectors DO encode — PQ/ADC is L2, no normalization.
    emb = emb.filter(F.col("embedding").isNotNull())
    src = emb.select("vec_id", *extra_cols, "embedding")
    out_fields = [
        f"{fld.name} {fld.dataType.simpleString()}"
        for fld in src.schema.fields[:-1]
    ]
    schema = ", ".join(out_fields + ["s int", "code int"])
    return src.mapInArrow(
        _pq_encode_kernel(labels, cent_rows, _PQ_SUBSPACES, _PQ_SUBDIM),
        schema,
    )


def _pq_query_dists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, s, label, d): query-to-codeword distance table —
    queries x subspaces x codebook rows (tiny, broadcast at the ADC
    join). JOIN-based, not literal-unrolled: the codebook becomes an
    80-row (s, label, cent) frame cross-joined (broadcast) with the
    queries, and d is ONE compact zip_with expression over the
    subspace slice — measured ~5x cheaper than compiling the
    subspaces x labels grid of unrolled expressions, with bit-identical
    output (same floored-int64 per-element terms, same left-to-right
    fold; equality verified against the literal form before the swap).
    The literal unroll is still the right call on the CORPUS side
    (``_pq_corpus_codes``): there the per-row argmin must stay inside
    whole-stage codegen with no join at all, and its compile cost is
    paid once at ingest."""
    by_label = _cached_label_centroids(spark, sf_dir)
    rows = []
    for lab in sorted(by_label):
        means = by_label[lab]
        for s in range(_PQ_SUBSPACES):
            lo = s * _PQ_SUBDIM
            rows.append(
                (s, lab, [float(means[d]) for d in range(lo, lo + _PQ_SUBDIM)])
            )
    cent = spark.createDataFrame(rows, "s int, label int, cent array<double>")
    emb = table(spark, sf_dir, "embeddings")
    # NULL-embedding queries have no distance table (oracle's qd comes
    # from the NULL-filtered scode CTE).
    q = emb.filter(
        (F.col("vec_id") < 10) & F.col("embedding").isNotNull()
    ).select(F.col("vec_id").alias("query_id"), "embedding")
    sub = F.slice(
        F.col("embedding"),
        F.col("s") * F.lit(_PQ_SUBDIM) + F.lit(1),
        F.lit(_PQ_SUBDIM),
    )
    d = F.aggregate(
        F.zip_with(
            sub,
            F.col("cent"),
            lambda x, m: F.floor(
                (x.cast("double") - m) * (x.cast("double") - m) * 10000000
            ).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda a, v: a + v,
    )
    return q.crossJoin(broadcast(cent)).select(
        "query_id", "s", "label", d.alias("d")
    )


def _pq_adc(
    spark: SparkSession, sf_dir: str, codes: DataFrame | None = None
) -> DataFrame:
    """(query_id, neighbor_id, approx_d): the full ADC scoring frame —
    shared by ann_pq_topk (cut at 3), ann_pq_rerank_topk (shortlist of
    64), and ann_pq_topk_indexed (``codes`` read from the materialized
    index instead of re-encoding the corpus)."""
    if codes is None:
        codes = _pq_corpus_codes(spark, sf_dir)
    qd = _pq_query_dists(spark, sf_dir)
    return (
        codes.join(
            broadcast(qd),
            (qd.s == codes.s)
            & (qd.label == codes.code)
            & (qd.query_id != codes.vec_id),
        )
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("d").alias("approx_d"))
    )


@query(
    "ann_pq_rerank_topk",
    oracle=f"""
    WITH {_PQ_SCODE_CTES},
    adc AS (
        SELECT q.query_id, c2.vec_id AS neighbor_id,
               CAST(sum(q.d) AS BIGINT) AS approx_d
        FROM codes c2 JOIN qd q ON q.s = c2.s AND q.label = c2.code
        WHERE q.query_id <> c2.vec_id
        GROUP BY 1, 2
    ),
    shortlist AS (
        SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY approx_d ASC, neighbor_id ASC)
                       AS rnk
            FROM adc
        ) WHERE rnk <= 64
    ),
    rer AS (
        SELECT s.query_id, s.neighbor_id,
               CAST(list_sum(list_transform(
                   generate_series(1, len(eq.embedding)),
                   i -> CAST(floor(
                       (CAST(eq.embedding[i] AS DOUBLE)
                        - CAST(ec.embedding[i] AS DOUBLE))
                       * (CAST(eq.embedding[i] AS DOUBLE)
                          - CAST(ec.embedding[i] AS DOUBLE))
                       * 10000000) AS BIGINT))) AS BIGINT) AS dist_fp
        FROM shortlist s
        JOIN embeddings eq ON eq.vec_id = s.query_id
        JOIN embeddings ec ON ec.vec_id = s.neighbor_id
    )
    SELECT query_id, neighbor_id, dist_fp, CAST(rnk AS INTEGER) AS rnk
    FROM (
        SELECT query_id, neighbor_id, dist_fp,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY dist_fp ASC, neighbor_id ASC)
                   AS rnk
        FROM rer
    ) WHERE rnk <= 3
    """,
)
def ann_pq_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval: PQ/ADC SHORTLIST (top-64 compressed-domain
    candidates per query — 13% of this corpus) then EXACT fixed-point
    L2 rerank of only the shortlist — the production ANN architecture
    (coarse quantized scoring prunes, exact math decides; IVF+PQ+rerank
    is the FAISS default). Measured on the synthetic corpus at sf0.01:
    the shortlist contains 77% of the true exact-L2 top-3 — an honest
    hard case, because near-uniform random 64-dim vectors concentrate
    distances and quantize poorly (the plain ADC rank alone gets
    recall@3 = 0.13 here); on structured real embeddings codebooks
    carry far more signal. The pinned floor lives in
    tests/test_vector_grouped.py.

    Scale shape: stage 1 is the ``ann_pq_topk`` machinery (map-only
    encode, broadcast query-to-codeword table, per-query
    WindowGroupLimit); stage 2 touches raw vectors for only
    queries x 64 rows — two id-equi-joins and a 64-row-per-query
    window, so the exact math never scans the corpus. Engine-exact:
    both stages are floored-int64 arithmetic with deterministic
    tiebreaks end to end."""
    from pyspark.sql.window import Window

    emb = table(spark, sf_dir, "embeddings")
    # ADC frame at shortlist depth (the registered ann_pq_topk cuts
    # at 3; the shortlist needs 64).
    w = Window.partitionBy("query_id").orderBy(
        F.asc("approx_d"), F.asc("neighbor_id")
    )
    shortlist = (
        _pq_adc(spark, sf_dir)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 64)
        .select("query_id", "neighbor_id")
    )
    dist = F.aggregate(
        F.zip_with(
            F.col("qv"),
            F.col("cv"),
            lambda x, y: F.floor(
                (x.cast("double") - y.cast("double"))
                * (x.cast("double") - y.cast("double"))
                * 10000000
            ).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda a, v: a + v,
    )
    rer = (
        shortlist.join(
            emb.select(
                F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("qv"),
            ),
            "query_id",
        )
        .join(
            emb.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("embedding").alias("cv"),
            ),
            "neighbor_id",
        )
        .select("query_id", "neighbor_id", dist.alias("dist_fp"))
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.asc("dist_fp"), F.asc("neighbor_id")
    )
    return (
        rer.withColumn("rnk", F.row_number().over(w2))
        .filter(F.col("rnk") <= 3)
        .select("query_id", "neighbor_id", "dist_fp", "rnk")
    )


def pq_codes_table(
    spark: SparkSession, sf_dir: str, with_cells: bool = False
) -> DataFrame:
    """The PQ codes INDEX as a materialized catalog table
    ``pq_codes_{tag}_{fp}``: (vec_id, s, code), encoded ONCE at ingest
    and reused by every later ADC query — the production shape the PQ
    docstring describes (at 100 TB the index is ~4 bytes/vector;
    scoring must read codes, never re-encode raw vectors per query).
    With ``with_cells=True`` the table is the IVF+PQ layout
    ``ivfpq_codes_{tag}_{fp}``: (vec_id, cell_id, s, code), cell
    assignment and encode fused in the same single ingest pass and the
    table PARTITIONED BY cell_id — a probed query then reads only its
    n_probe cells' directories (partition pruning = the inverted-file
    read).

    Same reuse-is-validated-not-assumed discipline as
    ``bucketed_orderkey_tables`` (relational.py): the table tag embeds
    a content fingerprint of the embeddings parquet (file names +
    sizes + mtimes), so a regenerated source yields a new tag and a
    fresh encode instead of silently serving codes built over old
    vectors; stale same-source tables from older fingerprints are
    dropped, and a leftover unregistered warehouse directory is
    cleared before writing (a fresh metastore meeting an old dir
    otherwise fails LOCATION_ALREADY_EXISTS).

    Concurrency contract: the fingerprint in the name makes same-source
    builds CONTENT-IDENTICAL, so a second process (in-memory catalogs —
    it cannot see the first's registration) that finds a COMPLETE
    fingerprint directory (``_SUCCESS`` present) ADOPTS it as an
    external table instead of re-encoding over a possibly-concurrent
    reader; a partial dir (crashed writer, no ``_SUCCESS``) is cleared
    and rebuilt. The first build itself is serialized by
    ``build_exclusive`` (r7, closing the r6 residual): an O_EXCL
    ``_BUILDING.<name>`` lock next to the target means exactly one
    process encodes while concurrent callers wait for ``_SUCCESS`` and
    adopt — two simultaneous first writers can no longer rmtree/write
    the same dir under each other (two-process test in
    tests/test_build_lock.py). The build itself lands through
    ``commit_build`` (r12, closing build_exclusive's documented
    multi-host residual): the encode writes into a unique
    fencing-token attempt dir and publishes by ONE atomic directory
    rename with a ``_MANIFEST`` stamp, so even two HOSTS racing the
    first build — where the pid-liveness lock cannot see the other
    writer — resolve to exactly one published table, the loser
    adopting it (two-writer lockless race test in
    tests/test_build_lock.py). build_exclusive stays as the same-host
    layer so local concurrent callers WAIT instead of paying a
    duplicate encode; cross-host duplicates cost one wasted build and
    zero correctness."""
    import re as _re
    import shutil
    from pathlib import Path

    from data_engineering_capstone_project_spark.plans.relational import (
        _source_fingerprint,
    )
    from data_engineering_capstone_project_spark.sources.writers import (
        build_exclusive,
        commit_build,
    )

    prefix = "ivfpq_codes" if with_cells else "pq_codes"
    tag = _re.sub(r"[^0-9A-Za-z]+", "_", sf_dir).strip("_")
    fp = _source_fingerprint(sf_dir, ("embeddings",))
    name = f"{prefix}_{tag}_{fp}"
    if not spark.catalog.tableExists(name):
        stale = _re.compile(rf"^{prefix}_{tag}_[0-9a-f]{{10}}$")
        for t in spark.catalog.listTables():
            if stale.match(t.name) and t.name != name:
                spark.sql(f"DROP TABLE IF EXISTS {t.name}")
        warehouse = Path(
            spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse").replace(
                "file:", ""
            )
        )
        # DROP on an adopted external table leaves its files; sweep
        # stale-fingerprint dirs too so old encodes don't accumulate.
        for d in warehouse.glob(f"{prefix}_{tag}_*"):
            if stale.match(d.name) and d.name != name:
                shutil.rmtree(d, ignore_errors=True)
        loc = warehouse / name

        def _complete() -> bool:
            return (loc / "_SUCCESS").exists()

        def _build_to(attempt: str) -> None:
            # The encode writes the COMPLETE table into the commit
            # protocol's unique attempt dir; publication to loc is
            # commit_build's single atomic rename.
            if with_cells:
                from data_engineering_capstone_project_spark.operators.vector_index import (  # noqa: E501
                    assign_cells,
                    sampled_centroids,
                )

                emb = table(spark, sf_dir, "embeddings")
                with_cell = assign_cells(
                    emb.select("vec_id", "embedding"),
                    sampled_centroids(emb, n_cells=8),
                    n_probe=1,
                )
                (
                    _pq_corpus_codes(
                        spark, sf_dir, source=with_cell, extra_cols=("cell_id",)
                    )
                    .write.mode("overwrite")
                    .partitionBy("cell_id")
                    .parquet(attempt)
                )
            else:
                _pq_corpus_codes(spark, sf_dir).write.mode(
                    "overwrite"
                ).parquet(attempt)

        def _build() -> None:
            commit_build(loc, _build_to, {"source_fingerprint": fp})

        build_exclusive(loc, _build, _complete)
        # Registration is IDENTICAL for built and adopted since r12:
        # commit_build only ever publishes complete external dirs, so
        # every entry registers the published location as an external
        # table (DROP keeps the files either way; the stale sweep above
        # owns file deletion).
        spark.catalog.createTable(name, path=str(loc), source="parquet")
        if with_cells:
            spark.catalog.recoverPartitions(name)
    return spark.table(name)


@query(
    "codes_table_adoption_parity",
    oracle=f"""
    WITH {_PQ_SCODE_CTES}
    SELECT CAST(s AS INTEGER) AS s,
           CAST(count(*) AS BIGINT) AS n_codes,
           CAST(count(DISTINCT vec_id) AS BIGINT) AS n_vecs,
           CAST(sum(code) AS BIGINT) AS code_sum
    FROM codes
    GROUP BY s
    """,
)
def codes_table_adoption_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Warehouse-lifecycle parity for the PQ codes index (r10, VERDICT
    #6): the adoption guarantee — a fresh catalog meeting a COMPLETE
    same-fingerprint codes directory must ADOPT it byte-identically,
    never re-encode or lose files — exercised end-to-end and verified
    two ways. In-engine: build (or adopt) the codes table, digest it,
    DROP the catalog entry while preserving the files (stash/restore
    for a managed first build; an external adopted table keeps its
    files across DROP by definition), re-enter ``pq_codes_table`` —
    which must take the adopt branch — and require the post-adoption
    digest AND the file listing (names + sizes) to be identical,
    raising RuntimeError otherwise. Cross-engine: the returned
    per-subspace digest of the ADOPTED table (row counts, distinct
    vectors, code sum) is hash-checked against DuckDB re-deriving the
    PQ codes from the raw embeddings — so an adoption that served
    stale, partial, or re-encoded-differently files is a red driver
    row, not just a failed assertion. This gives the build-lock /
    adoption protocol (tests/test_build_lock.py's two-process suite)
    a standing driver-visible row, the same promotion the streaming
    serving tables got in r8.

    Scale shape: one digest aggregation over the codes table per side
    of the parity check — the table itself is the ~4-bytes/vector
    index, and the lifecycle operations are catalog + filesystem
    metadata, no data rewrite (that is exactly what the file-listing
    assertion proves)."""
    import re as _re
    import shutil
    from pathlib import Path

    from data_engineering_capstone_project_spark.plans.relational import (
        _source_fingerprint,
    )

    def digest(df: DataFrame) -> DataFrame:
        return df.groupBy(F.col("s").cast("int").alias("s")).agg(
            F.count("*").cast("bigint").alias("n_codes"),
            F.countDistinct("vec_id").cast("bigint").alias("n_vecs"),
            F.sum("code").cast("bigint").alias("code_sum"),
        )

    before = sorted(map(tuple, digest(pq_codes_table(spark, sf_dir)).collect()))

    tag = _re.sub(r"[^0-9A-Za-z]+", "_", sf_dir).strip("_")
    name = f"pq_codes_{tag}_{_source_fingerprint(sf_dir, ('embeddings',))}"
    warehouse = Path(
        spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse").replace(
            "file:", ""
        )
    )
    loc = warehouse / name
    listing_before = sorted(
        (p.relative_to(loc).as_posix(), p.stat().st_size)
        for p in loc.rglob("*")
        if p.is_file()
    )

    # Simulate the fresh-catalog re-entry: drop the entry, keep the
    # files. Since r12 every registration is EXTERNAL (commit_build
    # publishes complete dirs; registration never manages files), so
    # DROP keeps the files and the stash below is deleted unused — it
    # stays as a guard so the parity also covers any legacy managed
    # entry a pre-r12 warehouse might still carry.
    stash = loc.with_name(loc.name + "._adoption_stash")
    if stash.exists():
        shutil.rmtree(stash)
    shutil.copytree(loc, stash)
    spark.sql(f"DROP TABLE IF EXISTS `{name}`")
    if loc.exists():
        shutil.rmtree(stash)  # external: files survived the DROP
    else:
        stash.rename(loc)  # managed: restore the complete dir

    adopted = pq_codes_table(spark, sf_dir)  # must take the adopt branch
    if not spark.catalog.tableExists(name):
        raise RuntimeError(f"{name}: re-entry did not register the table")
    listing_after = sorted(
        (p.relative_to(loc).as_posix(), p.stat().st_size)
        for p in loc.rglob("*")
        if p.is_file()
    )
    if listing_after != listing_before:
        raise RuntimeError(
            f"{name}: adoption rewrote the index files — "
            f"{len(listing_before)} files before, {len(listing_after)} after"
        )
    after = sorted(map(tuple, digest(adopted).collect()))
    if after != before:
        raise RuntimeError(
            f"{name}: adopted table content diverged from the built one: "
            f"{before} != {after}"
        )
    return digest(spark.table(name))


@query(
    "ann_pq_topk_indexed",
    oracle=f"""
    WITH {_PQ_SCODE_CTES},
    adc AS (
        SELECT q.query_id, c2.vec_id AS neighbor_id,
               CAST(sum(q.d) AS BIGINT) AS approx_d
        FROM codes c2 JOIN qd q ON q.s = c2.s AND q.label = c2.code
        WHERE q.query_id <> c2.vec_id
        GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id, approx_d,
           CAST(rnk AS INTEGER) AS rnk
    FROM (
        SELECT query_id, neighbor_id, approx_d,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY approx_d ASC, neighbor_id ASC)
                   AS rnk
        FROM adc
    ) WHERE rnk <= 3
    """,
)
def ann_pq_topk_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ann_pq_topk`` served from the MATERIALIZED codes index
    (``pq_codes_table``) instead of re-encoding the corpus per query —
    identical answers (same oracle), production cost profile: the
    per-query plan is one scan of the 3-column codes table, a
    broadcast join against the tiny query-to-codeword distance frame,
    one (query, vec) partial-agg sum, and a per-query
    WindowGroupLimit. The encode cost (and its large expression tree,
    the measured ~6.7s compile+encode floor of ann_pq_topk at sf0.1)
    is paid once at ingest, amortized across every query against the
    index. First call on a new/changed embeddings source pays the
    one-time encode; steady-state calls read the index only."""
    from pyspark.sql.window import Window

    codes = pq_codes_table(spark, sf_dir)
    w = Window.partitionBy("query_id").orderBy(
        F.asc("approx_d"), F.asc("neighbor_id")
    )
    return (
        _pq_adc(spark, sf_dir, codes=codes)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("query_id", "neighbor_id", "approx_d", "rnk")
    )


@query(
    "ann_pq_topk_after_delete",
    oracle=f"""
    WITH {_PQ_SCODE_CTES},
    adc AS (
        SELECT q.query_id, c2.vec_id AS neighbor_id,
               CAST(sum(q.d) AS BIGINT) AS approx_d
        FROM codes c2 JOIN qd q ON q.s = c2.s AND q.label = c2.code
        WHERE q.query_id <> c2.vec_id AND c2.vec_id % 10 <> 7
        GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id, approx_d,
           CAST(rnk AS INTEGER) AS rnk
    FROM (
        SELECT query_id, neighbor_id, approx_d,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY approx_d ASC, neighbor_id ASC)
                   AS rnk
        FROM adc
    ) WHERE rnk <= 3
    """,
)
def ann_pq_topk_after_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DELETE half of the codes-table lifecycle (append is
    ``pq_encode_incremental``): vectors with ``vec_id % 10 == 7``
    stand in for a right-to-be-forgotten/expired-keys list, and the
    index serves correct top-k WITHOUT re-encoding anything — the
    tombstones are a broadcast LEFT ANTI join against the stored
    codes at read time (the deletion-vector pattern Delta/Iceberg
    use: logical delete now, physical rewrite at the next
    compaction; ``delete_keys_partitioned`` is this repo's rewrite
    path when the tombstone set warrants it). The oracle scores the
    corpus minus the deleted ids from scratch, so a green row proves
    the anti-join view is EXACTLY the re-encoded-minus-deleted index
    — deleted vectors can never resurface as neighbors, while
    deleted ids that are also query ids (7 here) keep querying, as a
    caller holding an old query vector would.

    Scale shape: identical to ``ann_pq_topk_indexed`` plus one
    broadcast anti join against the key-only tombstone frame — the
    codes scan, the ADC broadcast, and the WindowGroupLimit are
    unchanged; cost of deletion at read time is O(tombstones) of
    broadcast, zero corpus writes."""
    from pyspark.sql.window import Window

    codes = pq_codes_table(spark, sf_dir)
    tombstones = (
        table(spark, sf_dir, "embeddings")
        .select("vec_id")
        .filter(F.pmod(F.col("vec_id"), F.lit(10)) == 7)
    )
    live = codes.join(broadcast(tombstones), "vec_id", "left_anti")
    w = Window.partitionBy("query_id").orderBy(
        F.asc("approx_d"), F.asc("neighbor_id")
    )
    return (
        _pq_adc(spark, sf_dir, codes=live)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("query_id", "neighbor_id", "approx_d", "rnk")
    )


@query(
    "pq_encode_incremental",
    oracle=f"""
    WITH {_PQ_SCODE_CTES}
    SELECT vec_id, s, code FROM codes WHERE vec_id % 10 = 7
    """,
)
def pq_encode_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental PQ index maintenance — the append half of the
    ``pq_codes_table`` lifecycle: vectors with ``vec_id % 10 == 7``
    stand in for today's ingest batch; the encode runs ONLY over that
    batch (map-only, against the frozen codebook the existing index
    was built with) and emits the (vec_id, s, code) rows a production
    pipeline appends to the codes table. The existing corpus is never
    re-read, let alone re-encoded — the same complementary-filter
    discipline as ``dedup_incremental`` (new x existing only, no
    old x old term). At 100 TB with a small daily batch this is the
    difference between an O(batch) nightly job and an O(corpus) one.
    (Codebook note: the oracle derives the centroids from the full
    table because the synthetic fixture is static; in production the
    codebook is FROZEN at index build — re-deriving it would silently
    re-encode history into a different code space, which is exactly
    what the codes table's content fingerprint guards against.)"""
    emb = table(spark, sf_dir, "embeddings")
    batch = emb.filter(F.pmod(F.col("vec_id"), F.lit(10)) == 7)
    return _pq_corpus_codes(spark, sf_dir, source=batch)


_IVFPQ_FSIM = (
    f"floor({_dot('e.embedding', 'ccent.centroid')} / "
    f"(sqrt({_dot('e.embedding', 'e.embedding')}) * "
    f"sqrt({_dot('ccent.centroid', 'ccent.centroid')})) * 10000)"
)


# Shared by ann_ivfpq_topk and ann_ivfpq_topk_indexed: the codes the
# indexed variant reads from the catalog are byte-identical to the
# inline fused encode, so ONE oracle covers both.
_IVFPQ_ORACLE = f"""
    WITH {_PQ_SCODE_CTES},
    ids AS (SELECT vec_id, embedding FROM embeddings
           WHERE {_valid('embedding')} ORDER BY vec_id LIMIT 8),
    ccent AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER)
                         AS cell_id,
                     embedding AS centroid
              FROM ids),
    sc AS (
        SELECT e.vec_id, ccent.cell_id, {_IVFPQ_FSIM} AS fsim
        FROM embeddings e CROSS JOIN ccent
        WHERE {_valid('e.embedding')}
    ),
    corpus_assign AS (
        SELECT vec_id, cell_id FROM (
            SELECT vec_id, cell_id,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY fsim DESC, cell_id) AS r
            FROM sc) WHERE r = 1
    ),
    query_assign AS (
        SELECT vec_id, cell_id FROM (
            SELECT vec_id, cell_id,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY fsim DESC, cell_id) AS r
            FROM sc WHERE vec_id < 10) WHERE r <= 2
    ),
    adc AS (
        SELECT q.query_id, c2.vec_id AS neighbor_id,
               CAST(sum(q.d) AS BIGINT) AS approx_d
        FROM codes c2
        JOIN corpus_assign ca ON ca.vec_id = c2.vec_id
        JOIN query_assign qa ON qa.cell_id = ca.cell_id
        JOIN qd q ON q.query_id = qa.vec_id
                 AND q.s = c2.s AND q.label = c2.code
        WHERE q.query_id <> c2.vec_id
        GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id, approx_d, CAST(rnk AS INTEGER) AS rnk
    FROM (
        SELECT query_id, neighbor_id, approx_d,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY approx_d ASC, neighbor_id ASC)
                   AS rnk
        FROM adc
    ) WHERE rnk <= 3
    """


@query("ann_ivfpq_topk", oracle=_IVFPQ_ORACLE)
def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF + PQ — the FAISS IndexIVFPQ architecture, completing the
    ANN ladder (brute-force -> sign-LSH -> IVF -> PQ -> IVF+PQ): a
    coarse quantizer (the deterministic sampled-centroid IVF from
    ``ann_ivf_topk``) prunes the corpus to the query's 2 probed cells,
    and within those cells scoring is compressed-domain ADC over PQ
    codes (the ``ann_pq_topk`` machinery) — never raw vectors. At
    100 TB this is the only sub-linear-AND-small-memory shape: search
    touches n_probe/n_cells of the corpus, and what it touches is
    ~4 bytes/vector of codes.

    Scale shape: ONE map-only corpus pass computes BOTH the cell
    assignment (literal centroid argmin, the ``assign_cells``
    discipline) and the 8 sub-codes (literal codebook argmin) before
    the code explode — zero corpus Exchange until the per-(query,
    neighbor) partial-agg sum (asserted in test_plan_shapes: no
    SortMergeJoin, no CartesianProduct on the corpus axis). The
    broadcast side is (query x probed-cell x subspace x codeword) —
    bounded by the index geometry, not the data. At ingest the
    (vec_id, cell_id, s, code) frame is what you'd materialize
    (``pq_codes_table`` extended with the cell column); per-query work
    then reads only the probed cells' code partitions. Engine-exact:
    coarse assignment ranks 4-decimal-quantized cosines with cell_id
    tiebreaks; ADC sums are floored-int64 throughout."""
    from pyspark.sql.window import Window

    from data_engineering_capstone_project_spark.operators.vector_index import (
        assign_cells,
        sampled_centroids,
    )

    emb = table(spark, sf_dir, "embeddings")
    cents = sampled_centroids(emb, n_cells=8)
    # Corpus: cell assignment + PQ encode fused into one map-only pass.
    with_cells = assign_cells(
        emb.select("vec_id", "embedding"), cents, n_probe=1
    )
    codes = _pq_corpus_codes(
        spark, sf_dir, source=with_cells, extra_cols=("cell_id",)
    )
    return _ivfpq_score(spark, sf_dir, codes, cents=cents)


def _ivfpq_score(
    spark: SparkSession,
    sf_dir: str,
    codes: DataFrame,
    cents: DataFrame | None = None,
    n_probe: int = 2,
) -> DataFrame:
    """IVFPQ scoring tail over a (vec_id, cell_id, s, code) frame:
    broadcast the (query x probed-cell x codeword) probe, ADC-sum per
    (query, neighbor), per-query top-3. Shared by ``ann_ivfpq_topk``
    (inline fused encode — passes its already-built ``cents`` so the
    8-centroid collect job runs once per query, not twice) and
    ``ann_ivfpq_topk_indexed`` (codes read from the materialized
    cell-partitioned index; derives the quantizer here). ``n_probe``
    (default 2, the registered queries' config) widens the probed-cell
    set — the scale-probe harness uses 4 for the production-config
    leg prescribed by the r7 review (#8)."""
    from pyspark.sql.window import Window

    from data_engineering_capstone_project_spark.operators.vector_index import (
        assign_cells,
        sampled_centroids,
    )

    emb = table(spark, sf_dir, "embeddings")
    if cents is None:
        cents = sampled_centroids(emb, n_cells=8)
    # Queries: probed cells x codeword distances, joined into one tiny
    # broadcast frame (queries x 2 cells x 8 subspaces x 10 codewords).
    qcells = assign_cells(
        emb.filter(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("query_id"), "embedding"
        ),
        cents,
        n_probe=n_probe,
    ).select("query_id", "cell_id")
    probe = qcells.join(_pq_query_dists(spark, sf_dir), "query_id")
    adc = (
        codes.alias("c")
        .join(
            broadcast(probe).alias("p"),
            (F.col("p.s") == F.col("c.s"))
            & (F.col("p.label") == F.col("c.code"))
            & (F.col("p.cell_id") == F.col("c.cell_id"))
            & (F.col("p.query_id") != F.col("c.vec_id")),
        )
        .groupBy("query_id", F.col("c.vec_id").alias("neighbor_id"))
        .agg(F.sum("d").alias("approx_d"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("approx_d"), F.asc("neighbor_id")
    )
    return (
        adc.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("query_id", "neighbor_id", "approx_d", "rnk")
    )


_SWEEP_PROBES = (1, 2, 4)

_IVFPQ_SWEEP_ORACLE = f"""
    WITH {_PQ_SCODE_CTES},
    ids AS (SELECT vec_id, embedding FROM embeddings
           WHERE {_valid('embedding')} ORDER BY vec_id LIMIT 8),
    ccent AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER)
                         AS cell_id,
                     embedding AS centroid
              FROM ids),
    sc AS (
        SELECT e.vec_id, ccent.cell_id, {_IVFPQ_FSIM} AS fsim
        FROM embeddings e CROSS JOIN ccent
        WHERE {_valid('e.embedding')}
    ),
    corpus_assign AS (
        SELECT vec_id, cell_id FROM (
            SELECT vec_id, cell_id,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY fsim DESC, cell_id) AS r
            FROM sc) WHERE r = 1
    ),
    query_assign AS (
        SELECT vec_id, cell_id, CAST(r AS INTEGER) AS cell_rank FROM (
            SELECT vec_id, cell_id,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY fsim DESC, cell_id) AS r
            FROM sc WHERE vec_id < 10) WHERE r <= 4
    ),
    adc AS (
        SELECT q.query_id, c2.vec_id AS neighbor_id,
               min(qa.cell_rank) AS cell_rank,
               CAST(sum(q.d) AS BIGINT) AS approx_d
        FROM codes c2
        JOIN corpus_assign ca ON ca.vec_id = c2.vec_id
        JOIN query_assign qa ON qa.cell_id = ca.cell_id
        JOIN qd q ON q.query_id = qa.vec_id
                 AND q.s = c2.s AND q.label = c2.code
        WHERE q.query_id <> c2.vec_id
        GROUP BY 1, 2
    ),
    grid AS (SELECT CAST(n_probe AS INTEGER) AS n_probe
             FROM (VALUES (1), (2), (4)) t(n_probe)),
    topk AS (
        SELECT n_probe, query_id, neighbor_id FROM (
            SELECT g.n_probe, a.query_id, a.neighbor_id,
                   row_number() OVER (PARTITION BY g.n_probe, a.query_id
                                      ORDER BY a.approx_d ASC,
                                               a.neighbor_id ASC) AS rnk
            FROM adc a JOIN grid g ON a.cell_rank <= g.n_probe
        ) WHERE rnk <= 3
    ),
    exact AS (
        SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY dist_fp ASC,
                                               neighbor_id ASC) AS r
            FROM (
                SELECT eq.vec_id AS query_id, ec.vec_id AS neighbor_id,
                       CAST(list_sum(list_transform(
                           generate_series(1, len(eq.embedding)),
                           i -> CAST(floor(
                               (CAST(eq.embedding[i] AS DOUBLE)
                                - CAST(ec.embedding[i] AS DOUBLE))
                               * (CAST(eq.embedding[i] AS DOUBLE)
                                  - CAST(ec.embedding[i] AS DOUBLE))
                               * 10000000) AS BIGINT))) AS BIGINT) AS dist_fp
                FROM embeddings eq
                JOIN embeddings ec
                  ON eq.vec_id < 10 AND eq.vec_id <> ec.vec_id
                 AND {_valid('eq.embedding')} AND {_valid('ec.embedding')}
            )
        ) WHERE r <= 3
    )
    SELECT g.n_probe,
           CAST(COALESCE(h.hits, 0) AS BIGINT) AS adc_hits,
           CAST(COALESCE(h.hits, 0) * 10000 // 30 AS BIGINT) AS adc_recall_bp,
           CAST(COALESCE(rr.hits, 0) AS BIGINT) AS rerank_hits,
           CAST(COALESCE(rr.hits, 0) * 10000 // 30 AS BIGINT)
               AS rerank_recall_bp
    FROM grid g LEFT JOIN (
        SELECT t.n_probe, count(*) AS hits
        FROM topk t
        JOIN exact e ON t.query_id = e.query_id
                    AND t.neighbor_id = e.neighbor_id
        GROUP BY 1
    ) h ON g.n_probe = h.n_probe
    LEFT JOIN (
        SELECT g2.n_probe, count(*) AS hits
        FROM exact e
        JOIN adc a ON a.query_id = e.query_id
                  AND a.neighbor_id = e.neighbor_id
        JOIN grid g2 ON a.cell_rank <= g2.n_probe
        GROUP BY 1
    ) rr ON g.n_probe = rr.n_probe
    """


@query("ann_ivfpq_probe_sweep", oracle=_IVFPQ_SWEEP_ORACLE)
def ann_ivfpq_probe_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVFPQ cost/recall DIAL, measured instead of asserted (r7):
    recall@3 against the TRUE exact-L2 top-3 at n_probe in (1, 2, 4)
    of 8 cells — one row per n_probe, for BOTH retrieval tiers:

    * ``adc_hits``/``adc_recall_bp`` — raw compressed-domain ADC
      ranking. Measured finding, reported not hidden: on this
      near-uniform synthetic fixture raw-ADC recall DECREASES as
      n_probe grows (sf0.01: 2666 -> 2333 -> 2000 bp) — distance
      concentration makes ADC nearly noise here, so widening the
      candidate pool lets badly-quantized candidates displace true
      neighbors from the ADC top-3. Raw-ADC recall is NOT a monotone
      function of n_probe and no test pretends it is.
    * ``rerank_hits``/``rerank_recall_bp`` — the production config
      (IVF + PQ shortlist + exact rerank, ``ann_pq_rerank_topk``'s
      tier): a global-top-3 member found in ANY probed cell survives
      exact reranking of any candidate superset, so this column equals
      |exact top-3 ∩ probed cells| and is PROVABLY non-decreasing in
      n_probe. This is the dial an operator actually turns on a
      100 TB index — probing 4 cells doubles the codes scanned vs 2
      and buys exactly the recall this column shows; monotonicity +
      floor pinned in test_vector_grouped.

    Scale shape: ONE corpus pass does cell assignment + PQ encode
    (identical to ``ann_ivfpq_topk``); the query side assigns its
    probed cells ONCE at the maximum swept n_probe carrying
    ``probe_rank``, so a candidate's minimum qualifying n_probe is a
    column, not a reason to rescan — the three probe levels come from
    a 3-row grid broadcast over the single ADC frame, never three
    corpus passes. The exact-L2 reference is the declared brute-force
    verifier tier (10 query rows broadcast against the corpus), the
    same bound as ``cosine_topk``."""
    from pyspark.sql.window import Window

    from data_engineering_capstone_project_spark.operators.vector_index import (
        assign_cells,
        sampled_centroids,
    )

    emb = table(spark, sf_dir, "embeddings")
    cents = sampled_centroids(emb, n_cells=8)
    with_cell = assign_cells(
        emb.select("vec_id", "embedding"), cents, n_probe=1
    )
    codes = _pq_corpus_codes(
        spark, sf_dir, source=with_cell, extra_cols=("cell_id",)
    )
    qcells = assign_cells(
        emb.filter(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("query_id"), "embedding"
        ),
        cents,
        n_probe=max(_SWEEP_PROBES),
        with_rank=True,
    ).select("query_id", "cell_id", "probe_rank")
    probe = qcells.join(_pq_query_dists(spark, sf_dir), "query_id")
    adc = (
        codes.alias("c")
        .join(
            broadcast(probe).alias("p"),
            (F.col("p.s") == F.col("c.s"))
            & (F.col("p.label") == F.col("c.code"))
            & (F.col("p.cell_id") == F.col("c.cell_id"))
            & (F.col("p.query_id") != F.col("c.vec_id")),
        )
        .groupBy("query_id", F.col("c.vec_id").alias("neighbor_id"))
        # A neighbor lives in exactly one cell, so its probe_rank is
        # constant across the 8 subspace matches; min() just projects
        # that constant through the aggregate.
        .agg(
            F.sum("d").alias("approx_d"),
            F.min("probe_rank").alias("cell_rank"),
        )
    )
    grid = spark.createDataFrame(
        [(p,) for p in _SWEEP_PROBES], "n_probe int"
    )
    w = Window.partitionBy("n_probe", "query_id").orderBy(
        F.asc("approx_d"), F.asc("neighbor_id")
    )
    topk = (
        adc.join(broadcast(grid), F.col("cell_rank") <= F.col("n_probe"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("n_probe", "query_id", "neighbor_id")
    )
    # Exact-L2 reference: the brute-force verifier tier (10 queries
    # broadcast x corpus), fixed-point per-element terms so any engine
    # reproduces the exact ranking.
    # Ground truth over the INDEXABLE corpus (the exact top-3 the index
    # could ever serve): non-indexable rows are quarantined from the
    # index, and a NULL distance would rank NULLS-FIRST into Spark's
    # top-3 while DuckDB ranks it last (r8 adversarial audit).
    q = emb.filter(
        (F.col("vec_id") < 10) & S.indexable(F.col("embedding"))
    ).select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"))
    c = emb.filter(S.indexable(F.col("embedding"))).select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv")
    )
    dist = F.aggregate(
        F.zip_with(
            F.col("qv"),
            F.col("cv"),
            lambda x, y: F.floor(
                (x.cast("double") - y.cast("double"))
                * (x.cast("double") - y.cast("double"))
                * 10000000
            ).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda a, v: a + v,
    )
    we = Window.partitionBy("query_id").orderBy(
        F.asc("dist_fp"), F.asc("neighbor_id")
    )
    exact = (
        broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", dist.alias("dist_fp"))
        .withColumn("r", F.row_number().over(we))
        .filter(F.col("r") <= 3)
        .select("query_id", "neighbor_id")
    )
    # exact is <= 3 x |queries| rows — broadcast it into both hit
    # joins; unhinted, Catalyst plans a SortMergeJoin that would sort
    # the corpus-scale ADC frame on (query_id, neighbor_id).
    hits = (
        topk.join(broadcast(exact), ["query_id", "neighbor_id"], "left_semi")
        .groupBy("n_probe")
        .agg(F.count("*").alias("h"))
    )
    # Rerank-tier hits: an exact-top-3 member inside ANY cell probed at
    # level p survives exact reranking of the level-p candidate set, so
    # the count is a join against the candidates' cell_rank — no second
    # scoring pass needed.
    rerank_hits = (
        adc.select("query_id", "neighbor_id", "cell_rank")
        .join(broadcast(exact), ["query_id", "neighbor_id"])
        .join(broadcast(grid), F.col("cell_rank") <= F.col("n_probe"))
        .groupBy("n_probe")
        .agg(F.count("*").alias("rh"))
    )
    return (
        grid.join(broadcast(hits), "n_probe", "left")
        .join(broadcast(rerank_hits), "n_probe", "left")
        .select(
            "n_probe",
            F.coalesce("h", F.lit(0)).cast("bigint").alias("adc_hits"),
            F.expr("CAST(coalesce(h, 0) * 10000 DIV 30 AS BIGINT)").alias(
                "adc_recall_bp"
            ),
            F.coalesce("rh", F.lit(0)).cast("bigint").alias("rerank_hits"),
            F.expr("CAST(coalesce(rh, 0) * 10000 DIV 30 AS BIGINT)").alias(
                "rerank_recall_bp"
            ),
        )
    )


@query("ann_ivfpq_topk_indexed", oracle=_IVFPQ_ORACLE)
def ann_ivfpq_topk_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ann_ivfpq_topk`` served from the MATERIALIZED cell-partitioned
    codes index (``pq_codes_table(with_cells=True)``): the (vec_id,
    cell_id, s, code) frame is encoded once at ingest and written
    PARTITIONED BY cell_id, so a probed query's scan is partition
    pruning down to its n_probe cells' directories — the literal
    inverted-file read, with ADC compressed-domain scoring inside.
    Identical answers to the inline form (same oracle); steady-state
    cost is the probe-side broadcast + the pruned ADC join, with
    neither encode nor cell assignment on the query path."""
    return _ivfpq_score(
        spark, sf_dir, pq_codes_table(spark, sf_dir, with_cells=True)
    )
