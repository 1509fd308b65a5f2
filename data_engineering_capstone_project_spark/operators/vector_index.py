"""IVF (inverted-file) approximate nearest neighbor over an embedding
column — the second scale path next to sign-LSH (operators/similarity).

IVF shape: train a coarse quantizer -> assign every corpus vector to
its nearest centroid (its "cell") -> at query time score only the
``n_probe`` cells nearest to the query. Search cost drops from
O(|corpus|) per query to O(|corpus| * n_probe / n_cells) — the
standard FAISS IndexIVFFlat layout, here expressed as DataFrames: the
corpus assignment is a one-off batch job (at 100 TB: write it
partitioned by cell id), and the probe is a broadcast equi-join on the
cell id, so no shuffle ever touches the full corpus at query time.

Cell assignment is a PURE PROJECTION: the centroid table is bounded
(n_cells rows) by construction, so it is collected once and unrolled
into a literal array of (quantized -similarity, cell_id) structs;
``array_sort`` picks the argmin per row. No crossJoin, no window, no
Exchange — the corpus is never shuffled to be assigned, which is the
difference between a map-only pass and a full re-partition of 100 TB.

Two quantizers:

* ``train_centroids``  -- spark.ml KMeans (distributed fit, fixed
                          seed). The quality path; not reproducible in
                          a SQL oracle, so its parity is pinned by the
                          recall-vs-brute-force test instead.
* ``sampled_centroids`` -- the n_cells lowest-id corpus vectors as
                          centroids ("random-sample coarse quantizer").
                          Deterministic and engine-portable: a DuckDB
                          oracle can rebuild the identical index, so
                          the whole IVF query is value-checkable.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.window import Window

from data_engineering_capstone_project_spark.operators.similarity import (
    cosine,
    dot,
    indexable,
    norm,
)


def train_centroids(
    corpus: DataFrame,
    n_cells: int = 8,
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Fit the coarse quantizer; returns (cell_id int, centroid
    array<double>). Deterministic for a fixed seed + input."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = corpus.filter(indexable(F.col(vec_col))).select(
        array_to_vector(F.col(vec_col)).alias("features")
    )
    model = KMeans(
        k=n_cells, seed=seed, distanceMeasure="cosine", featuresCol="features"
    ).fit(feats)
    spark = corpus.sparkSession
    rows = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    return spark.createDataFrame(rows, "cell_id int, centroid array<double>")


def sampled_centroids(
    corpus: DataFrame,
    n_cells: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-sample coarse quantizer: the ``n_cells`` lowest-id
    vectors become the centroids (cell_id = 0..n_cells-1 in id order).
    Deterministic, no RNG, no iterative fit — and reproducible in any
    SQL engine, so IVF results built on it are oracle-checkable.
    Quality is below k-means but adequate when the corpus is not
    strongly clustered; swap in ``train_centroids`` where recall
    matters more than portability. Non-indexable vectors (NULL or
    zero-norm — similarity.indexable) are excluded: an unindexable row
    cannot be a centroid (a NULL embedding reached assign_cells'
    collect as a None centroid in the r7 all-NULL audit; a zero-norm
    centroid would divide every cosine assignment by zero — r8
    adversarial-embeddings audit). Oracle ids CTEs carry the matching
    WHERE clause."""
    w = Window.orderBy(id_col)
    return (
        corpus.filter(indexable(F.col(vec_col)))
        .orderBy(id_col)
        .limit(n_cells)
        .select(
            (F.row_number().over(w) - 1).alias("cell_id"),
            F.col(vec_col).cast("array<double>").alias("centroid"),
        )
    )


def assign_cells(
    df: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    n_probe: int = 1,
    with_rank: bool = False,
) -> DataFrame:
    """Attach the ``n_probe`` nearest cell_ids to each vector
    (n_probe=1 = corpus-side assignment; >1 = query-side probing).
    ``with_rank=True`` additionally emits ``probe_rank`` (1 = nearest
    probed cell), so one max-n_probe assignment can serve a whole
    n_probe sweep: a candidate found at rank r is in the probe set of
    every n_probe >= r (``ann_ivfpq_probe_sweep`` builds its
    cost/recall curve from exactly this).

    The centroid table is collected (bounded: n_cells rows — the
    quantizer's contract) and unrolled into literal expressions, so
    the assignment is a map-only projection: per row, build an array
    of (-floor(sim*1e4), cell_id) structs and ``array_sort`` it. No
    join, no window, no shuffle of ``df`` — ``.explain`` shows zero
    Exchange on the corpus side (asserted in test_plan_shapes).

    Ranking uses the 4-decimal-quantized similarity with cell_id as
    tiebreak: integer compares that any engine reproduces exactly, so
    a 1-ulp summation difference can never flip an assignment between
    this and an oracle reimplementation.
    """
    cents = sorted(
        (r["cell_id"], [float(x) for x in r["centroid"]])
        for r in centroids.collect()
    )
    if not cents:
        # A quantizer trained on an empty corpus has no cells; without
        # this guard the zero-struct F.array() surfaces as an opaque
        # Catalyst INVALID_EXTRACT_BASE_FIELD_TYPE at analysis time
        # (r7 empty-input audit).
        raise ValueError(
            "assign_cells: empty centroid table — the coarse quantizer "
            "was trained on an empty corpus"
        )
    if len(cents) > 4096:
        raise ValueError(
            f"assign_cells: {len(cents)} centroids exceeds the literal-"
            "projection bound (4096); a quantizer that large needs the "
            "join-based assignment, not expression unrolling"
        )
    v = F.col(vec_col)
    vnorm = F.col("_vnorm")
    structs = []
    for cid, cv in cents:
        # Python-side sqrt/sum mirror Spark's left-to-right double
        # aggregate bit-for-bit (same IEEE ops in the same order).
        cnorm = math.sqrt(sum(x * x for x in cv))
        carr = F.array(*[F.lit(x) for x in cv])
        dotc = F.aggregate(
            F.zip_with(v, carr, lambda a, b: a.cast("double") * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sim = dotc / (vnorm * F.lit(cnorm))
        structs.append(
            F.struct(
                (-F.floor(sim * 10000)).cast("long").alias("_negsim"),
                F.lit(cid).cast("int").alias("cell_id"),
            )
        )
    # Non-indexable rows (NULL/zero-norm vector) are unassignable —
    # their cosine to every centroid divides by zero — and are
    # quarantined here so every caller (IVF corpus/query assignment,
    # IVFPQ fused encode, the probe sweep) inherits one contract (r8
    # adversarial-embeddings audit; oracles filter identically).
    # The squared norm is computed ONCE and reused by the filter and
    # as sqrt(_vsq) = _vnorm (r13): dot() is an interpreted
    # higher-order expression, and the r12 indexable()+norm() pair
    # evaluated it twice per row. Staged in its own projection so
    # CollapseProject keeps it one-eval-per-row instead of inlining
    # it into every struct (see the word_shingles note).
    cols = df.columns
    staged = (
        df.withColumn("_vsq", dot(v, v))
        .filter(v.isNotNull() & (F.col("_vsq") > 0))
        .withColumn("_vnorm", F.sqrt(F.col("_vsq")))
    )
    ranked = staged.withColumn(
        "_cells", F.slice(F.array_sort(F.array(*structs)), 1, n_probe)
    )
    if n_probe == 1 and not with_rank:
        return ranked.withColumn(
            "cell_id", F.element_at("_cells", 1).getField("cell_id")
        ).drop("_vsq", "_vnorm", "_cells")
    if with_rank:
        return ranked.select(
            *cols, F.posexplode("_cells").alias("_pos", "_c")
        ).select(
            *cols,
            F.col("_c.cell_id").alias("cell_id"),
            (F.col("_pos") + 1).cast("int").alias("probe_rank"),
        )
    return ranked.select(
        *cols, F.explode("_cells").alias("_c")
    ).select(*cols, F.col("_c.cell_id").alias("cell_id"))


def ann_ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    n_cells: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Approximate cosine top-k: (query_id, neighbor_id, cos, rnk).
    Pass a pre-trained ``centroids`` frame to skip refitting (the
    production pattern: train once, reuse per query batch)."""
    if centroids is None:
        centroids = train_centroids(corpus, n_cells, vec_col)
    c = assign_cells(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")),
        centroids, vec_col="cv", n_probe=1,
    )
    q = assign_cells(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")),
        centroids, vec_col="qv", n_probe=n_probe,
    )
    scored = (
        broadcast(q)
        .join(c, "cell_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (F.floor(cosine(F.col("qv"), F.col("cv")) * 10000) / F.lit(10000.0)).alias("cos"),
        )
        # A (query, neighbor) pair can meet in several probed cells.
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return scored.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= k
    )
