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
    dot,
    indexable,
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
    with_sq: str | None = None,
) -> DataFrame:
    """Attach the ``n_probe`` nearest cell_ids to each vector
    (n_probe=1 = corpus-side assignment; >1 = query-side probing).
    ``with_rank=True`` additionally emits ``probe_rank`` (1 = nearest
    probed cell), so one max-n_probe assignment can serve a whole
    n_probe sweep: a candidate found at rank r is in the probe set of
    every n_probe >= r (``ann_ivfpq_probe_sweep`` builds its
    cost/recall curve from exactly this). ``with_sq`` (r14, VERDICT
    r13 #6) additionally emits the row's squared norm under the given
    column name: the kernel already folds dot(v, v) strictly
    left-to-right to quarantine zero-norm rows, so ``sqrt(with_sq)``
    is bit-identical to ``similarity.norm`` and downstream cosines can
    drop two of their three interpreted HOF dots per candidate pair
    (``ann_ivf_topk``).

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
    # Non-indexable rows (NULL/zero-norm vector) are unassignable —
    # their cosine to every centroid divides by zero — and are
    # quarantined inside the kernel so every caller (IVF corpus/query
    # assignment, IVFPQ fused encode, the probe sweep) inherits one
    # contract (r8 adversarial-embeddings audit; oracles filter
    # identically).
    #
    # r13: the per-row (cells x dims) zip_with/aggregate expression
    # grid is now ONE vectorized Arrow kernel. Higher-order
    # expressions are CodegenFallback — the r12 "map-only projection"
    # ran ~(cells x 2 x dims) interpreted lambda invocations per row.
    # Exactness is preserved operation-for-operation: the double dot
    # folds accumulate STRICTLY LEFT-TO-RIGHT (a vectorized per-dim
    # loop, never numpy pairwise sum, so every intermediate double
    # equals the aggregate() fold's), cnorm is the same Python-side
    # sqrt/sum, sim = dotc / (vnorm * cnorm) in that operator order,
    # and ranking compares the SAME (-floor(sim*1e4) int64, cell_id)
    # pairs via lexsort. A non-finite value that survives the
    # vsq > 0 quarantine raises, as ANSI floor->long did.
    vec_idx = df.columns.index(vec_col)
    in_fields = [
        f"{fld.name} {fld.dataType.simpleString()}"
        for fld in df.schema.fields
    ]
    out_schema = ", ".join(
        in_fields
        + ["cell_id int"]
        + (["probe_rank int"] if with_rank else [])
        + ([f"{with_sq} double"] if with_sq else [])
    )
    cent_mat = [cv for _cid, cv in cents]
    cell_ids = [cid for cid, _cv in cents]
    # Python-side sqrt/sum mirror Spark's left-to-right double
    # aggregate bit-for-bit (same IEEE ops in the same order).
    cnorms = [math.sqrt(sum(x * x for x in cv)) for _cid, cv in cents]
    emit_rank = with_rank
    emit_sq = with_sq
    take_n = n_probe

    def assign(batches):
        import numpy as np
        import pyarrow as pa

        C = np.asarray(cent_mat, dtype=np.float64)  # (cells, dims)
        cn = np.asarray(cnorms, dtype=np.float64)  # (cells,)
        cids = np.asarray(cell_ids, dtype=np.int64)
        dims = C.shape[1]
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            vec = pa.chunked_array([batch.column(vec_idx)]).combine_chunks()
            valid = (
                vec.is_valid().to_numpy(zero_copy_only=False)
                if vec.null_count
                else np.ones(n, dtype=bool)
            )
            offsets = vec.offsets.to_numpy(zero_copy_only=False)
            lengths = offsets[1:] - offsets[:-1]
            if (valid & (lengths != dims)).any():
                raise ValueError(
                    f"assign_cells: vector length != {dims} centroid "
                    "dims — non-well-formed input"
                )
            flat = vec.values.to_numpy(zero_copy_only=False).astype(
                np.float64
            )
            if vec.values.null_count:
                # NULL element -> NULL dot -> quarantined (match the
                # vsq > 0 filter); poison with NaN so vsq turns NaN.
                elem_valid = vec.values.is_valid().to_numpy(
                    zero_copy_only=False
                )
                flat = np.where(elem_valid, flat, np.nan)
            vi = np.flatnonzero(valid)
            if vi.size == 0:
                continue
            x = flat[offsets[:-1][vi][:, None] + np.arange(dims)[None, :]]
            # Strict left-to-right folds (== aggregate() rounding).
            vsq = np.zeros(len(vi), dtype=np.float64)
            dotc = np.zeros((len(vi), len(cids)), dtype=np.float64)
            for d in range(dims):
                xd = x[:, d]
                vsq = vsq + xd * xd
                dotc = dotc + xd[:, None] * C[None, :, d]
            keep = vsq > 0  # False for NaN -> quarantined
            if not keep.any():
                continue
            vi = vi[keep]
            sim = dotc[keep] / (np.sqrt(vsq[keep])[:, None] * cn[None, :])
            f = np.floor(sim * 10000)
            if not np.isfinite(f).all():
                raise OverflowError(
                    "assign_cells: non-finite similarity (ANSI parity)"
                )
            negsim = -f.astype(np.int64)
            # array_sort over (_negsim, cell_id) structs == lexsort
            # with cell_id as the minor key; cents are already
            # cell_id-ascending so a stable argsort on negsim suffices.
            order = np.argsort(negsim, axis=1, kind="stable")[:, :take_n]
            g = order.shape[0]
            k = order.shape[1]
            row_idx = np.repeat(vi, k)
            cell_col = cids[order].reshape(-1).astype(np.int32)
            out = [
                batch.column(i).take(pa.array(row_idx))
                for i in range(batch.num_columns)
            ]
            out.append(pa.array(cell_col))
            if emit_rank:
                out.append(
                    pa.array(
                        np.tile(
                            np.arange(1, k + 1, dtype=np.int32), g
                        )
                    )
                )
            if emit_sq:
                out.append(pa.array(np.repeat(vsq[keep], k)))
            names = (
                list(batch.schema.names)
                + ["cell_id"]
                + (["probe_rank"] if emit_rank else [])
                + ([emit_sq] if emit_sq else [])
            )
            yield pa.RecordBatch.from_arrays(out, names)

    return df.mapInArrow(assign, out_schema)


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
    # Norm passthrough (r14, VERDICT r13 #6): the assignment kernel
    # already folds each row's dot(v, v); emit it so the per-pair
    # cosine below costs ONE interpreted HOF dot (the cross term)
    # instead of three — sqrt(sq) is the same left-to-right fold as
    # similarity.norm, bit-identical.
    c = assign_cells(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")),
        centroids, vec_col="cv", n_probe=1, with_sq="csq",
    )
    q = assign_cells(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")),
        centroids, vec_col="qv", n_probe=n_probe, with_sq="qsq",
    )
    cos = dot(F.col("qv"), F.col("cv")) / (
        F.sqrt(F.col("qsq")) * F.sqrt(F.col("csq"))
    )
    scored = (
        broadcast(q)
        .join(c, "cell_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (F.floor(cos * 10000) / F.lit(10000.0)).alias("cos"),
        )
        # A (query, neighbor) pair can meet in several probed cells.
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return scored.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= k
    )
