"""IVF (inverted-file) approximate nearest neighbor over an embedding
column — the second scale path next to sign-LSH (operators/similarity).

IVF shape: train a coarse quantizer (k-means, fixed seed) -> assign
every corpus vector to its nearest centroid (its "cell") -> at query
time score only the ``n_probe`` cells nearest to the query. Search cost
drops from O(|corpus|) per query to O(|corpus| * n_probe / n_cells) —
the standard FAISS IndexIVFFlat layout, here expressed as DataFrames:
the corpus assignment is a one-off batch job (at 100 TB: write it
partitioned by cell id), and the probe is a broadcast equi-join on the
cell id, so no shuffle ever touches the full corpus at query time.

Centroid assignment is a broadcast cross-join + rank (n_cells is
small by construction); everything stays in JVM expressions — the only
Python is the k-means fit itself (spark.ml, distributed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.window import Window

from data_engineering_capstone_project_spark.operators.similarity import cosine


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

    feats = corpus.select(array_to_vector(F.col(vec_col)).alias("features"))
    model = KMeans(
        k=n_cells, seed=seed, distanceMeasure="cosine", featuresCol="features"
    ).fit(feats)
    spark = corpus.sparkSession
    rows = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    return spark.createDataFrame(rows, "cell_id int, centroid array<double>")


def assign_cells(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str = "embedding",
    n_probe: int = 1,
) -> DataFrame:
    """Attach the ``n_probe`` nearest cell_ids to each vector
    (n_probe=1 = corpus-side assignment; >1 = query-side probing).
    Broadcast cross-join against the tiny centroid table, rank by
    cosine — O(n_cells) work per vector, no shuffle of ``df``."""
    scored = df.crossJoin(broadcast(centroids)).withColumn(
        "_sim", cosine(F.col(vec_col), F.col("centroid"))
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("_sim"), F.asc("cell_id"))
    return (
        scored.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= n_probe)
        .drop("_sim", "_r", "centroid")
    )


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
        centroids, id_col="neighbor_id", vec_col="cv", n_probe=1,
    )
    q = assign_cells(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")),
        centroids, id_col="query_id", vec_col="qv", n_probe=n_probe,
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
