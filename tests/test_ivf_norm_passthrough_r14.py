"""r14 (VERDICT r13 #6): assign_cells' squared-norm passthrough must
be bit-identical to the similarity family's interpreted dot fold, so
ann_ivf_topk's cosine can reuse it instead of recomputing two norms
per candidate pair."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_assign_cells_sq_passthrough_matches_dot_fold(spark):
    from data_engineering_capstone_project_spark.operators.similarity import (
        dot,
    )
    from data_engineering_capstone_project_spark.operators.vector_index import (
        assign_cells,
        sampled_centroids,
    )
    from data_engineering_capstone_project_spark.plans.registry import table

    emb = table(spark, "/root/testdata/sf0.001", "embeddings")
    cents = sampled_centroids(emb, n_cells=4)
    out = assign_cells(emb, cents, n_probe=2, with_sq="sq")
    # bit-identical: the kernel's strict left-to-right fold == the
    # zip_with/aggregate expression fold
    mism = (
        out.withColumn("expr_sq", dot(F.col("embedding"), F.col("embedding")))
        .filter(F.col("sq") != F.col("expr_sq"))
        .count()
    )
    assert mism == 0
    rows = out.count()
    assert rows > 0
    # the passthrough adds a column, never rows: same assignment as
    # the plain call
    plain = assign_cells(emb, cents, n_probe=2)
    assert plain.count() == rows
    a = sorted(
        tuple(r) for r in out.select("vec_id", "cell_id").collect()
    )
    b = sorted(
        tuple(r) for r in plain.select("vec_id", "cell_id").collect()
    )
    assert a == b
