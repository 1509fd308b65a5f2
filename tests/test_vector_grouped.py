"""Tests for the IVF ANN index and grouped-map operators."""

import pytest
from pyspark.sql import functions as F

from data_engineering_capstone_project_spark.operators.grouped import (
    group_zscore,
    group_zscore_window,
)
from data_engineering_capstone_project_spark.operators.similarity import (
    brute_force_topk,
)
from data_engineering_capstone_project_spark.operators.vector_index import (
    ann_ivf_topk,
    assign_cells,
    train_centroids,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_centroids_shape_and_determinism(emb):
    c1 = train_centroids(emb, n_cells=4).collect()
    c2 = train_centroids(emb, n_cells=4).collect()
    assert len(c1) == 4
    assert sorted(r.cell_id for r in c1) == [0, 1, 2, 3]
    assert {r.cell_id: r.centroid for r in c1} == {
        r.cell_id: r.centroid for r in c2
    }


def test_assign_cells_partitions_corpus(emb):
    cents = train_centroids(emb, n_cells=4)
    assigned = assign_cells(emb, cents)
    # exactly one cell per vector, all cells non-empty at this size
    assert assigned.count() == emb.count()
    assert assigned.select("cell_id").distinct().count() == 4


def test_ivf_recall_against_brute_force(emb):
    queries = emb.filter(F.col("vec_id") < 20)
    exact = brute_force_topk(queries, emb, k=5)
    approx = ann_ivf_topk(queries, emb, k=5, n_cells=4, n_probe=2)
    pairs = lambda df: {  # noqa: E731
        (r.query_id, r.neighbor_id) for r in df.collect()
    }
    got, want = pairs(approx), pairs(exact)
    assert len(want) == 20 * 5
    recall = len(got & want) / len(want)
    # 2 of 4 cells probed; uniform synthetic vectors are a worst case
    # for IVF, so the bound is deliberately loose — the point is the
    # index returns mostly-right neighbors, not exactness.
    assert recall >= 0.5, f"recall {recall}"
    # every query returns exactly k ranked rows
    per_q = approx.groupBy("query_id").count().collect()
    assert all(r["count"] == 5 for r in per_q)


def test_group_zscore_matches_window_twin(spark):
    df = spark.createDataFrame(
        [("a", float(v)) for v in (1, 2, 3, 4)]
        + [("b", 10.0)]          # single-row group -> zscore 0
        + [("c", 7.0), ("c", 7.0)],  # zero variance -> zscore 0
        "k string, v double",
    )
    got = {
        (r.k, r.v): r.zscore
        for r in group_zscore(df, ["k"], "v").collect()
    }
    want = {
        (r.k, r.v): r.zscore
        for r in group_zscore_window(df, ["k"], "v").collect()
    }
    assert got.keys() == want.keys()
    for key in want:
        assert abs(got[key] - want[key]) < 1e-9, key


def test_deterministic_split_is_stable_and_balanced(spark, emb):
    from data_engineering_capstone_project_spark.operators.sampling import (
        deterministic_split,
    )

    s1 = deterministic_split(emb, "vec_id", train_pct=80)
    s2 = deterministic_split(emb, "vec_id", train_pct=80)
    a = {r.vec_id: r.split for r in s1.collect()}
    b = {r.vec_id: r.split for r in s2.collect()}
    assert a == b  # identical across runs, no RNG
    frac = sum(1 for v in a.values() if v == "train") / len(a)
    assert 0.7 < frac < 0.9


def test_stratified_sample_respects_fractions(spark, emb):
    from data_engineering_capstone_project_spark.operators.sampling import (
        stratified_sample,
    )

    labels = [r.label for r in emb.select("label").distinct().collect()]
    fractions = {lbl: (0.5 if lbl % 2 == 0 else 0.1) for lbl in labels}
    sampled = stratified_sample(emb, "label", fractions, seed=7)
    totals = {r.label: r.n for r in emb.groupBy("label").agg(
        F.count("*").alias("n")).collect()}
    got = {r.label: r.n for r in sampled.groupBy("label").agg(
        F.count("*").alias("n")).collect()}
    for lbl, n in totals.items():
        frac = got.get(lbl, 0) / n
        assert abs(frac - fractions[lbl]) < 0.25, (lbl, frac)


def test_sign_lsh_finds_planted_twins(emb, spark):
    """The property sign-LSH actually guarantees: (near-)identical
    vectors have identical sign signatures, so they ALWAYS share a
    bucket and the index finds them with exact cosine 1.0. (A recall
    bound vs brute force would be dishonest here: these synthetic
    embeddings are near-uniform — LSH's worst case — and measured
    top-k recall is ~1%, which is a property of the data, not a bug;
    the near-dup/dedup use cases the index serves are exactly the
    planted-twin shape.)"""
    from data_engineering_capstone_project_spark.operators.similarity import (
        ann_lsh_topk,
    )

    queries = emb.filter(F.col("vec_id") < 20)
    twins = queries.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding", "label"
    )
    corpus = emb.unionByName(twins)
    approx = ann_lsh_topk(queries, corpus, k=5)
    got = {
        (r.query_id, r.neighbor_id): r.cos for r in approx.collect()
    }
    for qid in range(20):
        key = (qid, qid + 1_000_000)
        assert key in got, f"twin of {qid} not found"
        # cos quantized by floor(x*1e4): exact 1.0 may land at 0.9999
        assert got[key] >= 0.9999, (key, got[key])


def test_ivfpq_recall_floor(spark):
    """The fused IVF+PQ query must retrieve a pinned fraction of the
    TRUE exact-L2 top-3 — the oracle proves self-consistency between
    engines, not retrieval quality, so without this floor a geometry
    bug that still mirrors in SQL (wrong cell probed, scrambled
    codebook) would sail through green. Measured 0.23 at sf0.01: the
    compounding of 2-of-8 probed cells with raw-ADC ranking on
    near-uniform synthetic vectors (distance concentration — the
    hardest case for both stages; plain ADC alone measures ~0.13,
    plain 2-probe IVF ~0.5). The floor is pinned at 0.1 — low enough
    to absorb fixture regeneration, high enough that a broken stage
    (recall ~ k/n ~ 0.006 at random) fails loudly. Production recall
    comes from the rerank tier (test_pq_rerank_recall_floor, 0.6)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from data_engineering_capstone_project_spark.plans.registry import table
    from data_engineering_capstone_project_spark.plans.similarity_search import (
        ann_ivfpq_topk,
    )

    got = {
        (r.query_id, r.neighbor_id)
        for r in ann_ivfpq_topk(spark, SF).collect()
    }
    emb = table(spark, SF, "embeddings")
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    c = emb.select(
        F.col("vec_id").alias("nid"), F.col("embedding").alias("cv")
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
    w = Window.partitionBy("qid").orderBy(F.asc("d"), F.asc("nid"))
    exact = {
        (r.qid, r.nid)
        for r in q.crossJoin(c)
        .filter(F.col("qid") != F.col("nid"))
        .select("qid", "nid", dist.alias("d"))
        .withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= 3)
        .collect()
    }
    assert len(exact) == 30
    recall = len(got & exact) / len(exact)
    assert recall >= 0.1, f"recall {recall}"
    # every query still returns exactly 3 ranked rows
    per_q = {r.query_id for r in ann_ivfpq_topk(spark, SF).collect()}
    assert len(per_q) == 10


def test_pq_rerank_recall_floor(spark):
    """Two-stage PQ retrieval: the ADC-top-64 shortlist + exact rerank
    must recover a pinned fraction of the TRUE exact-L2 top-3. The
    synthetic embeddings are near-uniform random (distance
    concentration — PQ's hardest case), measured 0.77 at sf0.01; the
    floor is set at 0.6 to absorb fixture regeneration. Plain ADC rank
    alone measures ~0.13 here, which is exactly why the rerank stage
    exists."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from data_engineering_capstone_project_spark.plans.registry import table
    from data_engineering_capstone_project_spark.plans.similarity_search import (
        ann_pq_rerank_topk,
    )

    sf = SF
    got = {
        (r.query_id, r.neighbor_id)
        for r in ann_pq_rerank_topk(spark, sf).collect()
    }
    emb = table(spark, sf, "embeddings")
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    c = emb.select(
        F.col("vec_id").alias("nid"), F.col("embedding").alias("cv")
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
    w = Window.partitionBy("qid").orderBy(F.asc("d"), F.asc("nid"))
    exact = {
        (r.qid, r.nid)
        for r in q.crossJoin(c)
        .filter(F.col("qid") != F.col("nid"))
        .select("qid", "nid", dist.alias("d"))
        .withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= 3)
        .collect()
    }
    recall = len(got & exact) / len(exact)
    assert recall >= 0.6, recall


def test_ivfpq_probe_sweep_rerank_monotone_with_floor(spark):
    """The n_probe dial, pinned where the guarantee actually holds
    (VERDICT r6 #7, adjusted to the measurement): rerank-tier recall
    (exact top-3 members reachable in the probed cells — what
    IVF+PQ+rerank serves) must be NON-DECREASING in n_probe and above
    a floor; raw-ADC recall gets only the floor, because on this
    near-uniform fixture it is measurably NON-monotone (2666 -> 2333
    -> 2000 bp at sf0.01: widening the pool lets badly-quantized
    candidates displace true neighbors from the ADC top-3) — pinning
    monotonicity there would assert a property the tier does not have.
    Floors: rerank 0.5 (measured 0.83 at 1 probe; 0.93 at 4),
    ADC 0.1 at every probed level (measured 0.20-0.27), both set to
    absorb fixture regeneration while failing loudly on a broken
    stage (random recall ~ k/n ~ 0.006)."""
    from data_engineering_capstone_project_spark.plans.similarity_search import (
        ann_ivfpq_probe_sweep,
    )

    rows = {
        r.n_probe: r for r in ann_ivfpq_probe_sweep(spark, SF).collect()
    }
    assert sorted(rows) == [1, 2, 4]
    assert (
        rows[1].rerank_recall_bp
        <= rows[2].rerank_recall_bp
        <= rows[4].rerank_recall_bp
    ), {p: rows[p].rerank_recall_bp for p in rows}
    for p, r in rows.items():
        assert r.rerank_recall_bp >= 5000, (p, r.rerank_recall_bp)
        assert r.adc_recall_bp >= 1000, (p, r.adc_recall_bp)
        # bp columns must agree with their hit counts (integer div 30)
        assert r.adc_recall_bp == r.adc_hits * 10000 // 30
        assert r.rerank_recall_bp == r.rerank_hits * 10000 // 30
