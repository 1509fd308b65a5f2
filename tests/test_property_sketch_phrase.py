"""Property tests for the r5 sketch/search primitives: the KMV
distinct estimator and the positional-adjacency phrase count must
agree with direct Python reference implementations on arbitrary small
inputs (ties, repeated tokens, overlapping phrase occurrences,
fewer-than-k groups)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_SETTINGS = dict(max_examples=12, deadline=None)

K, M, A = 32, 1000000007, 2654435761


@settings(**_SETTINGS)
@given(
    users=st.lists(
        st.tuples(st.sampled_from(["a", "b"]), st.integers(0, 500)),
        min_size=1,
        max_size=120,
    )
)
def test_kmv_sketch_matches_python_reference(spark, users):
    """Per-group KMV over arbitrary (group, user) multisets — covers
    the n < k exact branch, hash ties (same user repeated), and
    single-user groups."""
    df = spark.createDataFrame(users, "g string, user_id long")
    hashes = df.select(
        "g", F.pmod(F.col("user_id") * F.lit(A), F.lit(M)).alias("h")
    ).distinct()
    w = Window.partitionBy("g").orderBy(F.asc("h"))
    sk = (
        hashes.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= K)
        .groupBy("g")
        .agg(F.max("h").alias("kth"), F.count("*").alias("n"))
    )
    est = (
        F.when(F.col("n") < K, F.col("n"))
        .otherwise(F.expr(f"{(K - 1) * M} div kth"))
        .cast("bigint")
    )
    got = {r.g: r.est for r in sk.select("g", est.alias("est")).collect()}

    expected = {}
    for g in {g for g, _ in users}:
        hs = sorted({(u * A) % M for gg, u in users if gg == g})
        kept = hs[:K]
        expected[g] = (
            len(kept) if len(kept) < K else ((K - 1) * M) // kept[-1]
        )
    assert got == expected


@settings(**_SETTINGS)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["x", "y", "z"]), min_size=0, max_size=10),
        min_size=1,
        max_size=8,
    ),
    w1=st.sampled_from(["x", "y"]),
    w2=st.sampled_from(["x", "z"]),
)
def test_positional_adjacency_matches_python_reference(spark, docs, w1, w2):
    """The postings-intersection adjacency count (the core of
    phrase_search_positional, with the phrase FIXED instead of
    corpus-derived) must equal a direct scan — including overlapping
    occurrences ('x x x' contains 'x x' twice) and w1 == w2."""
    rows = [(i, toks) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id int, toks array<string>")
    pos = df.select("doc_id", F.posexplode("toks").alias("pos", "tok"))
    post = pos.filter(F.col("tok").isin([w1, w2]))
    got = {
        r.doc_id: r.occ
        for r in (
            post.alias("a")
            .filter(F.col("a.tok") == w1)
            .join(
                post.alias("b"),
                (F.col("a.doc_id") == F.col("b.doc_id"))
                & (F.col("b.pos") == F.col("a.pos") + 1),
            )
            .filter(F.col("b.tok") == w2)
            .groupBy(F.col("a.doc_id").alias("doc_id"))
            .agg(F.count("*").alias("occ"))
        ).collect()
    }

    expected = {}
    for i, toks in rows:
        n = sum(
            1
            for j in range(len(toks) - 1)
            if toks[j] == w1 and toks[j + 1] == w2
        )
        if n:
            expected[i] = n
    assert got == expected
