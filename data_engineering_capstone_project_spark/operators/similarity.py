"""Similarity search over embedding columns (array<float>).

Two tiers (SURVEY.md §7 M5):

* ``brute_force_topk`` -- exact cosine top-k. The corpus side is
  broadcast when it fits (typical for query-batch x corpus lookups);
  otherwise the cross join shards naturally. O(|Q| x |C|) -- the
  baseline and the verifier for approximate variants.
* ``sign_lsh_bucket`` / ``ann_lsh_topk`` -- random-hyperplane-style LSH
  restricted to coordinate hyperplanes (sign bits of fixed dims), so it
  is deterministic and engine-portable. Buckets turn the cross join
  into an equi-join on the bucket key: cost drops to O(n * bucket) and
  the shuffle is a plain hash partition on the key -- the 100 TB path.

All arithmetic is element-order left-to-right with per-element casts to
double, so an oracle can reproduce results bit-for-bit (modulo the
round() applied at the end).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    """Left-to-right double dot product of two float arrays."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def indexable(vec: Column) -> Column:
    """A vector the similarity family can score: non-NULL with a
    POSITIVE norm. A NULL row has no vector; a zero-norm vector has no
    direction, so cosine to it is undefined (and divides by zero under
    ANSI). Every family entry point FILTERS on this — quarantine, the
    same contract as the media decoders' null payloads — and every
    oracle carries the matching ``embedding IS NOT NULL AND dot > 0``
    clause (r8 adversarial-embeddings audit)."""
    return vec.isNotNull() & (dot(vec, vec) > 0)


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _with_sq(df: DataFrame, id_alias: str, vec_alias: str, sq_alias: str, id_col: str, vec_col: str) -> DataFrame:
    """(id, vec, dot(vec, vec)) for the indexable rows — the squared
    norm is computed ONCE per row and reused by both the indexability
    filter and the cosine denominator (r13): ``dot`` is a zip_with/
    aggregate higher-order expression evaluated in the INTERPRETED
    expression path (CodegenFallback), so the r12 shape — dot in the
    filter, plus two fresh norms per candidate PAIR — paid ~3x the
    lambda evaluations per pair. sqrt(sq) is the same computation
    chain as norm(), so every double is bit-identical."""
    sq = dot(F.col(vec_col), F.col(vec_col))
    return (
        df.select(
            F.col(id_col).alias(id_alias),
            F.col(vec_col).alias(vec_alias),
            sq.alias(sq_alias),
        )
        .filter(F.col(vec_alias).isNotNull() & (F.col(sq_alias) > 0))
    )


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    broadcast_queries: bool = True,
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, cos, rnk).

    Self-matches are excluded. Ranking is by the *rounded* cosine with
    the neighbor id as tiebreak, so results are stable across engines
    and runs (unrounded doubles can differ at 1 ulp between engines,
    which must not reorder the top-k boundary).
    """
    q = _with_sq(queries, "query_id", "qv", "qsq", id_col, vec_col)
    c = _with_sq(corpus, "neighbor_id", "cv", "csq", id_col, vec_col)
    if broadcast_queries:
        q = broadcast(q)
    cos = dot(F.col("qv"), F.col("cv")) / (
        F.sqrt(F.col("qsq")) * F.sqrt(F.col("csq"))
    )
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (F.floor(cos * 10000) / F.lit(10000.0)).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return scored.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= k
    )


# Fixed coordinate hyperplanes for the deterministic sign-LSH bucket.
SIGN_DIMS = (1, 9, 17, 25, 33, 41, 49, 57)  # 1-indexed positions


def sign_lsh_bucket(vec: Column, dims: tuple[int, ...] = SIGN_DIMS) -> Column:
    """8-char '1'/'0' bucket key from the signs of fixed coordinates.

    Equivalent to random-hyperplane LSH with axis-aligned hyperplanes;
    deterministic (no RNG) so oracle engines agree. ~2^8 buckets.

    Vectors shorter than max(dims) raise a clear error rather than
    ANSI INVALID_ARRAY_INDEX (or a silent all-'0' tail in non-ANSI
    mode). A NULL vector yields a NULL bucket (standard SQL f(NULL)
    semantics — the r8 audit found the raise also firing for NULL
    rows, where "no vector" is quarantinable data, not corruption; a
    NULL bucket never equi-joins, so such rows drop out of candidate
    generation naturally)."""
    max_d = max(dims)
    bits = [
        F.when(F.element_at(vec, d) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for d in dims
    ]
    return F.when(F.size(vec) >= max_d, F.concat(*bits)).otherwise(
        F.when(
            vec.isNotNull(),
            F.raise_error(
                F.format_string(
                    "sign_lsh_bucket: vector has %d dims, needs >= "
                    + str(max_d),
                    F.size(vec),
                )
            ),
        )
    )


def ann_lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket, then exact cosine rank within bucket. The cross join becomes
    an equi-join on the bucket key -- linear shuffle, no all-pairs."""
    q = _with_sq(queries, "query_id", "qv", "qsq", id_col, vec_col).select(
        "query_id", "qv", "qsq", sign_lsh_bucket(F.col("qv")).alias("bkt")
    )
    c = _with_sq(corpus, "neighbor_id", "cv", "csq", id_col, vec_col).select(
        "neighbor_id", "cv", "csq", sign_lsh_bucket(F.col("cv")).alias("bkt")
    )
    cos = dot(F.col("qv"), F.col("cv")) / (
        F.sqrt(F.col("qsq")) * F.sqrt(F.col("csq"))
    )
    scored = (
        broadcast(q)
        .join(c, "bkt")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (F.floor(cos * 10000) / F.lit(10000.0)).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return scored.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= k
    )
