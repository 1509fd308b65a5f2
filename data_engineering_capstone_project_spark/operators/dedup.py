"""Deduplication operators for training-data pipelines: exact,
n-gram Jaccard, MinHash+LSH, SimHash.

Scale design (the point of each variant):

* ``exact_dedup``      -- one hash-shuffle on the fingerprint; the only
                          O(n) exact method. Always run it first: it
                          shrinks the input for the fuzzy passes.
* ``jaccard_pairs``    -- exact pairwise similarity *within blocks*.
                          Quadratic in block size; only usable when a
                          cheap blocking key (language, length bucket,
                          LSH band) bounds blocks. The verifier for the
                          sketch-based methods.
* ``minhash_signatures``/``lsh_candidate_pairs``
                       -- the 100 TB path: per-doc signature is a linear
                          scan (explode shingles + min-agg), candidate
                          generation is a self-join on band hashes, so
                          total cost ~ O(n * bands) shuffle instead of
                          O(n^2) compare. Lexicographic min over md5
                          hex strings is a valid uniform MinHash and is
                          engine-portable for the oracle.
* ``simhash64``        -- near-dup via Hamming distance on a 64-bit
                          signature; one pass, no join to build.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def exact_dedup(df: DataFrame, key: Column, id_col: str) -> DataFrame:
    """Group rows by content fingerprint; keep the smallest id as the
    canonical representative. Returns (hash, keep_id, dups)."""
    return df.groupBy(key.alias("h")).agg(
        F.min(id_col).alias("keep_id"),
        F.count("*").alias("dups"),
    )


def tokenize(text: Column) -> Column:
    """Lowercase whitespace tokens (order-preserving, with repeats)."""
    return F.split(F.lower(F.trim(text)), r"\s+")


def word_set(text: Column) -> Column:
    """Distinct lowercase whitespace tokens."""
    return F.array_distinct(tokenize(text))


def word_bigrams(tokens: Column) -> Column:
    """Bigram OCCURRENCES (order-preserving, WITH repeats — LM counts
    need multiplicity, so ``word_shingles``' array_distinct would be
    wrong). Same materialized-toks discipline as word_shingles (see its
    docstring: pass a plain array attribute, never an inline
    tokenize(...)); the size<2 guard is required because Spark's
    sequence(0, -1) would generate a DESCENDING range, not an empty
    one."""
    mk = lambda i: F.concat_ws(  # noqa: E731
        " ", F.element_at(tokens, i + 1), F.element_at(tokens, i + 2)
    )
    return F.when(
        F.size(tokens) < 2, F.array().cast("array<string>")
    ).otherwise(F.transform(F.sequence(F.lit(0), F.size(tokens) - 2), mk))


def word_shingles(tokens: Column, k: int = 3) -> Column:
    """Distinct k-word shingles (arrays of 'w1 w2 w3' strings).

    ``tokens`` MUST be a materialized array column (a plain attribute,
    e.g. ``df.select(tokenize(text).alias("toks"))`` first), not an
    inline ``tokenize(...)`` expression: this builder references the
    array ~3x per shingle, codegen does not common-subexpression-
    eliminate inside higher-order-function lambdas, and Catalyst's
    CollapseProject declines to inline a non-cheap alias — so the
    two-step form evaluates the regex split once per row where the
    inline form re-splits per element_at (measured 15x slower).
    """
    idx = F.sequence(F.lit(0), F.size(tokens) - k)
    shingle = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(tokens, i + j + 1) for j in range(k)]
    )
    return F.when(F.size(tokens) < k, F.array().cast("array<string>")).otherwise(
        F.array_distinct(F.transform(idx, shingle))
    )


def jaccard(a: Column, b: Column) -> Column:
    """|a ∩ b| / |a ∪ b| over distinct-element arrays."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union == 0, F.lit(0.0)).otherwise(inter / union)


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    set_col: Column,
    block_col: Column,
    threshold: float = 0.5,
) -> DataFrame:
    """All pairs within a block with Jaccard >= threshold.

    The self-join shuffles once on the block key; pair generation never
    crosses blocks, so the quadratic term is bounded by max block size
    -- choose ``block_col`` accordingly (language, length bucket, or an
    LSH band hash for the real scale path).
    """
    a = df.select(
        F.col(id_col).alias("id_a"), set_col.alias("set_a"), block_col.alias("blk")
    )
    b = df.select(
        F.col(id_col).alias("id_b"), set_col.alias("set_b"), block_col.alias("blk")
    )
    pairs = a.join(b, "blk").filter(F.col("id_a") < F.col("id_b"))
    jac = jaccard(F.col("set_a"), F.col("set_b"))
    return (
        pairs.withColumn("jac", F.floor(jac * 10000) / F.lit(10000.0))
        .filter(F.col("jac") >= threshold)
        .select("id_a", "id_b", "jac")
    )


def jaccard_pairs_size_blocked(
    df: DataFrame,
    id_col: str,
    set_col: Column,
    block_col: Column,
    threshold: float = 0.5,
) -> DataFrame:
    """All pairs with Jaccard >= threshold, blocked by (block_col,
    set-size bucket) — EXACT, unlike plain single-bucket blocking.

    Jaccard >= t implies |smaller|/|larger| >= t, so a qualifying
    pair's floor(log2(size)) buckets differ by at most
    ceil(log2(1/t)). Emitting each doc into its own bucket plus that
    many neighbors guarantees every qualifying pair meets in some
    bucket; the candidate-pair distinct drops pairs caught twice. This
    turns a |block|^2 compare (all same-language docs) into sum over
    size-buckets of |bucket|^2 — the difference between hours and
    seconds once blocks pass ~10^3 rows, and the only change needed
    to keep the exact verifier usable at 100 TB.

    ``set_col`` must produce DISTINCT-element arrays (every caller
    builds them with array_distinct): the interned grouping and the
    arithmetic |A|+|B|-o union below rely on it.
    """
    import math

    from pyspark.sql.window import Window

    neighbors = max(1, math.ceil(math.log2(1.0 / threshold)))
    base = df.select(
        F.col(id_col).alias("_id"), set_col.alias("_set"), block_col.alias("_blk")
    )
    # r14 (found by the full-registry sweep: this operator was the
    # single most expensive registered query at 150 s for 5.65M
    # candidate meetings): three result-preserving cuts, each the
    # prefix-filter operator's own discipline applied here.
    #
    # 1. INTERN tokens to dense int ids (one row_number over the
    #    DISTINCT-token vocabulary — bounded by token entropy, not
    #    corpus size): every per-pair intersect/union then compares
    #    ints, not strings. Ids are a bijection on tokens, so set
    #    sizes, intersections and the jac value are untouched.
    tok = base.select("_id", "_blk", F.explode("_set").alias("_tok"))
    vocab = (
        tok.select("_tok")
        .distinct()
        .select(
            "_tok",
            F.row_number().over(Window.orderBy("_tok")).alias("_tid"),
        )
    )
    isets = (
        tok.join(vocab, "_tok")
        .groupBy("_id", "_blk")
        .agg(F.array_sort(F.collect_list("_tid")).alias("_wi"))
        .withColumn("_sz", F.size("_wi"))
    )
    bkt = F.floor(F.log2(F.col("_sz")))
    e = isets.select(
        "_id",
        "_blk",
        "_sz",
        F.explode(F.array(*[bkt + i for i in range(neighbors + 1)])).alias(
            "_bkt"
        ),
    )
    a = e.select(
        F.col("_id").alias("id_a"), F.col("_sz").alias("_sz_a"), "_blk", "_bkt"
    )
    b = e.select(
        F.col("_id").alias("id_b"), F.col("_sz").alias("_sz_b"), "_blk", "_bkt"
    )
    # 2. EXACT-SAFE size prefilter with the SAME floored arithmetic as
    #    the final jac filter: o <= min(|A|,|B|) and |A∪B| >= max, so
    #    jac <= min/max pointwise BEFORE flooring, and floor(x*1e4)/1e4
    #    is monotone — a pair failing this can never pass the real
    #    filter. 3. DEDUP the candidate pairs (each pair meets in up to
    #    neighbors+1 buckets) BEFORE the expensive verify, carrying ids
    #    only across the distinct; the int sets re-attach by id join.
    ratio = (
        F.floor(
            F.least("_sz_a", "_sz_b")
            / F.greatest("_sz_a", "_sz_b")
            * 10000
        )
        / F.lit(10000.0)
    )
    cand = (
        a.join(b, ["_blk", "_bkt"])
        .filter((F.col("id_a") < F.col("id_b")) & (ratio >= threshold))
        .select("id_a", "id_b")
        .distinct()
    )
    o = F.size(F.array_intersect(F.col("_wi_a"), F.col("_wi_b")))
    # |A ∪ B| = |A| + |B| - o exactly (distinct-element arrays), the
    # arithmetic union the prefix-filter verifier already uses.
    jac = F.floor(o / (F.col("_sz_a") + F.col("_sz_b") - o) * 10000) / F.lit(
        10000.0
    )
    return (
        cand.join(
            isets.select(
                F.col("_id").alias("id_a"),
                F.col("_wi").alias("_wi_a"),
                F.col("_sz").alias("_sz_a"),
            ),
            "id_a",
        )
        .join(
            isets.select(
                F.col("_id").alias("id_b"),
                F.col("_wi").alias("_wi_b"),
                F.col("_sz").alias("_sz_b"),
            ),
            "id_b",
        )
        .withColumn("jac", jac)
        .filter(F.col("jac") >= threshold)
        .select("id_a", "id_b", "jac")
    )


def minhash_signatures(
    df: DataFrame, id_col: str, shingle_col: Column, num_hashes: int = 8
) -> DataFrame:
    """Per-doc MinHash signature: the i-th hash is an 8-hex-char
    (32-bit) slice of md5 over the shingle; lexicographic min of hex =
    uniform min. One md5 yields 4 independent 32-bit hashes, so
    num_hashes=8 costs 2 md5 evaluations per shingle instead of 8 —
    hashing dominates signature cost at corpus scale. Engine-portable
    (md5 + substr exist everywhere).

    Linear scan: explode shingles once, aggregate num_hashes mins in a
    single partial+final agg -- no joins, no driver round-trips. Docs
    with no shingles are dropped (nothing to compare).
    """
    exploded = df.select(
        F.col(id_col).alias("doc"), F.explode(shingle_col).alias("sh")
    )
    n_md5 = (num_hashes + 3) // 4
    digests = [
        F.md5(F.concat(F.lit(f"{d}:"), F.col("sh"))) for d in range(n_md5)
    ]
    aggs = [
        F.min(
            F.substring(digests[i // 4], (i % 4) * 8 + 1, 8)
        ).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]
    return exploded.groupBy("doc").agg(*aggs)


def band_explode(
    signatures: DataFrame, bands: int = 4, rows_per_band: int = 2
) -> DataFrame:
    """One explode projection turning a signature row into ``bands``
    (doc, band_h) rows. Band index is part of the hash so equal minhash
    values in *different* band positions can never collide into a
    pair."""
    band_hashes = [
        F.md5(
            F.concat_ws(
                "|",
                F.lit(str(b)),
                *[F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)],
            )
        )
        for b in range(bands)
    ]
    return signatures.select(
        "doc", F.explode(F.array(*band_hashes)).alias("band_h")
    )


def _cap_buckets(banded: DataFrame, max_bucket: int | None) -> DataFrame:
    """Drop degenerate LSH buckets BEFORE any pair generation: a bucket
    with m members emits O(m^2) pairs, so one boilerplate bucket turns
    the linear plan quadratic. A count-groupBy semi-filter — linear.
    The ONE shared guard for both the self-join and incremental pair
    generators, so a fix cannot diverge between them."""
    if max_bucket is None:
        return banded
    ok = (
        banded.groupBy("band_h")
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") <= max_bucket)
        .select("band_h")
    )
    return banded.join(ok, "band_h")


def lsh_incremental_pairs(
    signatures: DataFrame,
    is_new,
    bands: int = 4,
    rows_per_band: int = 2,
    max_bucket: int | None = None,
) -> DataFrame:
    """Incremental-ingest dedup: band the signatures once, split into
    the NEW batch (``is_new``, a boolean Column over ``doc``) and the
    EXISTING corpus, and equi-join new bands against existing bands
    only. The full self-join generates new×new + new×old + old×old
    candidates; an ingest run only needs new×old (plus new×new if the
    batch should self-dedup — compose with ``lsh_candidate_pairs`` over
    the batch alone), and old×old is by far the largest term: at 100 TB
    corpus + 1 TB daily batch the self-join is ~100× more bucket pairs
    than this join touches. In production the existing side reads the
    MATERIALIZED signature table from the last run (the staging seam
    documented in plans/text_analysis.py) — signatures for old docs are
    never recomputed, and the new side is small enough to broadcast.
    Returns distinct (new_doc_id, existing_doc_id)."""
    banded = _cap_buckets(band_explode(signatures, bands, rows_per_band), max_bucket)
    new_b = banded.filter(is_new)
    old_b = banded.filter(~is_new)
    return (
        new_b.alias("a")
        .join(old_b.alias("b"), "band_h")
        .select(
            F.col("a.doc").alias("new_doc_id"),
            F.col("b.doc").alias("existing_doc_id"),
        )
        .distinct()
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    bands: int = 4,
    rows_per_band: int = 2,
    max_bucket: int | None = None,
) -> DataFrame:
    """Band the signature (bands x rows_per_band columns) and emit
    candidate pairs sharing at least one band hash.

    Bands are produced by ONE explode projection (not a union of
    per-band frames) self-joined on the band hash: the signature
    subtree is computed twice (once per join side — measured: Catalyst
    does not ReusedExchange across the join) versus 2×bands times for
    a union-per-band plan. A group-and-pair alternative (collect_list
    per bucket + array pair expansion) computes signatures once but
    builds each bucket's pair set inside ONE row — measured no faster
    here and an OOM hazard on adversarial buckets, so the self-join's
    distributed pair generation wins. Distinct at the end removes
    pairs caught by multiple bands.

    ``max_bucket`` is the production guard for 100 TB corpora: a band
    bucket with m members emits m(m-1)/2 pairs, so ONE degenerate
    bucket (boilerplate, empty docs, templated spam sharing a band)
    turns the linear plan quadratic. Buckets larger than ``max_bucket``
    are dropped BEFORE the self-join (a count-groupBy semi-filter —
    linear), trading recall on exactly the near-duplicate-everything
    mass that per-pair dedup handles badly anyway (cluster it via
    exact fingerprints instead). None = no cap (small-SF exactness;
    the oracle-checked default)."""
    banded = _cap_buckets(band_explode(signatures, bands, rows_per_band), max_bucket)
    a = banded.alias("a")
    bb = banded.alias("b")
    return (
        a.join(bb, "band_h")
        .filter(F.col("a.doc") < F.col("b.doc"))
        .select(F.col("a.doc").alias("id_a"), F.col("b.doc").alias("id_b"))
        .distinct()
    )


def simhash_signatures(
    df: DataFrame, id_col: str, text: Column, bits: int = 64
) -> DataFrame:
    """64-bit SimHash per document: each distinct token votes +/-1 per
    bit position according to a 64-bit hash of the token; the signature
    is the sign vector, folded into one signed long.

    The token hash is two 32-bit halves of md5 (engine-portable, so a
    SQL oracle can reproduce the signature bit-for-bit), materialized
    as attributes BEFORE the vote aggregation so md5 runs once per
    token, not once per bit. Implemented as explode -> single
    partial+final hash agg with one plain SUM per bit (no higher-order
    lambdas: a 64-wide nested-lambda per-row variant exceeds Catalyst's
    analyzer iteration budget). The explode shuffles once on the doc
    id; at 100 TB that shuffle carries only (id, 64 small ints) after
    partial aggregation.
    """
    toks = F.explode(word_set(text)).alias("tok")
    md5h = F.md5(F.col("tok"))
    hashed = df.select(F.col(id_col).alias("doc"), toks).select(
        "doc",
        F.conv(F.substring(md5h, 1, 8), 16, 10).cast("long").alias("hi"),
        F.conv(F.substring(md5h, 9, 8), 16, 10).cast("long").alias("lo"),
    )
    half = lambda i: F.col("lo") if i < 32 else F.col("hi")  # noqa: E731
    votes = [
        F.sum(
            F.when(
                F.shiftright(half(i), i % 32).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1)
        ).alias(f"v{i}")
        for i in range(bits)
    ]
    per_bit = hashed.groupBy("doc").agg(*votes)
    # Fold sign bits into one long. A 64-deep arithmetic chain exceeds
    # the analyzer's iteration budget, and ANSI mode rejects the `*2`
    # once the sign bit lands -- so fold a flat array with aggregate()
    # using overflow-free shift/or.
    bit_arr = F.array(
        *[
            F.when(F.col(f"v{i}") > 0, F.lit(1).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
            for i in range(bits)
        ]
    )
    sig = F.aggregate(
        bit_arr,
        F.lit(0).cast("long"),
        lambda acc, b: F.shiftleft(acc, 1).bitwiseOR(b),
    )
    return per_bit.select("doc", sig.alias("sig"))


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit signatures."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_banded_pairs(
    signatures: DataFrame,
    id_col: str = "doc",
    sig_col: str = "sig",
    block_cols: tuple[str, ...] = (),
    max_hamming: int = 3,
    bands: int = 4,
    bits: int = 64,
) -> DataFrame:
    """All pairs with Hamming(sig) <= max_hamming, via banded Hamming
    blocking — EXACT, with a LINEAR shuffle instead of a quadratic
    within-block self-join.

    Pigeonhole: splitting the ``bits``-bit signature into ``bands``
    equal slices, a pair differing in <= max_hamming bits can touch at
    most max_hamming bands, so whenever bands > max_hamming at least
    one band is bit-identical. Equi-joining on (band index, band
    value) therefore meets every qualifying pair; the exact
    ``hamming64`` residual drops false candidates and ``distinct``
    drops pairs caught by several bands. Cost: O(n * bands) shuffle on
    a selective key (2^16 values per band) — the 100 TB path, vs the
    O(n^2 / |blocks|) compare a language- or length-blocked self-join
    degrades to. ``block_cols`` (e.g. lang) are ADDITIONAL equality
    constraints folded into the join key, not the blocking mechanism.

    Requires bands > max_hamming (else recall is lost); validated.
    """
    if bands <= max_hamming:
        raise ValueError(
            f"simhash_banded_pairs needs bands > max_hamming for exact "
            f"recall (got bands={bands}, max_hamming={max_hamming})"
        )
    if bits % bands:
        raise ValueError(f"bits={bits} not divisible by bands={bands}")
    width = bits // bands
    mask = F.lit((1 << width) - 1)
    # Arithmetic shiftright sign-extends, but the mask keeps only the
    # slice's own bits, so the top band of a negative sig is correct.
    band_vals = F.array(
        *[
            F.shiftright(F.col(sig_col), b * width).bitwiseAND(mask)
            for b in range(bands)
        ]
    )
    banded = signatures.select(
        F.col(id_col).alias("_id"),
        F.col(sig_col).alias("_sig"),
        *[F.col(c) for c in block_cols],
        F.posexplode(band_vals).alias("_band", "_band_v"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    join_keys = ["_band", "_band_v", *block_cols]
    return (
        a.join(b, join_keys)
        .filter(F.col("a._id") < F.col("b._id"))
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            hamming64(F.col("a._sig"), F.col("b._sig")).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def prefix_filter_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    set_col: Column,
    t_num: int = 1,
    t_den: int = 2,
    stage=lambda frame, key: frame,
):
    """EXACT Jaccard >= t_num/t_den pairs via prefix filtering
    (PPJoin-family) — the algorithmic core behind the
    ``prefix_filter_jaccard`` query, factored out so arbitrary small
    corpora can be property-tested against a brute-force reference.

    Tokens are interned to dense integer ids ordered by (document
    frequency, token) — the id order IS the global rarity order, so
    each doc's prefix of length s - ceil(t*s) + 1 is a plain slice of
    its sorted id array (ceil as the exact integer
    (s*t_num + t_den - 1) div t_den). Candidates come from the prefix
    self-equi-join with the size filter t|A| <= |B| <= |A|/t applied
    as integer cross-multiplication; verification is the EXACT integer
    test o * t_den >= (|A|+|B|-o) * t_num (never a comparison of the
    floored-decimal jac against a float threshold, which would drop
    boundary pairs for any t not representable in 4 decimals — e.g.
    t=1/3 with exact Jaccard exactly 1/3). The reported ``jac`` column
    is floored to 4 decimals for display/oracle parity only.
    ``stage`` is the caller's persistence hook
    (the registered query passes scoped_persist) for the two frames
    consumed twice; the default is no staging.

    Returns (id_a, id_b, jac) with jac floored to 4 decimals."""
    from pyspark.sql.window import Window

    tok = stage(
        df.select(F.col(id_col).alias("_pfid"), F.explode(set_col).alias("tok")),
        "prefix_jaccard.tok",
    )
    dfc = tok.groupBy("tok").agg(F.count("*").alias("df"))
    vocab = dfc.select(
        "tok",
        F.row_number()
        .over(Window.orderBy(F.asc("df"), F.asc("tok")))
        .alias("tok_id"),
    )
    isets = stage(
        tok.join(vocab, "tok")
        .groupBy("_pfid")
        .agg(F.array_sort(F.collect_list("tok_id")).alias("wi"))
        .withColumn("sz", F.size("wi")),
        "prefix_jaccard.isets",
    )
    plen = f"sz - (sz * {t_num} + {t_den} - 1) div {t_den} + 1"
    pref = isets.select(
        "_pfid", "sz", F.explode(F.expr(f"slice(wi, 1, {plen})")).alias("tok_id")
    )
    a = pref.select(
        F.col("_pfid").alias("id_a"), F.col("sz").alias("sz_a"), "tok_id"
    )
    b = pref.select(
        F.col("_pfid").alias("id_b"), F.col("sz").alias("sz_b"), "tok_id"
    )
    cand = (
        a.join(b, "tok_id")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.col("sz_b") * t_den >= F.col("sz_a") * t_num)
            & (F.col("sz_a") * t_den >= F.col("sz_b") * t_num)
        )
        .select("id_a", "id_b")
        .distinct()
    )
    o = F.size(F.array_intersect(F.col("wi_a"), F.col("wi_b")))
    jac = (
        F.floor(o / (F.col("sz_a") + F.col("sz_b") - o) * 10000)
        / F.lit(10000.0)
    )
    passes = (
        o * F.lit(t_den) >= (F.col("sz_a") + F.col("sz_b") - o) * F.lit(t_num)
    )
    return (
        cand.join(
            isets.select(
                F.col("_pfid").alias("id_a"),
                F.col("wi").alias("wi_a"),
                F.col("sz").alias("sz_a"),
            ),
            "id_a",
        )
        .join(
            isets.select(
                F.col("_pfid").alias("id_b"),
                F.col("wi").alias("wi_b"),
                F.col("sz").alias("sz_b"),
            ),
            "id_b",
        )
        .filter(passes)
        .select("id_a", "id_b", jac.alias("jac"))
    )
