"""Adversarial-corpus contract: every documents-only and events-only
query matches its DuckDB oracle VALUE-EXACTLY on tables of edge-case
rows.

The r7 empty/all-NULL audit covered empty tables and all-NULL columns;
this r8 axis covers the shapes in between — REAL rows with degenerate
values among valid ones. The query lists are DERIVED (every registered
oracle that references exactly one of the two tables), so new queries
on either surface are swept automatically.

Documents sweep (degenerate text: empty string, whitespace-only, NULL
text, case folding, overlap runs, punctuation soup, exact/near dups)
found two bug classes on first run:

* ANSI DIVIDE_BY_ZERO in every quality-score consumer — an
  empty-string document crashed the WHOLE query. Fixed with
  greatest(length, 1) denominators on both engines.
* NULL-text single-cell divergences: Spark size(NULL array) vs DuckDB
  len on the shingle count (doc_repetition), and concat over an empty
  block list ('') vs NULL (span_corruption input_text).

Events sweep (NULL ts/user/type/value/props among valid rows,
malformed JSON, duplicate rows, negative and large values, session
bursts) found three more classes, all fixed on both engines:

* NULL-ordering divergence: Spark asc() sorts NULL FIRST, ANSI/DuckDB
  default NULLS LAST — flipped rank ties on a NULL event_type
  (trending family) and shifted lag/prefix windows when a NULL
  time-bucket joined an ordered series (week_over_week, cusum).
  Contract: rank ties use asc_nulls_last; untimestamped events are
  excluded from every time-bucketed series (ts IS NOT NULL on both
  engines — Spark's window()/session_window already dropped them).
* ANSI crash-on-edge-value: CAST('' AS INT) on a non-matching
  regexp_extract (parse_event_props — BOTH engines return '' on no
  match, nullif on both), and an INT cast of floor(value*4) running
  BEFORE the [0,63] clamp (percentile histogram bucket, overflowed at
  value>5.4e8).
* Engine strictness/semantics: DuckDB json_extract errors on
  malformed JSON where Spark's from_json is lenient (json_valid
  guard), and DuckDB // truncates toward zero where Spark floor()
  floors (explicit floor in the oracle).

Embeddings sweep (zero-norm vector, NULL embedding, NULL label, exact
duplicate, large magnitude) drove one family-wide contract, fixed on
both engines: a vector is INDEXABLE iff non-NULL with positive norm
(operators.similarity.indexable; SQL twin similarity_search._valid).
Every cosine path — brute force, sign-LSH, IVF assignment, the IVFPQ
fused encode, the probe sweep's exact verifier tier — QUARANTINES
non-indexable rows (previously: ANSI divide-by-zero on the zero
vector, the short-vector raise misfiring on NULL rows, NULL distances
ranking NULLS-FIRST into Spark top-k while DuckDB ranked them last,
and float(None) crashes in the collected centroid sets). PQ encode
(pure L2) keeps zero-norm vectors but requires non-NULL ones; NULL
labels seed no class centroid (Spark window-partitions group NULL
keys; SQL equi-joins drop them). The sign-LSH short-vector raise
stays loud for non-null corruption.
"""

from __future__ import annotations

import pytest as _pytest_slowmark

# Deep re-verification campaign: deselected from the default
# (driver-window) run; the round-close full suite runs it (r14,
# VERDICT r13 #1 -- pytest.ini has the split rationale).
pytestmark = _pytest_slowmark.mark.slow

import glob
import os
import re
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from data_engineering_capstone_project_spark.plans import QUERIES
from data_engineering_capstone_project_spark.plans.registry import ORACLES
from tests.conftest import SF_SMALL
from tools.compare import compare_query, duck_connection

_OTHER_TABLES = (
    "region nation customer supplier part orders lineitem events embeddings"
).split()

DOCS_ONLY = sorted(
    name
    for name, sql in ORACLES.items()
    if "documents" in sql.lower()
    and not any(
        re.search(rf"\b{t}\b", sql.lower()) for t in _OTHER_TABLES
    )
)

# (doc_id, text, lang, source): dense ids (the corpus contract), valid
# metadata, adversarial text.
DOCS = [
    (0, "the cat sat on the mat", "en", "src0"),
    (1, "", "en", "src0"),                       # empty text
    (2, None, "fr", "src1"),                     # NULL text among rows
    (3, "   ", "es", "src1"),                    # whitespace-only
    (4, "aaaa aaa aa a", "en", "src2"),          # overlap runs
    (5, "THE CAT the Cat", "de", "src0"),        # case folding
    (6, "a\nb\tc  d", "en", "src1"),             # mixed whitespace
    (7, "x", "xx", None),                        # 1 char, NULL source
    (8, "the cat sat on the mat", "en", "src2"), # exact dup of 0
    (9, "the cat sat on the hat", "en", "src0"), # near dup of 0
    (10, "99 bottles, of beer! on; the: wall.", "en", "src0"),
    (11, "lorem ipsum " * 30, "la", "src3"),     # long, repetitive
]


@pytest.fixture(scope="module")
def adversarial_sf(tmp_path_factory):
    """Single-FILE parquet dir (DuckDB's views read plain file paths):
    non-documents tables copied verbatim from SF_SMALL, documents
    synthesized with pyarrow preserving the real file's schema."""
    dst = tmp_path_factory.mktemp("adversarial_sf")
    for p in glob.glob(f"{SF_SMALL}/*.parquet"):
        if os.path.basename(p) != "documents.parquet":
            shutil.copy(p, dst / os.path.basename(p))
    schema = pq.read_table(f"{SF_SMALL}/documents.parquet").schema
    cols = {
        "doc_id": pa.array([d[0] for d in DOCS], type=pa.int64()),
        "text": pa.array([d[1] for d in DOCS], type=pa.string()),
        "lang": pa.array([d[2] for d in DOCS], type=pa.string()),
        "source": pa.array([d[3] for d in DOCS], type=pa.string()),
        "n_chars": pa.array(
            [len(d[1]) if d[1] is not None else None for d in DOCS],
            type=pa.int64(),
        ),
    }
    pq.write_table(
        pa.table([cols[f.name] for f in schema], schema=schema),
        str(dst / "documents.parquet"),
    )
    return str(dst)


def test_docs_only_list_is_substantial():
    # the derivation must not silently go empty if oracle text changes
    assert len(DOCS_ONLY) >= 45, DOCS_ONLY


@pytest.mark.parametrize("name", DOCS_ONLY)
def test_docs_query_matches_oracle_on_adversarial_corpus(
    spark, adversarial_sf, name
):
    con = duck_connection(adversarial_sf)
    try:
        problems = compare_query(
            spark, con, QUERIES[name], ORACLES[name], adversarial_sf
        )
    finally:
        con.close()
    assert not problems, problems


# --------------------------------------------------------------------------
# Events surface

_EVENTS_OTHER = (
    "region nation customer supplier part orders lineitem documents embeddings"
).split()

EVENTS_ONLY = sorted(
    name
    for name, sql in ORACLES.items()
    if "events" in sql.lower()
    and not any(re.search(rf"\b{t}\b", sql.lower()) for t in _EVENTS_OTHER)
)

import datetime as _dt  # noqa: E402

_TS = _dt.datetime
# (event_id, ts, user_id, event_type, value, props). Value stays within
# ab_test_report's DOCUMENTED fixed-point domain (|value| < ~3e5 per
# user total — its docstring declares larger values fail loudly under
# ANSI; pinned separately below).
EVENTS = [
    (0, _TS(2024, 1, 1, 0, 0, 0), 1, "view", 10.0, '{"k": 1}'),
    (1, _TS(2024, 1, 1, 0, 0, 0), 1, "view", 10.0, '{"k": 1}'),   # dup row
    (2, _TS(2024, 1, 1, 0, 0, 0, 1), 1, "purchase", -5.5, '{"k": -2}'),
    (3, None, 2, "view", 1.0, '{"k": 3}'),                         # NULL ts
    (4, _TS(2024, 1, 1, 1, 30, 0), None, "view", 2.0, "{}"),       # NULL user
    (5, _TS(2024, 1, 1, 2, 0, 0), 3, None, 3.0, None),             # NULL type
    (6, _TS(2024, 1, 1, 2, 0, 1), 3, "purchase", None, "not json"),
    (7, _TS(2023, 12, 31, 23, 59, 59, 999999), 4, "view", 0.0, '{"k": 0}'),
    (8, _TS(2024, 1, 2, 0, 0, 0), 4, "purchase", 9e4, '{"k": 99999}'),
    (9, _TS(2024, 1, 1, 12, 0, 0), 5, "error", 7.25, '{"nested": {"k": 1}}'),
    (10, _TS(2024, 1, 1, 12, 0, 30), 5, "view", 7.25, '{"k": 5}'),
    (11, _TS(2024, 1, 1, 12, 40, 0), 5, "purchase", 2.0, '{"k": 6}'),
    (12, _TS(2024, 1, 1, 12, 41, 0), 5, "view", 3.0, '{"k": 7}'),
]


@pytest.fixture(scope="module")
def adversarial_events_sf(tmp_path_factory):
    dst = tmp_path_factory.mktemp("adversarial_events_sf")
    for p in glob.glob(f"{SF_SMALL}/*.parquet"):
        if os.path.basename(p) != "events.parquet":
            shutil.copy(p, dst / os.path.basename(p))
    schema = pq.read_table(f"{SF_SMALL}/events.parquet").schema
    cols = {
        "event_id": pa.array([e[0] for e in EVENTS], type=pa.int64()),
        "ts": pa.array([e[1] for e in EVENTS], type=pa.timestamp("us")),
        "user_id": pa.array([e[2] for e in EVENTS], type=pa.int64()),
        "event_type": pa.array([e[3] for e in EVENTS], type=pa.string()),
        "value": pa.array([e[4] for e in EVENTS], type=pa.float64()),
        "props": pa.array([e[5] for e in EVENTS], type=pa.string()),
    }
    pq.write_table(
        pa.table([cols[f.name] for f in schema], schema=schema),
        str(dst / "events.parquet"),
    )
    return str(dst)


def test_events_only_list_is_substantial():
    assert len(EVENTS_ONLY) >= 45, EVENTS_ONLY


@pytest.mark.parametrize("name", EVENTS_ONLY)
def test_events_query_matches_oracle_on_adversarial_corpus(
    spark, adversarial_events_sf, name
):
    con = duck_connection(adversarial_events_sf)
    try:
        problems = compare_query(
            spark, con, QUERIES[name], ORACLES[name], adversarial_events_sf
        )
    finally:
        con.close()
    assert not problems, problems


# --------------------------------------------------------------------------
# Embeddings surface

_EMB_OTHER = (
    "region nation customer supplier part orders lineitem documents events"
).split()

EMB_ONLY = sorted(
    name
    for name, sql in ORACLES.items()
    if "embeddings" in sql.lower()
    and not any(re.search(rf"\b{t}\b", sql.lower()) for t in _EMB_OTHER)
)

_DIM = 64


def _vec(seed: int, scale: float = 1.0) -> list[float]:
    import random

    r = random.Random(seed)
    return [round(r.uniform(-1, 1) * scale, 4) for _ in range(_DIM)]


def _emb_rows():
    """40 vectors with adversarial rows mixed in: a zero-norm vector
    (no direction — cosine undefined), a NULL embedding, a NULL label,
    an exact duplicate (distance ties), and a large-magnitude vector.
    The family's contract: non-INDEXABLE vectors (NULL or zero-norm —
    operators.similarity.indexable) are QUARANTINED from every cosine
    path, PQ additionally requires a non-NULL vector, and every oracle
    carries the matching WHERE clause. A vector with a NULL ELEMENT is
    also non-indexable (its dot product is NULL) — pinned separately
    below rather than mixed in, because the PQ encode contract only
    covers well-formed vectors."""
    rows = [(i, _vec(i), i % 4) for i in range(40)]
    rows[12] = (12, [0.0] * _DIM, 2)
    rows[13] = (13, None, 1)
    rows[14] = (14, _vec(14), None)
    rows[15] = (15, _vec(5), 3)
    rows[16] = (16, _vec(16, scale=1000.0), 0)
    return rows


@pytest.fixture(scope="module")
def adversarial_emb_sf(tmp_path_factory):
    dst = tmp_path_factory.mktemp("adversarial_emb_sf")
    for p in glob.glob(f"{SF_SMALL}/*.parquet"):
        if os.path.basename(p) != "embeddings.parquet":
            shutil.copy(p, dst / os.path.basename(p))
    schema = pq.read_table(f"{SF_SMALL}/embeddings.parquet").schema
    rows = _emb_rows()
    cols = {
        "vec_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "embedding": pa.array(
            [r[1] for r in rows], type=pa.list_(pa.float32())
        ),
        "label": pa.array([r[2] for r in rows], type=pa.int32()),
    }
    pq.write_table(
        pa.table([cols[f.name] for f in schema], schema=schema),
        str(dst / "embeddings.parquet"),
    )
    return str(dst)


def test_emb_only_list_is_substantial():
    assert len(EMB_ONLY) >= 20, EMB_ONLY


@pytest.mark.parametrize("name", EMB_ONLY)
def test_emb_query_matches_oracle_on_adversarial_corpus(
    spark, adversarial_emb_sf, name
):
    con = duck_connection(adversarial_emb_sf)
    try:
        problems = compare_query(
            spark, con, QUERIES[name], ORACLES[name], adversarial_emb_sf
        )
    finally:
        con.close()
    assert not problems, problems


# --------------------------------------------------------------------------
# Relational (TPC-H) surface: every query whose oracle touches only the
# TPC-H tables, against tables with adversarial rows APPENDED to the
# real sf0.001 rows (joins stay meaningful): NULL keys/dates/amounts/
# attributes, orphan foreign keys, negative amounts, zero and extreme
# prices, far-future dates, a NULL-regionkey nation. First sweep: 79 of
# 85 passed outright (the fixed-point/floor discipline is inherently
# NULL-safe); the 6 findings, fixed on both engines:
#   * NULLS-ordering in per-customer windows ordered by o_orderdate
#     (progression seq/lag/run-sum and the moving average) ->
#     asc_nulls_last, matching ANSI.
#   * approx_percentile_check emitted NULL where the oracle's literal
#     is TRUE for an all-NULL-price group (vacuous-true guard, which
#     also guards an exact-median-of-0 division).
#   * part_price_skyline: SQL three-valued logic let a NULL-axis part
#     sit vacuously on the frontier via NOT EXISTS while the fast plan
#     dropped it — dominance is undefined for NULL axes; both engines
#     now exclude them (pareto_frontier_2d filters up front).
#   * segment_zscore_pandas: floor(NaN).astype(int64) crashed the
#     Arrow worker on a NULL balance; NULL segments survived Spark's
#     NULL-key groupBy but not the oracle's equi-join (join semantics
#     win — both filtered).
#   * surrogate_keys: the Spark function's documented total-key NULL
#     encoding (chr(0), distinct from '') was not mirrored by the
#     oracle's concat_ws, which SKIPS NULLs (oracle now coalesces).

_REL_TABLES = ("orders", "lineitem", "customer", "supplier", "part",
               "nation", "region")
_NONREL = ("documents", "events", "embeddings")

REL_ONLY = sorted(
    name
    for name, sql in ORACLES.items()
    if not any(re.search(rf"\b{t}\b", sql.lower()) for t in _NONREL)
    and any(re.search(rf"\b{t}\b", sql.lower()) for t in _REL_TABLES)
)

_REL_TS = _dt.datetime
_REL_EXTRA = {
    "orders": [
        (900001, None, "O", 100.0, _REL_TS(1995, 6, 1), "1-URGENT"),
        (900002, 1, None, None, None, None),
        (900003, 888888, "F", -50.0, _REL_TS(1995, 6, 2), "5-LOW"),
        (900004, 2, "P", 1e7, _REL_TS(2055, 1, 1), "2-HIGH"),
        (900005, 3, "O", 0.0, _REL_TS(1995, 6, 3), "3-MEDIUM"),
    ],
    "lineitem": [
        (900001, 1, 1, 1, 5.0, 100.0, 0.05, 0.02, "N", "O",
         _REL_TS(1995, 6, 5)),
        (900002, 2, 2, 1, None, None, None, None, None, None, None),
        (777777, 3, 3, 1, 10.0, 200.0, 0.1, 0.0, "R", "F",
         _REL_TS(1995, 6, 6)),
        (900003, None, None, 2, -4.0, 80.0, 1.5, 0.0, "A", "F",
         _REL_TS(1995, 6, 7)),
        (900004, 4, 1, 1, 1.0, 0.0, 0.0, 0.0, "N", "O",
         _REL_TS(2055, 1, 2)),
    ],
    "customer": [
        (900101, None, None, None, None),
        (900102, "Customer#900102", 99, 100.0, "BUILDING"),
    ],
    "supplier": [(900201, None, None, None)],
    "part": [
        (900301, None, None, None, None, None),
        (900302, "adversarial part", "Brand#99", "SHINY STEEL", -12, -1.0),
    ],
    "nation": [(91, "NULLLAND", None)],
}


@pytest.fixture(scope="module")
def adversarial_rel_sf(tmp_path_factory):
    dst = tmp_path_factory.mktemp("adversarial_rel_sf")
    for p in glob.glob(f"{SF_SMALL}/*.parquet"):
        t = os.path.basename(p)[:-8]
        if t not in _REL_EXTRA:
            shutil.copy(p, dst / os.path.basename(p))
    for t, rows in _REL_EXTRA.items():
        base = pq.read_table(f"{SF_SMALL}/{t}.parquet")
        add = pa.table(
            {
                f.name: pa.array([r[i] for r in rows], type=f.type)
                for i, f in enumerate(base.schema)
            },
            schema=base.schema,
        )
        pq.write_table(
            pa.concat_tables([base, add]), str(dst / f"{t}.parquet")
        )
    return str(dst)


def test_rel_only_list_is_substantial():
    assert len(REL_ONLY) >= 75, REL_ONLY


@pytest.mark.parametrize("name", REL_ONLY)
def test_rel_query_matches_oracle_on_adversarial_corpus(
    spark, adversarial_rel_sf, name
):
    con = duck_connection(adversarial_rel_sf)
    try:
        problems = compare_query(
            spark, con, QUERIES[name], ORACLES[name], adversarial_rel_sf
        )
    finally:
        con.close()
    assert not problems, problems


def test_hybrid_rrf_on_combined_adversarial_corpus(
    spark, adversarial_sf, adversarial_emb_sf, tmp_path_factory
):
    """The one multi-surface query (documents + embeddings): swept on a
    dir combining BOTH adversarial tables — with this, every query
    except star_schema_summary (which reads the fixed reference raw
    files, not sf_dir — N/A by design) is adversarially contract-
    checked: 211 of 212. The fused ranking holds because Spark's side
    QUARANTINES non-indexable vectors while DuckDB ranks their NULL
    cosines last — the same top-10 either way."""
    dst = tmp_path_factory.mktemp("adversarial_hybrid_sf")
    for p in glob.glob(f"{SF_SMALL}/*.parquet"):
        shutil.copy(p, dst / os.path.basename(p))
    shutil.copy(
        os.path.join(adversarial_sf, "documents.parquet"),
        dst / "documents.parquet",
    )
    shutil.copy(
        os.path.join(adversarial_emb_sf, "embeddings.parquet"),
        dst / "embeddings.parquet",
    )
    con = duck_connection(str(dst))
    try:
        problems = compare_query(
            spark,
            con,
            QUERIES["hybrid_retrieval_rrf"],
            ORACLES["hybrid_retrieval_rrf"],
            str(dst),
        )
    finally:
        con.close()
    assert not problems, problems


def test_null_element_vector_is_not_indexable(spark):
    """A vector containing a NULL element has a NULL dot product, so
    indexable() excludes it — the cosine family quarantines it with
    the NULL/zero-norm rows instead of scoring garbage."""
    from pyspark.sql import functions as F

    from data_engineering_capstone_project_spark.operators.similarity import (
        indexable,
    )

    bad = _vec(99)
    bad[7] = None
    df = spark.createDataFrame(
        [(1, _vec(1)), (2, bad), (3, None), (4, [0.0] * _DIM)],
        "vec_id long, embedding array<float>",
    )
    kept = [
        r.vec_id
        for r in df.filter(indexable(F.col("embedding"))).collect()
    ]
    assert kept == [1]


def test_sign_lsh_short_vector_still_raises(spark):
    """The r8 quarantine (NULL vector -> NULL bucket) must not soften
    the corruption contract: a SHORT non-null vector still raises."""
    from pyspark.errors import SparkRuntimeException
    from pyspark.sql import functions as F

    from data_engineering_capstone_project_spark.operators.similarity import (
        sign_lsh_bucket,
    )

    df = spark.createDataFrame(
        [(1, [0.5, -0.5]), (2, None)], "vec_id long, embedding array<float>"
    )
    # NULL vector -> NULL bucket, no raise
    rows = {
        r.vec_id: r.bkt
        for r in df.filter(F.col("vec_id") == 2)
        .select(sign_lsh_bucket(F.col("embedding")).alias("bkt"))
        .selectExpr("2 AS vec_id", "bkt")
        .collect()
    }
    assert rows[2] is None
    with pytest.raises(SparkRuntimeException, match="needs >= 57"):
        df.filter(F.col("vec_id") == 1).select(
            sign_lsh_bucket(F.col("embedding")).alias("bkt")
        ).collect()


def test_percentile_bucket_clamps_before_int_cast(spark):
    """Regression for the r8 overflow: bucket = floor(value*4) must
    clamp to [0, 63] BEFORE the INT cast — value 1e9 (4e9 > INT_MAX)
    previously crashed under ANSI inside the cast."""
    from data_engineering_capstone_project_spark.streaming.serving import (
        value_histogram_increment,
    )

    df = spark.createDataFrame(
        [(1, 1e9), (2, -7.0), (3, None), (4, 0.4)],
        "user_id long, value double",
    )
    rows = {
        r.user_id: (r.bucket, r.n)
        for r in value_histogram_increment(df).collect()
    }
    assert rows[1] == (63, 1)      # clamped, no overflow
    assert rows[2] == (0, 1)       # negative clamps to 0
    assert rows[3] == (None, 1)    # NULL value stays a NULL bucket
    assert rows[4] == (1, 1)


def test_ab_test_report_fails_loudly_out_of_fixed_point_domain(
    spark, tmp_path_factory
):
    """ab_test_report's docstring declares its int64 fixed-point domain
    (per-user purchase total < ~3.03e9 fixed-point units) and promises
    ANSI fails LOUDLY past it, never silently — pin that: a 1e9-value
    purchase must raise, not return a wrong statistic."""
    from pyspark.errors import ArithmeticException

    dst = tmp_path_factory.mktemp("ab_overflow_sf")
    for p in glob.glob(f"{SF_SMALL}/*.parquet"):
        if os.path.basename(p) != "events.parquet":
            shutil.copy(p, dst / os.path.basename(p))
    schema = pq.read_table(f"{SF_SMALL}/events.parquet").schema
    rows = [
        (0, _TS(2024, 1, 1), 1, "purchase", 1e9, "{}"),
        (1, _TS(2024, 1, 1), 2, "purchase", 1.0, "{}"),
    ]
    cols = {
        "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], type=pa.int64()),
        "event_type": pa.array([r[3] for r in rows], type=pa.string()),
        "value": pa.array([r[4] for r in rows], type=pa.float64()),
        "props": pa.array([r[5] for r in rows], type=pa.string()),
    }
    pq.write_table(
        pa.table([cols[f.name] for f in schema], schema=schema),
        str(dst / "events.parquet"),
    )
    with pytest.raises(ArithmeticException, match="ARITHMETIC_OVERFLOW"):
        QUERIES["ab_test_report"](spark, str(dst)).collect()
