"""Adversarial-corpus contract: every documents-only query matches its
DuckDB oracle VALUE-EXACTLY on a corpus of edge-case documents.

The r7 empty/all-NULL audit covered empty tables and all-NULL columns;
this r8 axis covers the shapes in between — REAL rows with degenerate
text (empty string, whitespace-only, NULL text among valid docs, case
folding, overlap runs, punctuation/digit soup, exact + near
duplicates) and realistic metadata. The sweep found and pinned two bug
classes on first run:

* ANSI DIVIDE_BY_ZERO in every quality-score consumer (curation
  funnel, doc_quality, per-lang thresholds, weighted sampling, token
  budget, dedup-canonical pick) — an empty-string document crashed the
  WHOLE query. Fixed with greatest(length, 1) denominators on both
  engines (ratio 0 for '' is the contract).
* NULL-text single-cell divergences: Spark size(NULL array) vs DuckDB
  len on the shingle count (doc_repetition), and concat over an empty
  block list ('') vs NULL (span_corruption input_text).

The query list is DERIVED (every registered oracle that references the
documents view and no other table), so new documents-surface queries
are swept automatically.
"""

from __future__ import annotations

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
