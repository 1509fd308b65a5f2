"""Differential tests for the BPE encode query on ADVERSARIAL corpora.

The oracle gate runs every query on the shared testdata, which is rich
enough that all 3 training rounds always find a merge. These corpora
exercise the degenerate shapes the gate never hits — fewer learnable
merges than rounds (the unrolled oracle's empty-merge round must be a
pass-through, not a row-killer: found by this suite's design review and
fixed by LEFT JOIN ON TRUE in ``_bpe_oracle_round``), whitespace-only
and empty documents, NULL text, case folding, and the classic overlap
runs — each compared value-exactly against the same DuckDB oracle the
driver uses (tools/compare.compare_query). Since r10 every corpus\nruns through BOTH encode paths (window and Arrow one-pass apply), so\nthe production encoder faces the same degenerate shapes."""

from __future__ import annotations

import pytest as _pytest_slowmark

# Deep re-verification campaign: deselected from the default
# (driver-window) run; the round-close full suite runs it (r14,
# VERDICT r13 #1 -- pytest.ini has the split rationale).
pytestmark = _pytest_slowmark.mark.slow

import glob
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from data_engineering_capstone_project_spark.plans import QUERIES
from data_engineering_capstone_project_spark.plans.registry import ORACLES
from tests.conftest import SF_SMALL
from tools.compare import compare_query, duck_connection

CORPORA = {
    # all words single-char: ZERO learnable merges; every round's merge
    # row is empty and the oracle must pass symbols through unmerged
    "no_merges": ["a b c", "b c a", "c a b"],
    # exactly 2 learnable merges; round 3 is the empty pass-through
    "two_merges": ["ab ab", "ab", "ba"],
    # overlap parity: "aaaa" + merge (a,a) must encode [aa, aa]
    "overlap_runs": ["aaaa aaa aa a", "aaaaaa", "aa aa"],
    # case folding + interior/edge whitespace + a whitespace-only doc
    "mixed_case_ws": ["  A  aB\tb  ", "a\nB ab", " ", "AB ab Ab"],
    # empty string and NULL text documents drop from the output
    "empty_and_null": ["", None, "ab ab ab", "b a"],
    # a normal-looking corpus as the control
    "rich": ["the cat sat", "the cat", "sat on the mat", "the the the"],
}


@pytest.mark.parametrize(
    "qname",
    [
        "bpe_encode",
        "bpe_encode_arrow",
        "bpe_vocab_table",
        # r10: the decode round-trip, the frozen-vocab incremental
        # encode (doc 0 is the NEW split; tiny bases exercise the
        # frozen apply with EMPTY merge rounds), and the OOV-drift
        # serving fold (all-NULL source pins the null-key merge)
        "bpe_decode_roundtrip",
        "bpe_encode_incremental",
        "oov_drift_streamed_parity",
    ],
)
@pytest.mark.parametrize("name", sorted(CORPORA))
def test_bpe_encode_matches_oracle_on_adversarial_corpus(
    spark, tmp_path_factory, name, qname
):
    # Single-FILE parquet throughout (DuckDB's view-per-table reads a
    # plain file path, same as the real testdata): copy every
    # non-documents table verbatim, synthesize documents with pyarrow
    # preserving the real file's schema (non-text columns all NULL).
    texts = CORPORA[name]
    dst = tmp_path_factory.mktemp(f"bpe_diff_{qname}_{name}")
    for p in glob.glob(f"{SF_SMALL}/*.parquet"):
        if os.path.basename(p) != "documents.parquet":
            shutil.copy(p, dst / os.path.basename(p))
    schema = pq.read_table(f"{SF_SMALL}/documents.parquet").schema
    n = len(texts)
    arrays = []
    for field in schema:
        if field.name == "doc_id":
            arrays.append(pa.array(range(n), type=field.type))
        elif field.name == "text":
            arrays.append(pa.array(texts, type=field.type))
        else:
            arrays.append(pa.nulls(n, type=field.type))
    pq.write_table(
        pa.table(arrays, schema=schema), str(dst / "documents.parquet")
    )

    con = duck_connection(str(dst))
    try:
        problems = compare_query(
            spark, con, QUERIES[qname], ORACLES[qname], str(dst)
        )
    finally:
        con.close()
    assert not problems, problems
