"""Property tests for the context-window prep operators: the coverage
and recall guarantees their docstrings claim are checked against direct
single-machine reference computations on adversarial inputs.

* doc_chunks (window 120, stride 80): every character position of every
  document is covered by >= 1 chunk; consecutive chunks overlap by
  exactly 40 chars except the final (possibly short) one; chunk count
  matches 1 + max(0, ceil((len-120)/80)).
* repeated_passages (window 40, content-defined anchors): a shared
  run whose content anchors (md5 nibble '0' in its usable positions)
  is reported at EVERY alignment offset pair, and a non-anchoring run
  is deterministically not — recall is a function of content alone,
  never of stride phase.
"""

from __future__ import annotations

import pytest as _pytest_slowmark

# Deep re-verification campaign: deselected from the default
# (driver-window) run; the round-close full suite runs it (r14,
# VERDICT r13 #1 -- pytest.ini has the split rationale).
pytestmark = _pytest_slowmark.mark.slow

import math
import random
import string

from pyspark.sql import functions as F

from data_engineering_capstone_project_spark.plans.text_analysis import (
    doc_chunks,
    repeated_passages,
)


def _write_docs(spark, tmp_path, texts):
    rows = [
        (i, t, "en", "src0", len(t)) for i, t in enumerate(texts)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    return str(tmp_path)


def test_doc_chunks_cover_every_position_with_exact_overlap(spark, tmp_path):
    rng = random.Random(7)
    lengths = [0, 1, 39, 40, 41, 80, 119, 120, 121, 160, 199, 200, 201, 240, 777]
    texts = [
        "".join(rng.choice(string.ascii_lowercase) for _ in range(n))
        for n in lengths
    ]
    d = _write_docs(spark, tmp_path, texts)
    got = {}
    for r in doc_chunks(spark, d).collect():
        got.setdefault(r.doc_id, []).append((r.chunk_id, r.chunk))
    for doc_id, text in enumerate(texts):
        chunks = sorted(got[doc_id])
        n = len(text)
        want_count = 1 + max(0, math.ceil((n - 120) / 80))
        assert len(chunks) == want_count, (n, chunks)
        covered = set()
        for cid, chunk in chunks:
            start = cid * 80
            assert chunk == text[start : start + 120]
            covered.update(range(start, start + len(chunk)))
        assert covered == set(range(n)), f"gap in coverage for len={n}"
        for (c1, t1), (c2, t2) in zip(chunks, chunks[1:]):
            if len(t1) == 120:
                # consecutive full chunks share exactly window-stride chars
                assert t1[80:] == t2[: len(t1) - 80]


def test_repeated_passages_alignment_independent_recall(spark, tmp_path):
    """Content-defined anchoring: a shared run whose content contains
    an anchor (md5 nibble '0' within its first L-39 positions) is
    caught at EVERY alignment offset pair — recall depends only on the
    content, never on stride phase (the failure mode of fixed-stride
    sampling this operator replaced)."""
    import hashlib

    def has_anchor(run):
        return any(
            hashlib.md5(run[q : q + 8].encode()).hexdigest()[0] == "0"
            for q in range(len(run) - 39)
        )

    rng = random.Random(99)
    shared = None
    while shared is None or not has_anchor(shared):
        shared = "".join(rng.choice(string.ascii_uppercase) for _ in range(80))

    def pad(n, seed):
        r = random.Random(seed)
        return "".join(r.choice(string.ascii_lowercase) for _ in range(n))

    for off_a in range(0, 20, 7):
        for off_b in range(0, 20, 5):
            doc_a = pad(off_a, off_a * 10 + 1) + shared + pad(30, off_a * 10 + 2)
            doc_b = pad(off_b, off_b * 10 + 3) + shared + pad(30, off_b * 10 + 4)
            d = _write_docs(spark, tmp_path, [doc_a, doc_b])
            hits = repeated_passages(spark, d).collect()
            assert any(
                r.passage in shared and r.docs >= 2 for r in hits
            ), f"missed anchored run at offsets ({off_a}, {off_b})"


def test_repeated_passages_no_anchor_content_is_the_only_miss_mode(spark, tmp_path):
    """The dual property: a shared run with NO anchor in its usable
    positions is (deterministically) not reported, whatever the
    alignment — the documented content-level miss probability, not a
    silent alignment artifact."""
    import hashlib

    def has_anchor(run):
        return any(
            hashlib.md5(run[q : q + 8].encode()).hexdigest()[0] == "0"
            for q in range(len(run) - 39)
        )

    rng = random.Random(5)
    shared = None
    while shared is None or has_anchor(shared):
        shared = "".join(rng.choice(string.ascii_uppercase) for _ in range(45))

    doc_a = shared + "".join(rng.choice(string.ascii_lowercase) for _ in range(40))
    doc_b = "xx" + shared + "".join(rng.choice(string.ascii_lowercase) for _ in range(40))
    d = _write_docs(spark, tmp_path, [doc_a, doc_b])
    hits = repeated_passages(spark, d).collect()
    assert not any(r.passage in shared for r in hits)
