"""Focused pins for the r13 vectorized Arrow kernels.

Three interpreted higher-order-expression hot paths moved to Arrow
kernels this round (embedding_projection's JL matmul, the PQ corpus
encode, IVF cell assignment). The DuckDB oracle gate already
value-checks them end-to-end on the driver datasets; these tests pin
the EDGE semantics the gate's data never exercises — NULL rows, NULL
elements, short vectors, NaN/Inf — against the contracts the r12
expression forms had (probed empirically before the swap), plus a
pure-Python independent re-derivation of the happy-path arithmetic.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from data_engineering_capstone_project_spark.operators.vector_index import (
    assign_cells,
)
from data_engineering_capstone_project_spark.plans.similarity_search import (
    _JL_SIGNS,
    _jl_project_batches,
)
from tests.conftest import SF_SMALL

_DIM = 64


def _proj_py(vec):
    """Independent JL projection: same definitions, pure Python."""
    fp = [math.floor(float(x) * 10000) for x in vec[:_DIM]]
    dims = []
    for j in range(16):
        dims.append(sum(fp[i] * _JL_SIGNS[i][j] for i in range(_DIM)))
    return ",".join(str(d) for d in dims)


def _emb_df(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _run_proj(df):
    return {
        r["vec_id"]: r["proj"]
        for r in df.select("vec_id", "embedding")
        .mapInArrow(_jl_project_batches, "vec_id bigint, proj string")
        .collect()
    }


def test_jl_projection_matches_python_reference(spark):
    vecs = [
        (1, [0.5] * _DIM),
        (2, [(-1) ** i * (i / 7.0) for i in range(_DIM)]),
        (3, [1000.0] * _DIM),  # large-magnitude (adversarial sweep row)
        (4, [0.0] * _DIM),  # zero vector still projects (all-zero dims)
    ]
    out = _run_proj(_emb_df(spark, vecs))
    for vid, v in vecs:
        assert out[vid] == _proj_py(v), vid


def test_jl_projection_edge_rows(spark):
    out = _run_proj(
        _emb_df(
            spark,
            [
                (1, None),  # NULL embedding -> NULL projection
                (2, [0.5] * 63 + [None]),  # NULL element -> "" (all dims NULL)
                (3, [None] + [0.5] * 63),
                (4, [0.5] * 70),  # longer than 64: first 64 used
            ],
        )
    )
    assert out[1] is None
    assert out[2] == ""
    assert out[3] == ""
    assert out[4] == _proj_py([0.5] * 70)


@pytest.mark.parametrize(
    "bad",
    [
        [0.5] * 50,  # short -> element_at OOB parity
        [],  # empty
        [0.5] * 63 + [float("inf")],  # overflow parity
        [3.0e38] * _DIM,  # term overflows int64
    ],
)
def test_jl_projection_raises_like_ansi(spark, bad):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PythonException

    with pytest.raises((PythonException, Py4JJavaError)):
        _run_proj(_emb_df(spark, [(1, bad)]))


def test_jl_projection_nan_casts_to_zero(spark):
    # ANSI cast(NaN as long) = 0 in the expression form (probed r13).
    v = [0.5] * 63 + [float("nan")]
    out = _run_proj(_emb_df(spark, [(1, v)]))
    expected = _proj_py([0.5] * 63 + [0.0])
    assert out[1] == expected


def test_pq_encode_matches_python_reference(spark):
    from data_engineering_capstone_project_spark.plans.similarity_search import (
        _PQ_SUBDIM,
        _PQ_SUBSPACES,
        _cached_label_centroids,
        _pq_corpus_codes,
    )

    by_label = _cached_label_centroids(spark, SF_SMALL)
    labels = sorted(by_label)
    got = {
        (r["vec_id"], r["s"]): r["code"]
        for r in _pq_corpus_codes(spark, SF_SMALL).collect()
    }
    emb = {
        r["vec_id"]: r["embedding"]
        for r in spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    }
    checked = 0
    for vid, v in list(emb.items())[:10]:
        if v is None:
            continue
        for s in range(_PQ_SUBSPACES):
            lo = s * _PQ_SUBDIM
            best = None
            for lab in labels:
                d = sum(
                    math.floor(
                        (float(x) - by_label[lab][lo + k])
                        * (float(x) - by_label[lab][lo + k])
                        * 10000000
                    )
                    for k, x in enumerate(v[lo : lo + _PQ_SUBDIM])
                )
                if best is None or (d, lab) < best:
                    best = (d, lab)
            assert got[(vid, s)] == best[1], (vid, s)
            checked += 1
    assert checked > 0


def test_pq_encode_raises_on_malformed_vectors(spark):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PythonException

    from data_engineering_capstone_project_spark.plans.similarity_search import (
        _pq_corpus_codes,
    )

    short = _emb_df(spark, [(1, [0.5] * 10)])
    with pytest.raises((PythonException, Py4JJavaError)):
        _pq_corpus_codes(spark, SF_SMALL, source=short).collect()
    nullelem = _emb_df(spark, [(1, [0.5] * 63 + [None])])
    with pytest.raises((PythonException, Py4JJavaError)):
        _pq_corpus_codes(spark, SF_SMALL, source=nullelem).collect()


def test_assign_cells_matches_python_reference(spark):
    cents = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [0.0, 1.0, 0.0, 0.0]),
            (2, [0.5, 0.5, 0.0, 0.0]),
        ],
        "cell_id int, centroid array<double>",
    )
    rows = [
        (1, [1.0, 0.1, 0.0, 0.0]),
        (2, [0.1, 1.0, 0.0, 0.0]),
        (3, [0.6, 0.6, 0.0, 0.0]),
        (4, None),  # quarantined
        (5, [0.0, 0.0, 0.0, 0.0]),  # zero norm: quarantined
        (6, [float("nan"), 1.0, 1.0, 1.0]),  # NaN dot: quarantined
    ]
    df = _emb_df(spark, rows).withColumnRenamed("embedding", "v")

    def expected_cell(v):
        cl = {
            0: [1.0, 0.0, 0.0, 0.0],
            1: [0.0, 1.0, 0.0, 0.0],
            2: [0.5, 0.5, 0.0, 0.0],
        }
        vnorm = math.sqrt(sum(float(x) * float(x) for x in v))
        best = None
        for cid in sorted(cl):
            cv = cl[cid]
            cnorm = math.sqrt(sum(x * x for x in cv))
            dotc = sum(float(x) * m for x, m in zip(v, cv))
            key = (-math.floor(dotc / (vnorm * cnorm) * 10000), cid)
            if best is None or key < best:
                best = key
        return best[1]

    out = {
        r["vec_id"]: r["cell_id"]
        for r in assign_cells(df, cents, vec_col="v").collect()
    }
    assert set(out) == {1, 2, 3}  # 4/5/6 quarantined
    for vid, v in rows[:3]:
        assert out[vid] == expected_cell(v), vid


def test_assign_cells_probe_rank_shape(spark):
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [1.0, 1.0])],
        "cell_id int, centroid array<double>",
    )
    df = _emb_df(spark, [(1, [1.0, 0.2])]).withColumnRenamed(
        "embedding", "v"
    )
    rows = assign_cells(
        df, cents, vec_col="v", n_probe=2, with_rank=True
    ).collect()
    assert len(rows) == 2
    assert [r["probe_rank"] for r in rows] == [1, 2]
    # nearest probed cell first
    assert rows[0]["cell_id"] != rows[1]["cell_id"]


def test_assign_cells_preserves_passthrough_columns(spark):
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0])], "cell_id int, centroid array<double>"
    )
    df = spark.createDataFrame(
        [(7, "tag-a", [1.0, 0.5])], "vec_id long, tag string, v array<float>"
    )
    row = assign_cells(df, cents, vec_col="v").collect()[0]
    assert row["vec_id"] == 7 and row["tag"] == "tag-a"
    assert row["cell_id"] == 0
    assert [round(float(x), 3) for x in row["v"]] == [1.0, 0.5]
