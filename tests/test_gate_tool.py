"""tools/gate_sf01.py — the machine-readable sf0.1 gate artifact (r12,
VERDICT r11 #3): per-query rows in the driver's CORRECTNESS shape plus
seconds, under a code_rev-stamped meta header. These tests pin the row
semantics (green, red-by-value, red-by-error, rows-only degradation)
and the round derivation, without running the ~30-min full gate."""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import functions as F

from tools.compare import duck_connection
from tools.gate_sf01 import _current_round, gate_row

SF_SMALL = "/root/testdata/sf0.001"


def _region_count(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/region.parquet").agg(
        F.count("*").cast("bigint").alias("n")
    )


def test_gate_row_green(spark):
    con = duck_connection(SF_SMALL)
    row = gate_row(
        spark,
        con,
        _region_count,
        "SELECT CAST(count(*) AS BIGINT) AS n FROM region",
        SF_SMALL,
    )
    assert row["err"] is None
    assert row["rows_match"] and row["schema_match"] and row["hash_match"]
    assert row["spark_rows"] == row["oracle_rows"] == 1
    assert row["seconds"] >= 0


def test_gate_row_value_mismatch_is_red_not_error(spark):
    con = duck_connection(SF_SMALL)
    row = gate_row(
        spark,
        con,
        _region_count,
        "SELECT CAST(count(*) + 1 AS BIGINT) AS n FROM region",
        SF_SMALL,
    )
    assert row["err"] is None
    assert row["rows_match"] and row["schema_match"]
    assert row["hash_match"] is False


def test_gate_row_error_is_recorded_not_fatal(spark):
    con = duck_connection(SF_SMALL)

    def boom(spark, sf_dir):
        raise RuntimeError("synthetic query failure")

    row = gate_row(spark, con, boom, "SELECT 1 AS n", SF_SMALL)
    assert row["err"] and "synthetic query failure" in row["err"]
    assert row["hash_match"] is None


def test_gate_row_rows_only_degrades_with_null_flags(spark):
    """No oracle -> the driver's weaker rows-only check: spark_rows
    recorded, every match flag null so it can never read as a
    value-verified pass."""
    con = duck_connection(SF_SMALL)
    row = gate_row(spark, con, _region_count, None, SF_SMALL)
    assert row["err"] is None and row["spark_rows"] == 1
    assert row["rows_match"] is None
    assert row["schema_match"] is None
    assert row["hash_match"] is None


def test_current_round_derivation(tmp_path):
    """Same derivation as the scale-probe ledger: newest CORRECTNESS
    artifact + 1, double-digit rounds included; 1 on a bare repo."""
    assert _current_round(tmp_path) == 1
    (tmp_path / "CORRECTNESS_r09.json").write_text("{}")
    (tmp_path / "CORRECTNESS_r11.json").write_text("{}")
    assert _current_round(tmp_path) == 12
    repo = Path(__file__).resolve().parent.parent
    newest = max(
        int(p.stem.removeprefix("CORRECTNESS_r").lstrip("0") or 0)
        for p in repo.glob("CORRECTNESS_r*.json")
    )
    assert _current_round(repo) == newest + 1


def test_gate_artifact_shape_matches_correctness_rows():
    """The per-query row keys are the driver's CORRECTNESS keys plus
    seconds — pinned against the real r11 artifact so a driver-side
    shape change surfaces here."""
    repo = Path(__file__).resolve().parent.parent
    rows = json.loads((repo / "CORRECTNESS_r11.json").read_text())
    driver_keys = set(next(iter(rows.values())))
    from tools.gate_sf01 import gate_row as _gr  # noqa: F401

    expected = driver_keys | {"seconds"}
    # the row constructor's static key set
    import inspect

    src = inspect.getsource(_gr)
    for k in expected:
        assert f'"{k}"' in src, f"gate row missing driver key {k}"
