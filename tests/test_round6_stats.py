"""Statistical sanity for the round-6 final-batch queries, beyond
oracle parity (which proves engine-equivalence, not statistical
meaning): the Poisson-bootstrap SE must approximate the analytic SE,
and the column-attributed snapshot diff must attribute exactly."""

from __future__ import annotations

import math

from tests.conftest import SF_ORACLE

from data_engineering_capstone_project_spark.plans.relational import (
    bootstrap_revenue_ci,
    snapshot_diff_columns,
)


def test_bootstrap_se_tracks_analytic_se(spark):
    """The whole point of the Poisson bootstrap is that its SE
    estimates sigma/sqrt(n); with B=16 replicates the estimate is
    coarse (chi-square with 15 dof -> ~2x band), so pin a generous
    but meaningful bracket around the exact analytic SE."""
    row = bootstrap_revenue_ci(spark, SF_ORACLE).collect()[0]
    import duckdb

    exact = duckdb.connect().execute(
        f"SELECT stddev_samp(o_totalprice) / sqrt(count(*)) "
        f"FROM '{SF_ORACLE}/orders.parquet'"
    ).fetchone()[0]
    assert row.replicas == 16
    assert exact / 2 <= row.boot_se <= exact * 2
    # replicate means bracket the full mean
    assert row.min_rep_mean_c <= row.mean_price * 100 <= row.max_rep_mean_c


def test_snapshot_diff_columns_attributes_exactly(spark):
    """Per-column attribution: the price stripe (%100==7) and status
    stripe (%100==23) must land on their own columns ONLY, the
    untouched column must report zero, and insert/delete counts must
    equal their stripes' sizes (the %100==13 stripe deleted, %100==21
    re-inserted above the key shift)."""
    import duckdb

    got = {
        r.change: r.n
        for r in snapshot_diff_columns(spark, SF_ORACLE).collect()
    }
    con = duckdb.connect()
    stripe = {
        m: con.execute(
            f"SELECT count(*) FROM '{SF_ORACLE}/orders.parquet' "
            f"WHERE o_orderkey % 100 = {m}"
        ).fetchone()[0]
        for m in (7, 13, 21, 23)
    }
    assert got["col:o_totalprice"] == stripe[7]
    assert got["col:o_orderstatus"] == stripe[23]
    assert got["col:o_orderpriority"] == 0
    assert got["rows_deleted"] == stripe[13]
    assert got["rows_inserted"] == stripe[21]
