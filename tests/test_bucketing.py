"""Bucketed-table writes must eliminate the join shuffle: the physical
plan for a join of two tables bucketed on the join key (same bucket
count) contains no Exchange. This is the property that matters at
100 TB — correctness of the join itself is covered elsewhere."""

import pytest

from data_engineering_capstone_project_spark.sources.writers import (
    write_bucketed_table,
)


@pytest.fixture(scope="module")
def bucketed_pair(spark):
    # Managed tables land in the session's spark-warehouse dir
    # (spark.sql.warehouse.dir is static config, unchangeable here);
    # the fixture drops them afterwards.
    orders = spark.createDataFrame(
        [(i, i % 50, float(i)) for i in range(1000)],
        "o_orderkey long, o_custkey long, o_totalprice double",
    )
    lines = spark.createDataFrame(
        [(i % 1000, j, float(i * j)) for i in range(2000) for j in (1, 2)],
        "l_orderkey long, l_linenumber int, l_extendedprice double",
    )
    write_bucketed_table(orders, "b_orders", ["o_orderkey"], 8)
    write_bucketed_table(
        lines, "b_lines", ["l_orderkey"], 8, sort_cols=["l_orderkey"]
    )
    yield spark.table("b_orders"), spark.table("b_lines")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lines")


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    orders, lines = bucketed_pair
    # Disable auto-broadcast so the test exercises the shuffle path the
    # bucketing is supposed to remove.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = orders.join(
            lines, orders.o_orderkey == lines.l_orderkey
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_join_result_correct(spark, bucketed_pair):
    orders, lines = bucketed_pair
    joined = orders.join(lines, orders.o_orderkey == lines.l_orderkey)
    # every order key 0..999 appears twice in lines (i and i+1000, j=1,2)
    assert joined.count() == 4000


def test_bucketed_groupby_has_no_exchange(spark, bucketed_pair):
    orders, _ = bucketed_pair
    agg = orders.groupBy("o_orderkey").count()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


class TestBucketedPairLifecycle:
    """bucketed_orderkey_tables must (a) reuse a fresh pair, (b) detect
    regenerated source parquet via the content fingerprint instead of
    serving stale buckets, (c) rebuild the PAIR atomically so bucket
    counts can never diverge between the two tables."""

    @pytest.fixture()
    def src_dir(self, tmp_path):
        import shutil
        from tests.conftest import SF_SMALL

        for t in ("lineitem", "orders"):
            shutil.copy(f"{SF_SMALL}/{t}.parquet", tmp_path / f"{t}.parquet")
        yield str(tmp_path)
        # drop whatever tables the tests created for this dir
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        import re

        tag = re.sub(r"[^0-9A-Za-z]+", "_", str(tmp_path)).strip("_")
        for t in spark.catalog.listTables():
            if tag in t.name:
                spark.sql(f"DROP TABLE IF EXISTS {t.name}")

    @staticmethod
    def _pair_names(spark, src_dir):
        import re

        tag = re.sub(r"[^0-9A-Za-z]+", "_", src_dir).strip("_")
        return sorted(t.name for t in spark.catalog.listTables() if tag in t.name)

    def test_reuse_then_invalidate_on_source_change(self, spark, src_dir):
        import os

        from data_engineering_capstone_project_spark.plans.relational import (
            _table_bucket_count,
            bucketed_orderkey_tables,
        )

        li1, _ = bucketed_orderkey_tables(spark, src_dir)
        names1 = self._pair_names(spark, src_dir)
        assert len(names1) == 2
        n1 = li1.count()

        # unchanged source -> same catalog tables, nothing rebuilt
        bucketed_orderkey_tables(spark, src_dir)
        assert self._pair_names(spark, src_dir) == names1

        # regenerate the source (same path, new mtime) -> new pair, old dropped
        os.utime(f"{src_dir}/lineitem.parquet")
        li2, o2 = bucketed_orderkey_tables(spark, src_dir)
        names2 = self._pair_names(spark, src_dir)
        assert names2 != names1 and len(names2) == 2
        assert li2.count() == n1
        assert _table_bucket_count(
            spark, [n for n in names2 if "lineitem" in n][0]
        ) == _table_bucket_count(spark, [n for n in names2 if "orders" in n][0])

    def test_partial_pair_rebuilt_with_equal_buckets(self, spark, src_dir):
        from data_engineering_capstone_project_spark.plans.relational import (
            _table_bucket_count,
            bucketed_orderkey_tables,
        )

        bucketed_orderkey_tables(spark, src_dir, n_buckets=16)
        names = self._pair_names(spark, src_dir)
        spark.sql(f"DROP TABLE {[n for n in names if 'orders' in n][0]}")
        # caller now asks for a different count while one table survives
        bucketed_orderkey_tables(spark, src_dir, n_buckets=32)
        counts = {
            n: _table_bucket_count(spark, n) for n in self._pair_names(spark, src_dir)
        }
        assert set(counts.values()) == {32}, counts

    def test_explicit_bucket_count_change_rebuilds_pair(self, spark, src_dir):
        from data_engineering_capstone_project_spark.plans.relational import (
            _table_bucket_count,
            bucketed_orderkey_tables,
        )

        bucketed_orderkey_tables(spark, src_dir, n_buckets=16)
        bucketed_orderkey_tables(spark, src_dir, n_buckets=32)
        counts = [
            _table_bucket_count(spark, n) for n in self._pair_names(spark, src_dir)
        ]
        assert counts == [32, 32], counts

    def test_diverged_existing_pair_detected_and_rebuilt(self, spark, src_dir):
        """A crash between the pair's two writes can leave BOTH tables
        present with unequal bucket counts; the next call must detect
        the divergence (not just table existence) and rebuild the pair."""
        from data_engineering_capstone_project_spark.plans.relational import (
            _table_bucket_count,
            bucketed_orderkey_tables,
        )
        from data_engineering_capstone_project_spark.sources.writers import (
            write_bucketed_table,
        )

        bucketed_orderkey_tables(spark, src_dir, n_buckets=16)
        names = self._pair_names(spark, src_dir)
        victim = [n for n in names if "orders" in n][0]
        # simulate the crash artifact: same catalog name, different count
        src = spark.read.parquet(f"{src_dir}/orders.parquet")
        spark.sql(f"DROP TABLE {victim}")
        import shutil
        from pathlib import Path

        loc = Path(
            spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse").replace(
                "file:", ""
            )
        ) / victim
        if loc.exists():
            shutil.rmtree(loc)
        write_bucketed_table(src, victim, ["o_orderkey"], 8, sort_cols=["o_orderkey"])
        assert _table_bucket_count(spark, victim) == 8  # diverged pair

        # The crash artifact is what a FRESH process would meet; this
        # process's validation memo (r8) must be cleared to model that.
        from data_engineering_capstone_project_spark.plans.relational import (
            _forget_validated_pairs,
        )

        _forget_validated_pairs()
        bucketed_orderkey_tables(spark, src_dir)  # no explicit count
        counts = {
            n: _table_bucket_count(spark, n)
            for n in self._pair_names(spark, src_dir)
        }
        assert len(set(counts.values())) == 1, counts

    @staticmethod
    def _store(spark, src_dir):
        import re
        from pathlib import Path

        from data_engineering_capstone_project_spark.plans.relational import (
            _source_fingerprint,
        )

        tag = re.sub(r"[^0-9A-Za-z]+", "_", src_dir).strip("_")
        fp = _source_fingerprint(src_dir, ("lineitem", "orders"))
        warehouse = Path(
            spark.conf.get("spark.sql.warehouse.dir").replace("file:", "")
        )
        return warehouse / f"bktstore_{tag}_{fp}"

    def test_concurrent_different_pins_converge_without_error(
        self, spark, src_dir
    ):
        """r13 (VERDICT r12 #3): two writers pinning DIFFERENT counts
        was the old design's loud two-writers RuntimeError — the one
        scope line left open. Versioned replacement closes it: each
        pin lands in its own immutable version, every call succeeds
        and serves exactly its pinned count, and CURRENT converges to
        the newest publish instead of anyone failing."""
        from data_engineering_capstone_project_spark.plans.relational import (
            _forget_validated_pairs,
            _table_bucket_count,
            bucketed_orderkey_tables,
        )
        from data_engineering_capstone_project_spark.sources.writers import (
            resolve_current,
        )

        bucketed_orderkey_tables(spark, src_dir, n_buckets=16)
        _forget_validated_pairs()  # writer B = a fresh process
        bucketed_orderkey_tables(spark, src_dir, n_buckets=32)
        _forget_validated_pairs()  # writer A again, still pinned 16
        li, orders = bucketed_orderkey_tables(spark, src_dir, n_buckets=16)
        assert li.count() > 0 and orders.count() > 0
        counts = {
            n: _table_bucket_count(spark, n)
            for n in self._pair_names(spark, src_dir)
        }
        assert set(counts.values()) == {16}, counts
        store = self._store(spark, src_dir)
        vdir, n = resolve_current(store)
        assert n == 3, "each pin must land its own version"
        assert (vdir / "_BUCKETS").read_text() == "16"

    def test_memoized_repeat_call_skips_describe_jobs(self, spark, src_dir):
        """r8 VERDICT #3: after one validated call, repeat calls for the
        same (warehouse, tag, fingerprint) must not re-run DESCRIBE
        TABLE EXTENDED (a Spark job per table per call) — the memo
        serves the pair directly. Pinning the same count as validated
        also hits; a different pin falls through (covered by
        test_explicit_bucket_count_change_rebuilds_pair)."""
        from unittest import mock

        from data_engineering_capstone_project_spark.plans import relational

        relational._forget_validated_pairs()
        li1, _ = relational.bucketed_orderkey_tables(spark, src_dir, n_buckets=16)
        with mock.patch.object(
            relational,
            "_table_bucket_count",
            side_effect=AssertionError("DESCRIBE ran on a memoized call"),
        ):
            li2, o2 = relational.bucketed_orderkey_tables(spark, src_dir)
            li3, _ = relational.bucketed_orderkey_tables(
                spark, src_dir, n_buckets=16
            )
        assert li2.count() == li1.count() == li3.count()

    def test_memo_hit_follows_replaced_current(self, spark, src_dir):
        """The r9-r12 every-call sidecar cross-check existed because
        flat-layout files could be REWRITTEN under a memoized serve.
        Version dirs are immutable, so that hazard is gone — but the
        memo must still follow the CURRENT pointer: when a concurrent
        process REPLACES the pair (new version, e.g. a data refresh at
        the same count), the next memo-hit call must serve the new
        version's tables, not the memoized old registration."""
        import shutil

        from data_engineering_capstone_project_spark.plans import relational
        from data_engineering_capstone_project_spark.sources.writers import (
            resolve_current,
            versioned_replace,
        )

        relational._forget_validated_pairs()
        relational.bucketed_orderkey_tables(spark, src_dir, n_buckets=16)
        relational.bucketed_orderkey_tables(spark, src_dir)  # prime the memo
        store = self._store(spark, src_dir)
        v1, n1 = resolve_current(store)
        assert n1 == 1

        # a "foreign process" refreshes the pair: same count, new version
        def refresh(attempt: str) -> None:
            shutil.copytree(v1, attempt)

        _, n2 = versioned_replace(store, refresh)
        assert n2 == 2
        # NO _forget_validated_pairs(): this call IS the memo hit.
        li, orders = relational.bucketed_orderkey_tables(spark, src_dir)
        names = self._pair_names(spark, src_dir)
        assert all(n.endswith("_v2") for n in names), names
        assert li.count() > 0 and orders.count() > 0

    def test_corrupt_current_version_rebuilds_fresh_version(
        self, spark, src_dir
    ):
        """A CURRENT version whose _BUCKETS sidecar is missing (an
        externally-damaged store — under the protocol itself this is
        unreachable, published versions are immutable and complete)
        must never be served: the next call rebuilds into a FRESH
        version and repoints CURRENT, rather than serving a pair whose
        real bucket count is unknowable."""
        from data_engineering_capstone_project_spark.plans import relational
        from data_engineering_capstone_project_spark.sources.writers import (
            resolve_current,
        )

        relational._forget_validated_pairs()
        relational.bucketed_orderkey_tables(spark, src_dir, n_buckets=16)
        store = self._store(spark, src_dir)
        v1, n1 = resolve_current(store)
        assert n1 == 1
        (v1 / "_BUCKETS").unlink()
        relational._forget_validated_pairs()  # damage meets a fresh process
        li, o = relational.bucketed_orderkey_tables(spark, src_dir)
        v2, n2 = resolve_current(store)
        assert n2 == 2 and (v2 / "_BUCKETS").exists()
        counts = {
            n: relational._table_bucket_count(spark, n)
            for n in self._pair_names(spark, src_dir)
        }
        assert len(set(counts.values())) == 1, counts
        assert li.count() > 0 and o.count() > 0

    def test_complete_pair_adopted_not_rebuilt(self, spark, src_dir):
        """A fresh catalog (second process) meeting a COMPLETE pair of
        fingerprint dirs must ADOPT them as external tables, declaring
        the _BUCKETS sidecar count — same part files, no rewrite, and
        the orderkey join still plans with zero Exchange."""
        import shutil
        from pathlib import Path

        from data_engineering_capstone_project_spark.plans.relational import (
            _table_bucket_count,
            bucketed_orderkey_tables,
        )

        from data_engineering_capstone_project_spark.plans.relational import (
            _forget_validated_pairs,
        )
        from data_engineering_capstone_project_spark.sources.writers import (
            resolve_current,
        )

        li1, _ = bucketed_orderkey_tables(spark, src_dir, n_buckets=16)
        n1 = li1.count()
        names = self._pair_names(spark, src_dir)
        store = self._store(spark, src_dir)
        vdir, ver = resolve_current(store)
        assert (vdir / "_BUCKETS").read_text() == "16"
        parts_before = {
            tbl: sorted(p.name for p in (vdir / tbl).glob("*.parquet"))
            for tbl in ("lineitem", "orders")
        }
        # a fresh catalog: registrations are external since r13, so a
        # plain DROP models the second process (files untouched)
        for n in names:
            spark.sql(f"DROP TABLE {n}")
        _forget_validated_pairs()

        li2, o2 = bucketed_orderkey_tables(spark, src_dir)
        assert li2.count() == n1
        assert self._pair_names(spark, src_dir) == names
        assert resolve_current(store)[1] == ver, "adoption must not rebuild"
        for n in names:
            assert _table_bucket_count(spark, n) == 16
        for tbl in ("lineitem", "orders"):
            parts_after = sorted(
                p.name for p in (vdir / tbl).glob("*.parquet")
            )
            assert parts_after == parts_before[tbl]  # adopted, not rewritten

        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = li2.join(o2, li2.l_orderkey == o2.o_orderkey)
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan
            assert j.count() > 0
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

        # a pinned DIFFERENT count must still rebuild the adopted pair
        # (rebuild rewrites managed tables, so the fixture's DROP cleans up)
        bucketed_orderkey_tables(spark, src_dir, n_buckets=32)
        for n in self._pair_names(spark, src_dir):
            assert _table_bucket_count(spark, n) == 32

    def test_sibling_tag_tables_survive_stale_cleanup(self, spark, src_dir, tmp_path_factory):
        """The stale-variant cleanup must match the fingerprint suffix
        exactly: a sibling sf_dir whose sanitized tag EXTENDS this tag
        (…/src vs …/src_big) keeps its live pair."""
        import shutil
        from pathlib import Path

        from data_engineering_capstone_project_spark.plans.relational import (
            bucketed_orderkey_tables,
        )
        from tests.conftest import SF_SMALL

        sib = Path(f"{src_dir}_big")
        sib.mkdir()
        for t in ("lineitem", "orders"):
            shutil.copy(f"{SF_SMALL}/{t}.parquet", sib / f"{t}.parquet")
        try:
            bucketed_orderkey_tables(spark, str(sib))
            sib_names = set(self._pair_names(spark, str(sib)))
            assert len(sib_names) == 2

            # force a rebuild in the SHORT-tag dir; sibling must survive
            import os

            bucketed_orderkey_tables(spark, src_dir)
            os.utime(f"{src_dir}/lineitem.parquet")
            bucketed_orderkey_tables(spark, src_dir)
            still = {t.name for t in spark.catalog.listTables()}
            assert sib_names <= still
        finally:
            for n in self._pair_names(spark, str(sib)):
                spark.sql(f"DROP TABLE IF EXISTS {n}")
