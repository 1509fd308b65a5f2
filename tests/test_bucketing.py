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

    def test_sidecar_disagreement_fails_loudly_in_fast_path(self, spark, src_dir):
        """r8 advice fix: catalog bucket metadata alone is not trusted
        on the fast path — if the files' _BUCKETS sidecar records a
        different count than the catalog declares (a concurrent
        process with a different pinned count rewrote the pair's
        files), the call must raise the two-writers RuntimeError, not
        serve CLUSTERED BY N metadata over files hashed into M."""
        from pathlib import Path

        import pytest as _pytest

        from data_engineering_capstone_project_spark.plans.relational import (
            _forget_validated_pairs,
            bucketed_orderkey_tables,
        )

        bucketed_orderkey_tables(spark, src_dir, n_buckets=16)
        names = self._pair_names(spark, src_dir)
        warehouse = Path(
            spark.conf.get("spark.sql.warehouse.dir").replace("file:", "")
        )
        victim = [n for n in names if "orders" in n][0]
        (warehouse / victim / "_BUCKETS").write_text("8")
        _forget_validated_pairs()  # the disagreement meets a fresh process
        with _pytest.raises(RuntimeError, match="sidecar records 8"):
            bucketed_orderkey_tables(spark, src_dir)
        # restore so the fixture's cleanup (and later tests) see a
        # consistent pair
        (warehouse / victim / "_BUCKETS").write_text("16")

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

    def test_sidecar_disagreement_fails_loudly_on_memo_hit(self, spark, src_dir):
        """r9 advice fix: the r8 memo fast path skipped the sidecar
        cross-check after the first validated call, so a concurrent
        process rewriting the pair with a different pinned count was
        served silently from the second call on. Memo hits must
        re-read the sidecars (plain file I/O) and raise the same
        two-writers RuntimeError — the loud-failure guarantee is
        every-call, not first-call-only."""
        from pathlib import Path

        import pytest as _pytest

        from data_engineering_capstone_project_spark.plans import relational

        relational._forget_validated_pairs()
        relational.bucketed_orderkey_tables(spark, src_dir, n_buckets=16)
        relational.bucketed_orderkey_tables(spark, src_dir)  # prime the memo
        names = self._pair_names(spark, src_dir)
        warehouse = Path(
            spark.conf.get("spark.sql.warehouse.dir").replace("file:", "")
        )
        victim = [n for n in names if "orders" in n][0]
        (warehouse / victim / "_BUCKETS").write_text("8")
        # NO _forget_validated_pairs() here: this call IS the memo hit.
        with _pytest.raises(RuntimeError, match="sidecar now records 8"):
            relational.bucketed_orderkey_tables(spark, src_dir)
        (warehouse / victim / "_BUCKETS").write_text("16")

    def test_vanished_sidecar_on_memo_hit_falls_through_and_rebuilds(
        self, spark, src_dir
    ):
        """A memo hit meeting a MISSING sidecar (partial dir behind a
        live catalog entry — e.g. a concurrent rewrite killed between
        rmtree and publish) must drop the memo and take the full path,
        which rebuilds the pair, rather than serving the dangling
        tables."""
        from pathlib import Path

        from data_engineering_capstone_project_spark.plans import relational

        relational._forget_validated_pairs()
        relational.bucketed_orderkey_tables(spark, src_dir, n_buckets=16)
        relational.bucketed_orderkey_tables(spark, src_dir)  # prime the memo
        names = self._pair_names(spark, src_dir)
        warehouse = Path(
            spark.conf.get("spark.sql.warehouse.dir").replace("file:", "")
        )
        victim = [n for n in names if "orders" in n][0]
        (warehouse / victim / "_BUCKETS").unlink()
        li, o = relational.bucketed_orderkey_tables(spark, src_dir)
        assert (warehouse / victim / "_BUCKETS").exists()  # pair rebuilt
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

        li1, _ = bucketed_orderkey_tables(spark, src_dir, n_buckets=16)
        n1 = li1.count()
        names = self._pair_names(spark, src_dir)
        warehouse = Path(
            spark.conf.get("spark.sql.warehouse.dir").replace("file:", "")
        )
        parts_before = {}
        for n in names:
            loc = warehouse / n
            assert (loc / "_BUCKETS").read_text() == "16"
            stash = loc.with_suffix(".stash")
            shutil.copytree(loc, stash)
            spark.sql(f"DROP TABLE {n}")  # managed drop deletes files
            stash.rename(loc)
            parts_before[n] = sorted(p.name for p in loc.glob("*.parquet"))

        li2, o2 = bucketed_orderkey_tables(spark, src_dir)
        assert li2.count() == n1
        assert self._pair_names(spark, src_dir) == names
        for n in names:
            assert _table_bucket_count(spark, n) == 16
            parts_after = sorted(
                p.name for p in (warehouse / n).glob("*.parquet")
            )
            assert parts_after == parts_before[n]  # adopted, not rewritten

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
