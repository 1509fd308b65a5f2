"""Unit tests for the scalar/parse/date/key layer (SURVEY.md §2.8-2.9)
on tiny in-memory frames, including the reference's own sample lines."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from data_engineering_capstone_project_spark.functions.dates import date_parts, sas_date
from data_engineering_capstone_project_spark.functions.keys import surrogate_key
from data_engineering_capstone_project_spark.functions.parsing import (
    parse_country_line,
    parse_gdp_usd,
    parse_iso_code,
    parse_port_of_entry_line,
)


def test_parse_country_line(spark):
    # Real lines from /root/reference internal_country_codes.txt
    df = spark.createDataFrame(
        [("236 =  'AFGHANISTAN'",), ("101 =  'ALBANIA'",), ("garbage",)],
        "value string",
    )
    cols = parse_country_line(F.col("value"))
    out = df.select(
        cols["int_country_code"].alias("code"), cols["int_country_name"].alias("name")
    ).collect()
    assert (out[0].code, out[0].name) == ("236", "AFGHANISTAN")
    assert (out[1].code, out[1].name) == ("101", "ALBANIA")
    # malformed input -> NULL (reference UDF would have crashed the job)
    assert (out[2].code, out[2].name) == (None, None)


def test_parse_iso_and_gdp(spark):
    df = spark.createDataFrame(
        [("AF / AFG", "20.65 Billion"), ("bad", None)], "iso string, gdp string"
    )
    out = df.select(
        parse_iso_code(F.col("iso")).alias("iso2"),
        parse_gdp_usd(F.col("gdp")).alias("gdp_num"),
    ).collect()
    assert (out[0].iso2, out[0].gdp_num) == ("AF", "20.65")
    assert (out[1].iso2, out[1].gdp_num) == (None, None)


def test_parse_port_of_entry(spark):
    df = spark.createDataFrame(
        [("'ALC'\t=\t'ALCAN, AK '",), ("'ANC'\t=\t'ANCHORAGE, AK'",)], "value string"
    )
    cols = parse_port_of_entry_line(F.col("value"))
    out = df.select(
        cols["port_of_entry_code"].alias("code"),
        cols["port_of_entry_name"].alias("name"),
    ).collect()
    assert (out[0].code, out[0].name) == ("ALC", "ALCAN, AK")
    assert (out[1].code, out[1].name) == ("ANC", "ANCHORAGE, AK")


def test_sas_date(spark):
    df = spark.createDataFrame(
        [(0.0,), (20574.0,), (None,)], "days double"
    )
    out = df.select(sas_date(F.col("days")).alias("d")).collect()
    assert out[0].d == datetime.date(1960, 1, 1)
    assert out[1].d == datetime.date(2016, 4, 30)  # typical arrdate value
    assert out[2].d is None


def test_date_parts(spark):
    df = spark.createDataFrame([(datetime.date(2016, 1, 1),)], "d date")
    parts = date_parts(F.col("d"))
    row = df.select(*[c.alias(k) for k, c in parts.items()]).collect()[0]
    assert (row.year, row.quarter, row.month, row.day) == (2016, 1, 1, 1)
    assert row.week == 53  # ISO week of 2016-01-01


def test_surrogate_key_deterministic_and_null_safe(spark):
    df = spark.createDataFrame(
        [("a", "bc"), ("ab", "c"), (None, "x"), ("", "x")], "k1 string, k2 string"
    )
    out = [r.sk for r in df.select(surrogate_key(F.col("k1"), F.col("k2")).alias("sk")).collect()]
    assert len(set(out)) == 4  # no collisions across boundary/null cases
    # deterministic across evaluations
    out2 = [r.sk for r in df.select(surrogate_key(F.col("k1"), F.col("k2")).alias("sk")).collect()]
    assert out == out2


def test_morton_interleave_matches_python_reference(spark):
    """Z-order key equivalence pin: the ENGINE's zorder_key (JVM
    shiftleft/bitwiseOR, the write-path builder) must equal the
    canonical bitwise interleave AND the arithmetic SQL twin the
    oracles use (checked via DuckDB) for the full 16x16 bucket grid —
    so the zone-map audit's two sides cannot drift apart."""
    import duckdb

    from data_engineering_capstone_project_spark.functions.layout import (
        morton_interleave_sql,
    )
    from data_engineering_capstone_project_spark.sources.writers import zorder_key

    grid = [(a, b) for a in range(16) for b in range(16)]

    def ref(a: int, b: int) -> int:
        code = 0
        for i in range(4):
            code |= ((a >> i) & 1) << (2 * i)
            code |= ((b >> i) & 1) << (2 * i + 1)
        return code

    df = spark.createDataFrame(grid, "a long, b long")
    got = {
        (r.a, r.b): r.m
        for r in df.select(
            "a", "b", zorder_key(["a", "b"], bits=4).alias("m")
        ).collect()
    }
    assert got == {(a, b): ref(a, b) for a, b in grid}
    # codes are a bijection on the grid (a clustering key must not
    # collapse distinct cells)
    assert len(set(got.values())) == 256

    sql = morton_interleave_sql("a", "b", 4)
    duck = duckdb.connect().execute(
        "SELECT a, b, " + sql + " AS m FROM (SELECT "
        "unnest(range(16)) AS a) CROSS JOIN (SELECT unnest(range(16)) AS b)"
    ).fetchall()
    assert {(a, b): m for a, b, m in duck} == got


def test_zorder_zone_map_prunes_both_dims(spark):
    """The audit's point: the z-order layout must skip most files on
    BOTH predicate dimensions while the arrival-order layout scans
    (almost) everything on each."""
    from tests.conftest import SF_SMALL

    from data_engineering_capstone_project_spark.plans.layout import zorder_zone_map

    rows = {r.layout: r for r in zorder_zone_map(spark, SF_SMALL).collect()}
    z, lin = rows["zorder"], rows["linear"]
    assert z.rows_total == lin.rows_total
    assert z.files_scan_custkey * 3 <= z.files_total
    assert z.files_scan_month * 3 <= z.files_total
    assert lin.files_scan_custkey * 2 >= lin.files_total
    assert lin.files_scan_month * 2 >= lin.files_total
