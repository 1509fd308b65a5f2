"""Relational query surface (SURVEY.md §2.3-2.8, §2.10 and README
questions #1-#4 re-expressed over the driver's TPC-H-ish star schema).

Mapping to the reference's declared analytics (reference README.md:7-11):
  #1 visitations for a selected year  -> visits_by_year (filter+count)
  #2 visits by world region           -> visits_by_region (fact->dim joins)
  #3 top-5 overseas countries YTD     -> top5_nations_ytd (range + top-k)
  #4 top-5 countries by month         -> top_nations_by_month (window rank)
plus the general ad-hoc surface (README.md:65) = Spark SQL itself.

Scale posture: every dim join broadcasts (region 5 / nation 25 /
customer 1.5k rows per sf -- at 100 TB the facts grow, dims don't);
aggregations are partial+final hash aggs with no extra shuffles beyond
the group keys; all filters are plain parquet-pushdown predicates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.window import Window

from data_engineering_capstone_project_spark.functions.dates import date_parts, sas_date
from data_engineering_capstone_project_spark.functions.keys import surrogate_key
from data_engineering_capstone_project_spark.plans.registry import (
    cached_rowcount,
    events_table,
    file_signature,
    query,
    scoped_persist,
    table,
)

# {(sf_dir, region_name, source signatures) -> {n_nationkey: n_name}}
# — same memo discipline as registry.cached_rowcount: keyed on the
# actual file content of the two dim tables, so a regenerated parquet
# at the same path re-collects, while repeated plan builds are free.
_REGION_NATIONS: dict[tuple, dict[int, str]] = {}


def _region_nation_map(
    spark: SparkSession, sf_dir: str, region_name: str
) -> dict[int, str]:
    """The nations of one region as a plan-build-time literal
    {n_nationkey: n_name} (guide §8 "decide with small rows"): region
    and nation are BOUNDED dims (5/25 rows at every scale), so
    collapsing them to literals lets fact prefilters stay plain
    ``isin`` predicates on RAW tables. That matters because Catalyst's
    non-CBO join-output size estimate is the PRODUCT of the input
    sizes: a customer/supplier frame that is itself a join can never
    be chosen as a broadcast build side even when it is tiny, while
    the same frame as raw-scan+isin keeps its honest file-size stats
    and broadcasts exactly while it fits. The collect is one 5-row
    driver job, memoized on the dims' file signature (an unknown
    signature disables memoization, mirroring cached_rowcount)."""
    sig = (
        file_signature(sf_dir, "region"),
        file_signature(sf_dir, "nation"),
    )
    key = (sf_dir, region_name, sig)
    memoizable = all(sig)
    if not memoizable or key not in _REGION_NATIONS:
        region = table(spark, sf_dir, "region").filter(
            F.col("r_name") == region_name
        )
        rows = (
            table(spark, sf_dir, "nation")
            .join(
                broadcast(region),
                F.col("n_regionkey") == F.col("r_regionkey"),
            )
            .select("n_nationkey", "n_name")
            .collect()
        )
        val = {int(r["n_nationkey"]): r["n_name"] for r in rows}
        if not memoizable:
            return val
        _REGION_NATIONS[key] = val
    return _REGION_NATIONS[key]


def _fixed_sum(col, alias):
    """Order-independent double sum: floor each value to 1e-4 fixed-point
    (the per-row double is bit-identical in any engine, so its floor is
    too), sum exactly as int64, divide once. Engine-portable where a
    straight double sum is not (summation order) and a double->decimal
    cast is not (rounding mode differs between Spark and DuckDB)."""
    return (F.sum(F.floor(col * 10000)) / F.lit(10000.0)).alias(alias)


# ---------------------------------------------------------------------------
# Reference README question #1: filter + count by year (A6, P5).
@query(
    "visits_by_year",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
           count(*) AS visits
    FROM orders
    GROUP BY 1
    """,
)
def visits_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(F.count("*").alias("visits"))
    )


# Reference README question #2: fact -> dim joins + group-by (J4, A6).
@query(
    "visits_by_region",
    oracle="""
    SELECT r.r_name, count(*) AS visits
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def visits_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    # nation/region are bounded dims -> always broadcast explicitly.
    # The customer chain is NOT force-broadcast: explicit broadcast()
    # ignores size thresholds and OOMs once customer outgrows the
    # driver (seen at the 20x scale probe); under the session's 64MB
    # threshold + AQE, Spark broadcasts it while it fits and falls
    # back to a shuffled join when it doesn't.
    dim = (
        customer.join(broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "r_name")
    )
    # Pre-aggregate the fact BEFORE the customer join: the custkey
    # shuffle then carries one partial count per (partition, custkey)
    # instead of every order row — same two exchanges, ~|orders|/
    # |customers| times less shuffle payload, and count(*) = sum of
    # partial counts keeps the oracle identical.
    per_cust = orders.groupBy("o_custkey").agg(F.count("*").alias("cnt"))
    return (
        per_cust.join(dim, per_cust.o_custkey == dim.c_custkey)
        .groupBy("r_name")
        .agg(F.sum("cnt").alias("visits"))
    )


# Reference README question #3: date-range + top-k (W2).
@query(
    "top5_nations_ytd",
    oracle="""
    SELECT n.n_name, count(*) AS visits
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '2000-01-01'
      AND o.o_orderdate < TIMESTAMP '2000-07-01'
    GROUP BY n.n_name
    ORDER BY visits DESC, n.n_name
    LIMIT 5
    """,
)
def top5_nations_ytd(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("2000-07-01").cast("timestamp"))
    )
    customer = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    dim = customer.join(
        broadcast(nation), customer.c_nationkey == nation.n_nationkey
    ).select("c_custkey", "n_name")
    # Pre-aggregate the (filtered) fact per custkey before the dim
    # join, as in visits_by_region: the shuffle carries partial counts.
    per_cust = orders.groupBy("o_custkey").agg(F.count("*").alias("cnt"))
    return (
        per_cust.join(dim, per_cust.o_custkey == dim.c_custkey)
        .groupBy("n_name")
        .agg(F.sum("cnt").alias("visits"))
        # n_name is unique per group -> deterministic tiebreak, so LIMIT
        # is stable across engines.
        .orderBy(F.desc("visits"), F.asc("n_name"))
        .limit(5)
    )


# Reference README question #4: per-month top-k via window rank (W2).
@query(
    "top_nations_by_month",
    oracle="""
    SELECT * FROM (
        SELECT order_month, n_name, visits,
               CAST(row_number() OVER (
                   PARTITION BY order_month
                   ORDER BY visits DESC, n_name
               ) AS INTEGER) AS rnk
        FROM (
            SELECT CAST(month(o.o_orderdate) AS INTEGER) AS order_month,
                   n.n_name,
                   count(*) AS visits
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            WHERE year(o.o_orderdate) = 2000
            GROUP BY 1, 2
        )
    ) WHERE rnk <= 5
    """,
)
def top_nations_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Range form of year(o_orderdate)=2000: pushes to the parquet scan
    # (row-group min/max pruning), which year() never can.
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("2001-01-01").cast("timestamp"))
    )
    customer = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    dim = customer.join(
        broadcast(nation), customer.c_nationkey == nation.n_nationkey
    ).select("c_custkey", "n_name")
    # Pre-aggregate per (custkey, month) before the dim join: the
    # custkey shuffle carries |custkeys|x12 partial counts instead of
    # every order row (visits_by_region pattern; sum of partials =
    # count(*), oracle unchanged).
    per_cust_month = orders.groupBy(
        F.col("o_custkey"), F.month("o_orderdate").alias("order_month")
    ).agg(F.count("*").alias("cnt"))
    counts = (
        per_cust_month.join(dim, per_cust_month.o_custkey == dim.c_custkey)
        .groupBy("order_month", "n_name")
        .agg(F.sum("cnt").alias("visits"))
    )
    w = Window.partitionBy("order_month").orderBy(F.desc("visits"), F.asc("n_name"))
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
    )


# ---------------------------------------------------------------------------
# TPC-H Q1-shaped pricing summary: the headline scan+agg benchmark query
# (A6 + P4 casts). DECIMAL-internal sums keep the hash order-independent.
@query(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag,
           l_linestatus,
           sum(CAST(floor(l_quantity * 10000) AS BIGINT)) / 10000.0 AS sum_qty,
           sum(CAST(floor(l_extendedprice * 10000) AS BIGINT)) / 10000.0 AS sum_base_price,
           sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) / 10000.0 AS sum_disc_price,
           sum(CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 10000) AS BIGINT)) / 10000.0 AS sum_charge,
           sum(CAST(floor(l_quantity * 10000) AS BIGINT)) / 10000.0 / count(*) AS avg_qty,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        _fixed_sum(F.col("l_quantity"), "sum_qty"),
        _fixed_sum(F.col("l_extendedprice"), "sum_base_price"),
        _fixed_sum(disc_price, "sum_disc_price"),
        _fixed_sum(charge, "sum_charge"),
        (_fixed_sum(F.col("l_quantity"), "x") / F.count("*")).alias("avg_qty"),
        F.count("*").alias("count_order"),
    )


# A3 + U1: distinct domain construction via union
# (reference data_preparation.py:471-477, arrival ∪ departure dates).
@query(
    "distinct_dates",
    oracle="""
    SELECT CAST(o_orderdate AS DATE) AS d FROM orders
    UNION
    SELECT CAST(l_shipdate AS DATE) AS d FROM lineitem
    """,
)
def distinct_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    return (
        orders.select(F.col("o_orderdate").cast("date").alias("d"))
        .union(li.select(F.col("l_shipdate").cast("date").alias("d")))
        .distinct()
    )


# S6 + J2 + F1/F2/F3: literal dim (like the reference's hand-built
# travel_modes/visa_categories, data_preparation.py:259-294), joined
# case-insensitively (J2, data_preparation.py:173-181), with NVL +
# INITCAP presentation (F1/F2, data_preparation.py:156). 'zh' is
# deliberately missing from the dim -> exercises the left-outer NULL path.
_LANG_DIM = [("EN", "english"), ("DE", "german"), ("FR", "french"), ("ES", "spanish")]


@query(
    "docs_by_language",
    oracle="""
    WITH lang_dim(lang_code, lang_name) AS (
        VALUES ('EN','english'),('DE','german'),('FR','french'),('ES','spanish')
    )
    SELECT coalesce(upper(substr(d2.lang_name, 1, 1)) || lower(substr(d2.lang_name, 2)),
                    'Unknown') AS language,
           count(*) AS docs
    FROM documents d
    LEFT JOIN lang_dim d2 ON upper(d.lang) = upper(d2.lang_code)
    GROUP BY 1
    """,
)
def docs_by_language(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    dim = spark.createDataFrame(_LANG_DIM, "lang_code string, lang_name string")
    joined = docs.join(
        broadcast(dim), F.upper(docs.lang) == F.upper(dim.lang_code), "left"
    )
    return (
        joined.groupBy(
            F.coalesce(F.initcap("lang_name"), F.lit("Unknown")).alias("language")
        ).agg(F.count("*").alias("docs"))
    )


# P6: CASE WHEN -> boolean flag (reference matflag logic,
# data_preparation.py:438-443).
@query(
    "order_flags",
    oracle="""
    SELECT CASE WHEN o_orderstatus = 'F' THEN TRUE ELSE FALSE END AS is_finished,
           CASE WHEN o_totalprice IS NOT NULL THEN TRUE ELSE FALSE END AS has_price,
           count(*) AS orders
    FROM orders
    GROUP BY 1, 2
    """,
)
def order_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.when(F.col("o_orderstatus") == "F", F.lit(True))
            .otherwise(F.lit(False))
            .alias("is_finished"),
            F.col("o_totalprice").isNotNull().alias("has_price"),
        ).agg(F.count("*").alias("orders"))
    )


# F4/F5: date-part extraction building a dim_date
# (reference data_preparation.py:463-479).
@query(
    "dim_date_parts",
    oracle="""
    SELECT DISTINCT CAST(o_orderdate AS DATE) AS d,
           CAST(year(o_orderdate) AS INTEGER) AS year,
           CAST(quarter(o_orderdate) AS INTEGER) AS quarter,
           CAST(month(o_orderdate) AS INTEGER) AS month,
           CAST(day(o_orderdate) AS INTEGER) AS day,
           CAST(week(CAST(o_orderdate AS DATE)) AS INTEGER) AS week
    FROM orders
    """,
)
def dim_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    parts = date_parts(d)
    return orders.select(
        d.alias("d"),
        *[c.alias(name) for name, c in parts.items()],
    ).distinct()


# D1-D4 analog: regex field extraction from semi-structured strings
# (reference parse UDFs -> pure regexp_extract, SURVEY.md §2.9).
@query(
    "parse_event_props",
    oracle="""
    SELECT event_type,
           CAST(sum(CAST(nullif(regexp_extract(props, '"k":\\s*([0-9]+)', 1), '')
                    AS INTEGER)) AS BIGINT) AS k_sum,
           count(*) AS events
    FROM events
    GROUP BY event_type
    """,
)
def parse_event_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = events_table(spark, sf_dir)
    # nullif(..., ''): Spark regexp_extract returns '' (not NULL) on a
    # non-matching props payload, and CAST('' AS INT) crashes the whole
    # query under ANSI; the oracle's regexp_extract returns NULL there,
    # which is also the semantics we want — unparseable payloads
    # contribute nothing (r8 adversarial-events audit).
    k = F.nullif(
        F.regexp_extract(F.col("props"), r'"k":\s*([0-9]+)', 1), F.lit("")
    ).cast("int")
    return events.groupBy("event_type").agg(
        F.sum(k).cast("bigint").alias("k_sum"),
        F.count("*").alias("events"),
    )


# D5: SAS-epoch day-offset date conversion (data_preparation.py:69-77).
@query(
    "sas_dates",
    oracle="""
    SELECT p_size,
           DATE '1960-01-01' + CAST(p_size AS INTEGER) AS sas_d,
           count(*) AS parts
    FROM part
    GROUP BY 1, 2
    """,
)
def sas_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = table(spark, sf_dir, "part")
    return (
        part.groupBy(
            F.col("p_size"),
            sas_date(F.col("p_size")).alias("sas_d"),
        ).agg(F.count("*").alias("parts"))
    )


# D6 (fixed): deterministic surrogate keys instead of uuid4
# (data_preparation.py:87 hazard, SURVEY.md §7).
@query(
    "surrogate_keys",
    oracle="""
    SELECT c_custkey,
           sha256(concat_ws(chr(31),
                            coalesce(CAST(c_custkey AS VARCHAR), chr(0)),
                            coalesce(c_name, chr(0)))) AS sk
    FROM customer
    """,
)
def surrogate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        surrogate_key(F.col("c_custkey"), F.col("c_name")).alias("sk"),
    )


# Extended aggregation surface: ROLLUP (SURVEY.md §2.5 note).
@query(
    "customers_rollup",
    oracle="""
    SELECT r.r_name, n.n_name, count(*) AS customers
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
)
def customers_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    joined = (
        cust.join(broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return joined.rollup("r_name", "n_name").agg(F.count("*").alias("customers"))


# Semi/anti joins (SURVEY.md §2.4 "not present in reference" extension).
@query(
    "order_activity",
    oracle="""
    SELECT count(*) FILTER (WHERE EXISTS (
               SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
           )) AS with_orders,
           count(*) FILTER (WHERE NOT EXISTS (
               SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
           )) AS without_orders
    FROM customer c
    """,
)
def order_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi + anti counts in ONE pass: left join against the distinct
    buyer keys and count the match flag both ways — one scan of each
    table, versus separate semi- and anti-join aggregates crossJoined
    together (two scans of both tables for two numbers)."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    buyers = (
        orders.select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
        .withColumn("_has", F.lit(1))
    )
    return (
        cust.select("c_custkey")
        .join(buyers, "c_custkey", "left")
        .agg(
            F.count("_has").alias("with_orders"),
            F.count(F.when(F.col("_has").isNull(), 1)).alias("without_orders"),
        )
    )


# Exact COUNT(DISTINCT) (extended A surface).
@query(
    "distinct_parts_by_flag",
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS parts
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def distinct_parts_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_distinct("l_partkey").alias("parts")
    )


# Q1+Q2 as a query: one-pass null-counts + row count
# (reference data_quality.py:21-38 re-expressed as a single scan --
# the reference issued one Redshift query per column).
@query(
    "quality_summary",
    oracle="""
    SELECT count(*) AS rows,
           CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_orderkey,
           CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_quantity,
           CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_shipdate
    FROM lineitem
    """,
)
def quality_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("rows"),
        F.sum(F.col("l_orderkey").isNull().cast("long")).alias("null_orderkey"),
        F.sum(F.col("l_quantity").isNull().cast("long")).alias("null_quantity"),
        F.sum(F.col("l_shipdate").isNull().cast("long")).alias("null_shipdate"),
    )


# ---------------------------------------------------------------------------
# Extended relational surface beyond the reference (SURVEY.md §2.4 "not
# present" row and §2.5/§2.7 notes): semi/anti joins, INTERSECT/EXCEPT,
# CUBE grouping sets, approximate distinct.


@query(
    "customers_no_orders",
    oracle="""
    SELECT c_mktsegment,
           count(*) AS customers,
           sum(floor(c_acctbal * 10000)) / 10000.0 AS acctbal_sum
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY 1
    """,
)
def customers_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join: customers that never ordered, by segment. Plans as a
    broadcast/shuffled hash anti join — no NOT IN subquery rescans."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    return (
        cust.join(
            orders, cust["c_custkey"] == orders["o_custkey"], "left_anti"
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("customers"),
            _fixed_sum(F.col("c_acctbal"), "acctbal_sum"),
        )
    )


@query(
    "nations_with_suppliers",
    oracle="""
    SELECT n.n_name
    FROM nation n
    WHERE EXISTS (SELECT 1 FROM supplier s WHERE s.s_nationkey = n.n_nationkey)
    """,
)
def nations_with_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join: nations having at least one supplier. Semi stops at
    first match — no row multiplication, unlike join+distinct."""
    nation = table(spark, sf_dir, "nation")
    supplier = table(spark, sf_dir, "supplier")
    return nation.join(
        supplier, nation["n_nationkey"] == supplier["s_nationkey"], "left_semi"
    ).select("n_name")


@query(
    "repeat_buyers_intersect",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1996
    INTERSECT
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1998
    """,
)
def repeat_buyers_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: customers who ordered in both 1996 and 1998."""
    orders = table(spark, sf_dir, "orders")
    # Range predicate (not year()) so the filter pushes into the scan.
    y = lambda yr: (  # noqa: E731
        orders.filter(
            (F.col("o_orderdate") >= F.lit(f"{yr}-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(f"{yr + 1}-01-01").cast("timestamp"))
        ).select(F.col("o_custkey").alias("custkey"))
    )
    return y(1996).intersect(y(1998))


@query(
    "lapsed_buyers_except",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1996
    EXCEPT
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1998
    """,
)
def lapsed_buyers_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: customers who ordered in 1996 but not in 1998."""
    orders = table(spark, sf_dir, "orders")
    # Range predicate (not year()) so the filter pushes into the scan.
    y = lambda yr: (  # noqa: E731
        orders.filter(
            (F.col("o_orderdate") >= F.lit(f"{yr}-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(f"{yr + 1}-01-01").cast("timestamp"))
        ).select(F.col("o_custkey").alias("custkey"))
    )
    return y(1996).subtract(y(1998))


@query(
    "order_priority_cube",
    oracle="""
    SELECT o_orderstatus,
           o_orderpriority,
           CAST(GROUPING(o_orderstatus, o_orderpriority) AS INTEGER) AS gid,
           count(*) AS n_orders,
           sum(floor(o_totalprice * 10000)) / 10000.0 AS price_sum
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def order_priority_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): all 4 grouping sets in ONE pass —
    Spark expands the sets map-side, so the fact is scanned once, not
    4×. gid disambiguates rolled-up NULLs from data NULLs."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count("*").alias("n_orders"),
            _fixed_sum(F.col("o_totalprice"), "price_sum"),
        )
    )


@query(
    "approx_distinct_parts",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS parts_exact,
           TRUE AS approx_within_5pct
    FROM lineitem
    GROUP BY 1
    """,
)
def approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct (rsd=1%) validated against the exact
    count. At 100 TB the approx path is the default: fixed-size sketch
    per group, merge instead of a distinct shuffle. The oracle pins the
    exact count and asserts the sketch landed within 5%."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_distinct("l_partkey").alias("parts_exact"),
        (
            F.abs(
                F.approx_count_distinct("l_partkey", rsd=0.01)
                - F.count_distinct("l_partkey")
            )
            / F.count_distinct("l_partkey")
            <= 0.05
        ).alias("approx_within_5pct"),
    )


@query(
    "event_props_json",
    oracle="""
    SELECT CAST(floor((CASE WHEN props IS NOT NULL AND json_valid(props)
                            THEN json_extract_string(props, '$.k')
                       END)::INTEGER / 10.0) AS INTEGER) AS k_decile,
           count(*) AS events
    FROM events
    GROUP BY 1
    """,
)
def event_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON column parsed with from_json (JVM-side
    Jackson; no Python round-trip) — the schema-on-read path for a
    100 TB event log whose payloads evolve. Decile histogram of $.k."""
    events = events_table(spark, sf_dir)
    k = F.from_json(F.col("props"), "k int")["k"]
    return (
        events.select(F.floor(k / 10).cast("int").alias("k_decile"))
        .groupBy("k_decile")
        .agg(F.count("*").alias("events"))
    )


@query(
    "order_status_pivot",
    oracle="""
    SELECT o_orderpriority,
           CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS status_f,
           CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS status_o,
           CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS status_p
    FROM orders
    GROUP BY 1
    """,
)
def order_status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long -> wide): one pass, map-side partial aggs per pivot
    value. The value list is given explicitly — at scale, never let
    pivot() run its implicit distinct-collect job to discover values."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .select(
            "o_orderpriority",
            F.coalesce("F", F.lit(0)).alias("status_f"),
            F.coalesce("O", F.lit(0)).alias("status_o"),
            F.coalesce("P", F.lit(0)).alias("status_p"),
        )
    )


@query(
    "customer_order_progression",
    oracle="""
    SELECT o_orderkey,
           o_custkey AS custkey,
           CAST(date_diff('day', DATE '1970-01-01', o_orderdate) AS INTEGER) AS order_day,
           CAST(row_number() OVER w AS INTEGER) AS order_seq,
           CAST(date_diff('day', lag(o_orderdate) OVER w, o_orderdate) AS INTEGER) AS prev_gap_days,
           sum(CAST(floor(o_totalprice * 10000) AS BIGINT)) OVER w / 10000.0 AS run_spend
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def customer_order_progression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential window functions per customer: order sequence number,
    days since previous order (lag), and running spend. The running sum
    is fixed-point int64 inside the frame so cumulative doubles are
    order-independent. One shuffle on custkey serves all three
    functions (same window spec). The unique o_orderkey in the ordering
    makes ROWS and RANGE frames equivalent (no peer rows), so Spark's
    rows-frame matches DuckDB's default range-frame."""
    orders = table(spark, sf_dir, "orders")
    day = F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date"))
    # nulls_last: Spark asc() orders NULL dates FIRST, ANSI/DuckDB
    # default LAST — a dateless order shifted every later seq/lag/sum
    # in its customer's series (r8 adversarial audit).
    w = Window.partitionBy("o_custkey").orderBy(
        F.asc_nulls_last("o_orderdate"), "o_orderkey"
    )
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return orders.select(
        "o_orderkey",
        F.col("o_custkey").alias("custkey"),
        day.alias("order_day"),
        F.row_number().over(w).alias("order_seq"),
        (day - F.lag(day).over(w)).alias("prev_gap_days"),
        (
            F.sum(F.floor(F.col("o_totalprice") * 10000).cast("bigint")).over(wf)
            / 10000.0
        ).alias("run_spend"),
    )


@query(
    "revenue_by_priority",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(year(o.o_orderdate) AS INTEGER) AS order_year,
           count(*) AS line_count,
           sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT)) / 10000.0
               AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1, 2
    """,
)
def revenue_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shuffle-heavy fact-to-fact join (lineitem x orders on
    orderkey) — too big to broadcast on either side at real scale, so
    it exercises the sort-merge/shuffled-hash path with AQE. At 100 TB
    this is THE join to co-bucket (write_bucketed_table on l_orderkey /
    o_orderkey removes both Exchanges); unbucketed it shuffles both
    facts once on the join key, with partial aggregation after."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy(
            "o_orderpriority", F.year("o_orderdate").alias("order_year")
        )
        .agg(
            F.count("*").alias("line_count"),
            _fixed_sum(revenue, "revenue"),
        )
    )


# (applicationId, warehouse, tag, fingerprint) -> (version, bucket
# count) this process fully validated (CURRENT resolved, catalog
# adoption done). See the memo comment in bucketed_orderkey_tables.
_VALIDATED_PAIRS: dict[tuple, tuple] = {}


def _forget_validated_pairs() -> None:
    """Test seam: drop the in-process pair-validation memo, simulating
    a fresh process meeting the warehouse cold (the lifecycle tests
    mutate catalog tables behind the builder's back to model crash
    artifacts a NEW process would see; the memo is per-process by
    design, so those tests must clear it first)."""
    _VALIDATED_PAIRS.clear()


def bucketed_orderkey_tables(spark, sf_dir, n_buckets: int | None = None):
    """Co-bucketed (lineitem, orders) tables keyed on orderkey — the
    ingest-time layout that turns the repo's worst-scaling join
    (fact-to-fact on orderkey, 40x probe ratio 5.87 unbucketed) into a
    ZERO-Exchange local zip of corresponding buckets.

    Bucket count MUST scale with the fact, not be a constant: each
    bucket is one task at read time, so a fixed count turns data growth
    into per-task sort/merge growth — measured at 40x sf0.1 on
    local[32], 16 buckets ran 12.3s (worse than the 5.9s shuffle join
    it replaces) while 128 buckets ran 2.7s (2.2x better). Default:
    ~200k lineitem rows per bucket (the measured knee), next power of
    two, floor 16 — one count() scan at ingest buys the right layout
    for every later query. Both facts share the count (co-bucketing
    requires equal bucket numbers).

    Storage is a VERSIONED PAIR STORE (r13, VERDICT r12 #3 — closing
    the replacement-under-concurrency scope line the r8-r12 designs
    drew): ``<warehouse>/bktstore_{tag}_{fp}/_v{N}`` holds ONE
    immutable version of the WHOLE pair (``lineitem/`` + ``orders/``
    bucketed files, a shared ``_BUCKETS`` sidecar, ``_SUCCESS``),
    built through ``writers.versioned_replace`` (= ``commit_build``
    per version + an atomically-published ``CURRENT`` pointer).
    Because one version IS one pair, the pair can never disagree on
    bucket count — the crash-between-two-writes divergence the old
    flat layout had to detect and repair is unrepresentable. And
    because versions are immutable and replacement lands in a NEW
    version, two processes pinning DIFFERENT counts now both succeed
    (each serves its own complete version; CURRENT converges to the
    newest) instead of the old loud two-writers RuntimeError — readers
    resolving CURRENT see old pair or new pair, never a mix
    (two-process replace race + reader loop in tests/test_build_lock).

    Catalog names embed the version (``bkt_{tbl}_{tag}_{fp}_v{N}``)
    because CLUSTERED BY metadata binds to one location; registration
    is always external adoption of a published version dir. The table
    tag embeds a content fingerprint of both source parquets, so
    regenerated sources yield a fresh store rather than stale buckets;
    stale fingerprints/versions/legacy flat dirs are swept after a
    successful serve, with old versions kept one ``gc_versions`` keep
    window for in-flight readers. Same-host first-callers still
    serialize through ``build_exclusive`` so local racers WAIT and
    adopt instead of paying duplicate builds; cross-host racers fall
    back to the commit protocol's optimistic one-winner rename.
    """
    import math
    import re as _re
    from pathlib import Path

    from data_engineering_capstone_project_spark.sources.writers import (
        build_exclusive,
        gc_versions,
        resolve_current,
        versioned_replace,
    )

    tag = _re.sub(r"[^0-9A-Za-z]+", "_", sf_dir).strip("_")
    fp = _source_fingerprint(sf_dir, ("lineitem", "orders"))
    pairs = (("lineitem", "l_orderkey"), ("orders", "o_orderkey"))
    warehouse = Path(
        spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse").replace(
            "file:", ""
        )
    )
    store = warehouse / f"bktstore_{tag}_{fp}"

    def _names(version: int) -> dict:
        return {
            tbl: f"bkt_{tbl}_{tag}_{fp}_v{version}" for tbl, _ in pairs
        }

    def _sidecar_count(vdir) -> int | None:
        try:
            return int((vdir / "_BUCKETS").read_text())
        except (OSError, ValueError):
            return None  # partial/corrupt version: never serve it

    def _serve(vdir, version: int, count: int):
        """Adopt ``vdir`` as this version's catalog pair and return the
        DataFrames; None when the version dir is partial (caller
        rebuilds). A pre-existing catalog entry declaring a DIFFERENT
        count than the immutable files' sidecar can only be a stale or
        corrupt registration (versioned names + immutable dirs leave no
        two-writer ambiguity to fail loudly over): drop and re-adopt."""
        names = _names(version)
        for tbl, key in pairs:
            name = names[tbl]
            if spark.catalog.tableExists(name):
                if _table_bucket_count(spark, name) == count:
                    continue
                spark.sql(f"DROP TABLE IF EXISTS {name}")
            if not _adopt_bucketed_dir(
                spark, name, vdir / tbl, table(spark, sf_dir, tbl).schema,
                key, count,
            ):
                return None
        return tuple(spark.table(names[tbl]) for tbl, _ in pairs)

    def _sweep_stale(keep_version: int) -> None:
        """Drop catalog entries and dirs this serve obsoleted: other
        versions' names, other fingerprints of this tag, and the
        pre-r13 flat layout (legacy ``bkt_{tbl}_{tag}[_{fp}]`` names
        and dirs). Exact-match regexes so a sibling sf_dir whose tag
        extends this one keeps its live pair; version DIRS are swept
        by gc_versions' keep window, not here, so in-flight readers
        of the previous version keep their files."""
        import shutil

        live = set(_names(keep_version).values())
        pats = [
            _re.compile(rf"^bkt_{tbl}_{tag}(_[0-9a-f]{{10}}(_v\d+)?)?$")
            for tbl, _ in pairs
        ]
        for t in spark.catalog.listTables():
            if t.name not in live and any(p.match(t.name) for p in pats):
                spark.sql(f"DROP TABLE IF EXISTS {t.name}")
        flat = [
            _re.compile(rf"^bkt_{tbl}_{tag}_[0-9a-f]{{10}}$")
            for tbl, _ in pairs
        ]
        for d in warehouse.glob(f"bkt_*_{tag}_*"):
            if any(p.match(d.name) for p in flat):
                shutil.rmtree(d, ignore_errors=True)
        storepat = _re.compile(rf"^bktstore_{tag}_[0-9a-f]{{10}}$")
        for d in warehouse.glob(f"bktstore_{tag}_*"):
            if storepat.match(d.name) and d != store:
                shutil.rmtree(d, ignore_errors=True)
        gc_versions(store, keep=2)

    # Steady-state memo (r8, VERDICT #3; versioned r13): once THIS
    # process has served a version for this (app, warehouse, tag,
    # fingerprint), repeat calls skip the DESCRIBE TABLE EXTENDED jobs
    # and the adoption attempts. The memo hit still re-reads CURRENT
    # (one plain file read, no Spark jobs — the same cost class as the
    # old sidecar re-read): a concurrent process may have REPLACED the
    # pair, and freshness should follow the pointer. Version dirs
    # being immutable, the old every-call sidecar cross-check is
    # obsolete — files of a served version can never change under it.
    memo_key = (spark.sparkContext.applicationId, str(warehouse), tag, fp)
    cached = _VALIDATED_PAIRS.get(memo_key)
    if cached is not None:
        version, count = cached
        names = _names(version)
        if (
            (n_buckets is None or n_buckets == count)
            and resolve_current(store)[1] == version
            and all(spark.catalog.tableExists(n) for n in names.values())
        ):
            return tuple(spark.table(names[tbl]) for tbl, _ in pairs)
        _VALIDATED_PAIRS.pop(memo_key, None)

    # Fast path: CURRENT already points at a version whose count
    # satisfies the caller — adopt and serve it.
    vdir, version = resolve_current(store)
    if vdir is not None:
        count = _sidecar_count(vdir)
        if count is not None and (n_buckets is None or n_buckets == count):
            served = _serve(vdir, version, count)
            if served is not None:
                _sweep_stale(version)
                _VALIDATED_PAIRS[memo_key] = (version, count)
                return served

    # Build (first build, pinned replacement, or corrupt-CURRENT
    # repair) — a NEW immutable version through the commit protocol.
    if n_buckets is None:
        rows = cached_rowcount(spark, sf_dir, "lineitem")
        n_buckets = max(16, 2 ** math.ceil(math.log2(max(rows / 200_000, 1))))
    want = n_buckets

    def _complete() -> bool:
        v, _ = resolve_current(store)
        return v is not None and _sidecar_count(v) == want

    def _build_pair_to(attempt: str) -> None:
        import os

        a = Path(attempt)
        for tbl, key in pairs:
            # Path-based bucketed write: Spark only writes bucketed
            # layouts through saveAsTable, so stage through a
            # throwaway EXTERNAL name — DROP keeps the files.
            tmp = f"__bld_{tbl}_{os.getpid()}_{abs(hash(attempt)) % 10**8}"
            spark.sql(f"DROP TABLE IF EXISTS {tmp}")
            (
                table(spark, sf_dir, tbl)
                .write.bucketBy(want, key)
                .sortBy(key)
                .option("path", str(a / tbl))
                .mode("overwrite")
                .saveAsTable(tmp)
            )
            spark.sql(f"DROP TABLE IF EXISTS {tmp}")
        (a / "_BUCKETS").write_text(str(want))
        (a / "_SUCCESS").write_text("")  # root marker LAST

    def _replace() -> None:
        versioned_replace(
            store,
            _build_pair_to,
            {"buckets": want, "source_fingerprint": fp},
        )

    # Same-host wait layer (the pq_codes_table composition): exactly
    # one local process replaces; local concurrent callers wanting the
    # same count wait for CURRENT and adopt. Cross-host racers resolve
    # through versioned_replace's one-winner-per-version protocol.
    build_exclusive(store / f"_pin{want}", _replace, _complete)
    # Serve the newest published version carrying OUR count. Not
    # necessarily CURRENT: an even-newer different-pin replace may
    # have advanced the pointer past ours — our version remains a
    # complete consistent snapshot, which is what a pinned caller
    # asked for (same fingerprint + same count => identical content,
    # so WHICH such version is immaterial).
    best = None
    for d in sorted(store.glob("_v*"), reverse=True):
        m = _re.fullmatch(r"_v(\d+)", d.name)
        if not m or not (d / "_SUCCESS").exists():
            continue
        if _sidecar_count(d) == want:
            best = (d, int(m.group(1)))
            break
    if best is None:
        raise RuntimeError(
            f"bucketed pair build for {store} with {want} buckets "
            "completed but no published version carries that count"
        )
    served = _serve(best[0], best[1], want)
    if served is None:
        raise RuntimeError(
            f"published version {best[0]} is missing table markers"
        )
    _sweep_stale(best[1])
    _VALIDATED_PAIRS[memo_key] = (best[1], want)
    return served


def _adopt_bucketed_dir(spark, name, loc, schema, key, n: int) -> bool:
    """Register a COMPLETE bucketed dir as an external table declaring
    bucket count ``n`` (the pair store's ``_BUCKETS`` sidecar — the
    count the files were REALLY hashed into; declaring anything else
    would silently mis-zip bucket joins). Returns False (no
    registration) for missing or partial dirs — the caller rebuilds."""
    from pathlib import Path

    if not (Path(loc) / "_SUCCESS").exists():
        return False
    ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in schema.fields
    )
    spark.sql(
        f"CREATE TABLE {name} ({ddl}) USING parquet "
        f"CLUSTERED BY ({key}) SORTED BY ({key}) INTO {n} BUCKETS "
        f"LOCATION '{loc}'"
    )
    return True


def _source_fingerprint(sf_dir: str, tables: tuple[str, ...]) -> str:
    """Cheap content tag for parquet inputs: hash over each table's
    ``registry.file_signature`` (the ONE shared signature definition —
    see its docstring). If ANY table's signature is unknown (non-local
    path), returns a fresh random hex tag instead: the pair then
    rebuilds rather than reusing tables whose staleness cannot be
    checked — never-stale at the cost of a rebuild, which is the only
    safe default when content can't be fingerprinted."""
    import hashlib
    import uuid

    from data_engineering_capstone_project_spark.plans.registry import (
        file_signature,
    )

    h = hashlib.sha1()
    for tbl in tables:
        sig = file_signature(sf_dir, tbl)
        if not sig:
            return uuid.uuid4().hex[:10]
        for name, size, mtime in sig:
            h.update(f"{name}:{size}:{mtime};".encode())
    return h.hexdigest()[:10]


def _table_bucket_count(spark, name: str) -> int | None:
    """Bucket count of a catalog table, from DESCRIBE EXTENDED (None if
    the table exists but reports no bucket spec)."""
    for row in spark.sql(f"DESCRIBE TABLE EXTENDED {name}").collect():
        if row.col_name.strip() == "Num Buckets":
            return int(row.data_type.strip())
    return None


@query(
    "revenue_by_priority_bucketed",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(year(o.o_orderdate) AS INTEGER) AS order_year,
           count(*) AS line_count,
           sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT)) / 10000.0
               AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1, 2
    """,
)
def revenue_by_priority_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed twin of ``revenue_by_priority``: identical semantics (and
    identical oracle — bucketing is pure layout), but both facts are read
    from co-bucketed tables so the orderkey join runs with no Exchange on
    either side (asserted in test_plan_shapes). The only shuffle left is
    the tiny partial->final agg on (priority, year) — ~35 grouped rows per
    partition regardless of fact size. This is the registered proof of the
    100 TB answer for fact-to-fact joins: pay the shuffle once at ingest,
    never again per query."""
    li, orders = bucketed_orderkey_tables(spark, sf_dir)
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.select("l_orderkey", "l_extendedprice", "l_discount")
        .join(
            orders.select("o_orderkey", "o_orderpriority", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderpriority", F.year("o_orderdate").alias("order_year"))
        .agg(
            F.count("*").alias("line_count"),
            _fixed_sum(revenue, "revenue"),
        )
    )


@query(
    "big_orders_having",
    oracle="""
    SELECT c.c_mktsegment,
           count(*) AS big_orders,
           sum(CAST(floor(t.qty_sum * 10000) AS BIGINT)) / 10000.0 AS qty_total
    FROM (
        SELECT l_orderkey, sum(l_quantity) AS qty_sum
        FROM lineitem
        GROUP BY l_orderkey
        HAVING sum(l_quantity) > 150
    ) t
    JOIN orders o ON t.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1
    """,
)
def big_orders_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: aggregate -> HAVING filter -> join upward.
    The HAVING collapses lineitem to order grain BEFORE the joins, so
    the expensive fact join runs on the reduced set — the ordering a
    100 TB plan must have (per-row qty_sum is integral-valued doubles,
    so the inner sum needs no fixed-point guard; the outer re-sum keeps
    one for cross-engine hash stability)."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty_sum"))
        .filter(F.col("qty_sum") > 150)
    )
    return (
        big.join(orders, big["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("big_orders"),
            _fixed_sum(F.col("qty_sum"), "qty_total"),
        )
    )


@query(
    "price_percentiles",
    oracle="""
    SELECT l_returnflag,
           floor(quantile_cont(l_extendedprice, 0.5) * 10000) / 10000.0 AS p50,
           floor(quantile_cont(l_extendedprice, 0.9) * 10000) / 10000.0 AS p90,
           floor(quantile_cont(l_extendedprice, 0.99) * 10000) / 10000.0 AS p99
    FROM lineitem
    GROUP BY 1
    """,
)
def price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated percentiles per group (Spark
    percentile == DuckDB quantile_cont, verified digit-for-digit). At
    100 TB switch to approx_percentile: fixed-size sketch, mergeable,
    no per-group sort — same call shape, bounded error."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        (F.floor(F.expr("percentile(l_extendedprice, 0.5)") * 10000) / F.lit(10000.0)).alias("p50"),
        (F.floor(F.expr("percentile(l_extendedprice, 0.9)") * 10000) / F.lit(10000.0)).alias("p90"),
        (F.floor(F.expr("percentile(l_extendedprice, 0.99)") * 10000) / F.lit(10000.0)).alias("p99"),
    )


@query(
    "small_quantity_revenue",
    oracle="""
    WITH lim AS (
        SELECT l_partkey, 0.5 * avg(l_quantity) AS qty_lim
        FROM lineitem GROUP BY 1
    )
    SELECT count(*) AS small_lines,
           sum(CAST(floor(l.l_extendedprice * 10000) AS BIGINT)) / 10000.0 AS small_revenue
    FROM lineitem l JOIN lim ON l.l_partkey = lim.l_partkey
    WHERE l.l_quantity < lim.qty_lim
    """,
)
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: filter a fact by a per-group aggregate of
    itself (decorrelated into agg + self-join — Spark never executes a
    per-row correlated rescan). The threshold is deterministic across
    engines because l_quantity is integral-valued: the sum is exact in
    float64 in any order, and avg is a single division of exact
    operands."""
    li = table(spark, sf_dir, "lineitem")
    lim = li.groupBy("l_partkey").agg(
        (0.5 * F.avg("l_quantity")).alias("qty_lim")
    )
    return (
        li.join(lim, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_lim"))
        .agg(
            F.count("*").alias("small_lines"),
            _fixed_sum(F.col("l_extendedprice"), "small_revenue"),
        )
    )


@query(
    "customer_order_keys",
    oracle="""
    SELECT o_custkey AS custkey,
           count(*) AS n_orders,
           array_to_string(list(o_orderkey ORDER BY o_orderkey), ',') AS order_keys
    FROM orders
    GROUP BY 1
    """,
)
def customer_order_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation: per-customer sorted order-key list, exchanged
    as a CSV string (engines render arrays differently; strings hash
    identically). collect_list is fine when per-group cardinality is
    bounded (orders per customer); for unbounded groups prefer top-N
    via window or an explicit cap."""
    orders = table(spark, sf_dir, "orders")
    return orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.count("*").alias("n_orders"),
        F.concat_ws(",", F.sort_array(F.collect_list("o_orderkey"))).alias(
            "order_keys"
        ),
    )


@query(
    "order_status_unpivot",
    oracle="""
    WITH wide AS (
        SELECT o_orderpriority,
               CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS status_f,
               CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS status_o,
               CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS status_p
        FROM orders GROUP BY 1
    )
    SELECT o_orderpriority, 'status_f' AS status, status_f AS n FROM wide
    UNION ALL
    SELECT o_orderpriority, 'status_o', status_o FROM wide
    UNION ALL
    SELECT o_orderpriority, 'status_p', status_p FROM wide
    """,
)
def order_status_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide -> long, the inverse of order_status_pivot) via
    the built-in melt: a zero-shuffle Generate over the wide frame —
    never a union of N re-scans, which re-reads the source per
    column at scale."""
    wide = order_status_pivot(spark, sf_dir)
    return wide.melt(
        ids=["o_orderpriority"],
        values=["status_f", "status_o", "status_p"],
        variableColumnName="status",
        valueColumnName="n",
    )


@query(
    "approx_percentile_check",
    oracle="""
    SELECT l_returnflag,
           floor(quantile_cont(l_extendedprice, 0.5) * 10000) / 10000.0 AS p50_exact,
           TRUE AS approx_within_1pct
    FROM lineitem
    GROUP BY 1
    """,
)
def approx_percentile_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch path for percentiles (KLL-style approx_percentile:
    fixed-size mergeable state, no per-group sort — the only viable
    form at 100 TB) validated against the exact interpolated median:
    the oracle pins exactness and asserts the sketch landed within 1%."""
    li = table(spark, sf_dir, "lineitem")
    exact = F.expr("percentile(l_extendedprice, 0.5)")
    approx = F.expr("approx_percentile(l_extendedprice, 0.5, 10000)")
    # Vacuous-true guard (r8 adversarial audit): a group whose prices
    # are all NULL has no median to check (exact NULL made the flag
    # NULL where the oracle's literal is TRUE), and an exact median of
    # 0 would divide by zero — both are "nothing to check".
    within = F.when(
        exact.isNull() | (exact == 0), F.lit(True)
    ).otherwise(F.abs(approx - exact) / exact <= 0.01)
    return li.groupBy("l_returnflag").agg(
        (F.floor(exact * 10000) / F.lit(10000.0)).alias("p50_exact"),
        within.alias("approx_within_1pct"),
    )


@query(
    "segment_nation_grouping_sets",
    oracle="""
    SELECT c_mktsegment,
           n_name,
           CAST(GROUPING(c_mktsegment, n_name) AS INTEGER) AS gid,
           count(*) AS customers
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY GROUPING SETS ((c_mktsegment), (n_name))
    """,
)
def segment_nation_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (two independent one-dimension rollups in
    ONE scan+expand pass — the alternative is two scans unioned).
    Unlike cube/rollup, only the requested sets materialize."""
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    joined = cust.join(
        broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"]
    )
    joined.createOrReplaceTempView("_cust_nation")
    return spark.sql(
        """
        SELECT c_mktsegment,
               n_name,
               CAST(grouping_id(c_mktsegment, n_name) AS INT) AS gid,
               count(*) AS customers
        FROM _cust_nation
        GROUP BY GROUPING SETS ((c_mktsegment), (n_name))
        """
    )


# Bounded sliding window frame (ROWS BETWEEN): the per-row moving
# aggregate shape — distinct from the unbounded running frame of
# customer_order_progression. One shuffle on custkey serves the frame.
@query(
    "orders_moving_avg",
    oracle="""
    SELECT o_orderkey,
           o_custkey AS custkey,
           (sum(CAST(floor(o_totalprice * 10000) AS BIGINT)) OVER w
            / (count(*) OVER w)) / 10000.0 AS mov_avg
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
)
def orders_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-order moving average of spend per customer. The mean is
    fixed-point: int64 frame sum / int64 frame count, divided once —
    the same two integers in any engine, so the double result is
    bit-identical regardless of frame evaluation order."""
    orders = table(spark, sf_dir, "orders")
    # nulls_last: see customer_order_progression (same window family)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc_nulls_last("o_orderdate"), "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    fixed = F.sum(
        F.floor(F.col("o_totalprice") * 10000).cast("bigint")
    ).over(w)
    cnt = F.count(F.lit(1)).over(w)
    return orders.select(
        "o_orderkey",
        F.col("o_custkey").alias("custkey"),
        ((fixed / cnt) / F.lit(10000.0)).alias("mov_avg"),
    )


# TPC-H Q3 shape: 3-table selective join -> grouped revenue -> global
# top-10. The classic "shipping priority" plan: both date filters
# push to the scans, customer is broadcast, the orderkey group-by is
# the only big shuffle, and the top-10 is a TakeOrderedAndProject
# (never a full sort).
@query(
    "shipping_priority_q3",
    oracle="""
    SELECT l_orderkey,
           sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))
               / 10000.0 AS revenue,
           CAST(o_orderdate AS DATE) AS order_date,
           o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-01-01'
      AND l_shipdate > TIMESTAMP '1997-01-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, order_date, l_orderkey
    LIMIT 10
    """,
)
def shipping_priority_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-01-01").cast("timestamp")
    )
    rev_row = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
    ).cast("bigint")
    # lineitem joins FIRST and streams (r13): the r12 left-deep
    # cust⋈orders⋈li order made the planner build the shipdate-filtered
    # HALF OF LINEITEM as the broadcast hash side — the cust⋈orders
    # output's product-form size estimate disqualified it, and the raw
    # lineitem stats (10.8 MB at sf0.1) fit the threshold. With li on
    # the stream side both build sides are raw scans with honest stats
    # (orders-below-date, customer-BUILDING); past the threshold each
    # join degrades to the shuffled form independently — no hints.
    return (
        li.join(
            orders.select(
                "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            broadcast(cust.select("c_custkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg((F.sum(rev_row) / F.lit(10000.0)).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").alias("order_date"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("order_date"), F.asc("l_orderkey"))
        .limit(10)
    )


# TPC-H Q5 shape: the 6-table star-plus-constraint join ("local
# supplier volume"). Exercises multi-join planning: region/nation are
# broadcast (bounded dims), customer/orders/lineitem/supplier are
# shuffle hash joins on their keys, and the extra c_nationkey =
# s_nationkey predicate is applied as a join-time filter, never as a
# post-join cross product. The only big shuffles are the fact joins on
# orderkey/suppkey; the final group-by has 25 keys.
@query(
    "local_supplier_volume_q5",
    oracle="""
    SELECT n_name,
           sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))
               / 10000.0 AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def local_supplier_volume_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 re-expression (reference has no Q5, but this is the
    canonical multi-join the ad-hoc SQL surface must plan well;
    SURVEY.md §2.10). r13 shape — three measured changes
    (OPTIMIZATION_r13.md "local_supplier_volume_q5"):

    * The Asia nation list is a plan-build literal
      (``_region_nation_map``), so customer and supplier are
      raw-scan + ``isin`` prefilters with honest size stats. The r12
      form pre-filtered them via broadcast joins, whose product-form
      output estimates disqualified them as broadcast build sides
      downstream — the planner then built the 600k-row LINEITEM as a
      broadcast hash relation (the single most expensive node in the
      r12 plan) and SortMergeJoined supp against every fact row.
    * Join order lineitem ⋈ orders ⋈ customer streams the fact
      through two BroadcastHashJoins while orders-1996 and
      customer-Asia fit the 64 MB threshold, with ZERO fact
      exchanges; past the threshold the planner degrades each join to
      the shuffled form independently — no hints, still
      scale-adaptive.
    * The fact is pre-aggregated to (l_suppkey, c_nationkey) pairs
      before the supplier join (guide §2.3): the fixed-point row
      revenue is an exact int64 distributive sum, so sum-of-sums is
      byte-identical (each pair matches at most one supplier row) and
      only the |suppliers x Asia-nations|-bounded pair aggregate
      crosses an Exchange.

    Measured at sf0.1 (same session, best-of-5): r12 form 1.417s ->
    0.861s."""
    nmap = _region_nation_map(spark, sf_dir, "ASIA")
    asia_keys = sorted(nmap)
    # Empty dims (no ASIA region in the inputs): the zero-entry
    # create_map cannot be key-indexed (VOID key type); the isin([])
    # prefilters already yield empty frames, so any NULL literal
    # matches the r12 join's behavior of producing no rows.
    n_name = (
        F.create_map(*[F.lit(x) for k in asia_keys for x in (k, nmap[k])])[
            F.col("s_nationkey")
        ]
        if asia_keys
        else F.lit(None).cast("string")
    )
    cust = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_nationkey").isin(asia_keys))
        .select("c_custkey", "c_nationkey")
    )
    supp = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_nationkey").isin(asia_keys))
        .select(
            "s_suppkey",
            "s_nationkey",
            n_name.alias("n_name"),
        )
    )
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    rev_row = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
    ).cast("bigint")
    pairs = (
        li.join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_suppkey", "c_nationkey")
        .agg(F.sum(rev_row).alias("rev_fp"))
    )
    return (
        pairs.join(
            supp,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg((F.sum("rev_fp") / F.lit(10000.0)).alias("revenue"))
        .select("n_name", "revenue")
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


@query(
    "customer_spend_quartiles",
    oracle="""
    WITH spend AS (
        SELECT o_custkey AS custkey,
               sum(CAST(floor(o_totalprice * 10000) AS BIGINT)) AS spend_fp
        FROM orders
        GROUP BY 1
    )
    SELECT custkey,
           spend_fp / 10000.0 AS total_spend,
           CAST(ntile(4) OVER (ORDER BY spend_fp DESC, custkey) AS INTEGER)
               AS quartile
    FROM spend
    """,
)
def customer_spend_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-count spend quartiles per customer (ntile over a total
    order — the deterministic tiebreak on custkey makes the assignment
    unique, hence hash-checkable). ORACLE-TIER ONLY: ntile pulls every
    row through one task (single-partition sort, measured 5.96x at the
    40x probe, which is why this form is excluded from the probe set);
    the production path is ``customer_spend_quartiles_distributed`` —
    identical quartile assignment via range-repartition + id
    bit-slicing + per-partition offsets, measured FLAT across
    1x/8x/20x/40x. Trade-off documented in PERFORMANCE.md
    ("Quartiles at scale")."""
    orders = table(spark, sf_dir, "orders")
    spend = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.sum(F.floor(F.col("o_totalprice") * 10000).cast("bigint")).alias(
            "spend_fp"
        )
    )
    w = Window.orderBy(F.desc("spend_fp"), F.asc("custkey"))
    return spend.select(
        "custkey",
        (F.col("spend_fp") / F.lit(10000.0)).alias("total_spend"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
    )


@query(
    "rolling_revenue_7d",
    oracle="""
    SELECT o_orderkey,
           o_custkey AS custkey,
           CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS day,
           sum(CAST(floor(o_totalprice * 10000) AS BIGINT))
               OVER (PARTITION BY o_custkey
                     ORDER BY CAST(o_orderdate AS DATE) - DATE '1970-01-01'
                     RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
               / 10000.0 AS rolling_rev
    FROM orders
    """,
)
def rolling_revenue_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer 7-day rolling spend — a time-RANGE frame, not a
    ROWS frame: the frame is defined by the ORDER BY *value* (epoch
    day), so same-day orders always share a frame and the result is
    tie-order independent (what makes a value-range frame
    hash-checkable where an unkeyed ROWS frame is not). One shuffle on
    o_custkey; the frame sum is a running in-partition pass."""
    orders = table(spark, sf_dir, "orders")
    day = F.unix_date(F.col("o_orderdate").cast("date"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(day.alias("day"))
        .rangeBetween(-6, Window.currentRow)
    )
    fixed = F.sum(F.floor(F.col("o_totalprice") * 10000).cast("bigint")).over(w)
    return orders.select(
        "o_orderkey",
        F.col("o_custkey").alias("custkey"),
        day.alias("day"),
        (fixed / F.lit(10000.0)).alias("rolling_rev"),
    )


# TPC-H Q10 shape: "who returned the most revenue last quarter" — the
# selective fact-fact join + wide group-by + global top-k pattern.
@query(
    "returned_revenue_q10",
    oracle="""
    SELECT c_custkey,
           c_name,
           n_name,
           sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))
               / 10000.0 AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-10-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def returned_revenue_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 re-expression: one quarter of orders (pushed range
    scan), returned line items only (pushed equality), nation broadcast,
    and the top-20 is TakeOrderedAndProject over the grouped output —
    the full sort never happens. The orders⋈lineitem join shuffles only
    the quarter's rows; group keys include the customer attributes so
    no second join back is needed."""
    cust = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev_row = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
    ).cast("bigint")
    # lineitem joins FIRST and streams (r13, same reasoning as
    # shipping_priority_q3): the r12 order broadcast the R-filtered
    # QUARTER OF LINEITEM as the hash build; li-first keeps every
    # build side a raw scan with honest stats (orders-quarter,
    # customer, nation) and the fact on the stream side.
    return (
        li.join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg((F.sum(rev_row) / F.lit(10000.0)).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "orders_price_histogram",
    oracle="""
    SELECT CAST(least(floor(o_totalprice / 50000), 9) AS INTEGER) AS bucket,
           count(*) AS orders,
           sum(CAST(floor(o_totalprice * 10000) AS BIGINT)) / 10000.0
               AS bucket_revenue
    FROM orders
    GROUP BY 1
    """,
)
def orders_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width price histogram (10 x 50k buckets, top bucket
    clamped): binning is a pure projection so the whole query is one
    partial+final agg over <= 10 groups — the cheapest possible
    full-scan profile. (width_bucket is not portable to every engine;
    the floor/least form is the same arithmetic everywhere.)"""
    orders = table(spark, sf_dir, "orders")
    bucket = F.least(F.floor(F.col("o_totalprice") / 50000), F.lit(9)).cast(
        "int"
    )
    return (
        orders.groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").alias("orders"),
            _fixed_sum(F.col("o_totalprice"), "bucket_revenue"),
        )
    )


@query(
    "quantity_discount_corr",
    oracle="""
    WITH t AS (
        SELECT l_returnflag,
               CAST(l_quantity AS BIGINT) AS q,
               CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS d
        FROM lineitem
    ),
    s AS (
        SELECT l_returnflag,
               count(*) AS n,
               sum(q) AS sq, sum(d) AS sd,
               sum(q * d) AS sqd, sum(q * q) AS sq2, sum(d * d) AS sd2
        FROM t GROUP BY 1
    )
    SELECT l_returnflag, n,
           floor((CAST(n AS DOUBLE) * sqd - CAST(sq AS DOUBLE) * sd)
                 / nullif(sqrt(CAST(n AS DOUBLE) * sq2 - CAST(sq AS DOUBLE) * sq)
                          * sqrt(CAST(n AS DOUBLE) * sd2 - CAST(sd AS DOUBLE) * sd),
                          0)
                 * 10000) / 10000.0 AS corr_qd
    FROM s
    """,
)
def quantity_discount_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation of quantity vs discount per return flag,
    computed from five EXACT int64 moment sums (both inputs are small
    integers after fixed-point mapping) and assembled in one double
    expression — unlike corr(), whose per-partition double accumulation
    is summation-order dependent, this is bit-identical in any engine
    and any partitioning. One scan, one partial+final agg on 3 keys."""
    li = table(spark, sf_dir, "lineitem")
    t = li.select(
        "l_returnflag",
        F.col("l_quantity").cast("bigint").alias("q"),
        F.floor(F.col("l_discount") * 100 + 0.5).cast("bigint").alias("d"),
    )
    s = t.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum("q").alias("sq"),
        F.sum("d").alias("sd"),
        F.sum(F.col("q") * F.col("d")).alias("sqd"),
        F.sum(F.col("q") * F.col("q")).alias("sq2"),
        F.sum(F.col("d") * F.col("d")).alias("sd2"),
    )
    n = F.col("n").cast("double")
    sq = F.col("sq").cast("double")
    sd = F.col("sd").cast("double")
    cov = n * F.col("sqd") - sq * F.col("sd")
    var_q = F.sqrt(n * F.col("sq2") - sq * F.col("sq"))
    var_d = F.sqrt(n * F.col("sd2") - sd * F.col("sd"))
    # nullif guard: a degenerate group (constant quantity or discount)
    # has zero variance; under ANSI mode a bare /0 would throw.
    return s.select(
        "l_returnflag",
        "n",
        (
            F.floor(cov / F.nullif(var_q * var_d, F.lit(0.0)) * 10000)
            / F.lit(10000.0)
        ).alias("corr_qd"),
    )


# TPC-H Q19 shape: a DISJUNCTION of conjunctive ranges that spans both
# join sides — the optimizer-stress pattern: the per-side parts of the
# OR must still push down (brand/size to the part scan, the overall
# quantity envelope to lineitem), while the cross-side residual is
# evaluated at the join.
@query(
    "disjunctive_revenue_q19",
    oracle="""
    SELECT sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))
               / 10000.0 AS revenue,
           count(*) AS line_items
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 20
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 30
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def disjunctive_revenue_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 re-expression over the available columns. Catalyst
    derives the pushable envelope of the OR per side (brand IN (...)
    AND size <= 30 on part; quantity BETWEEN 1 AND 30 on lineitem) and
    keeps the exact disjunction as the join filter — asserted in
    test_plan_shapes: without the derived envelopes this is a full
    scan of both tables at 100 TB."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    cond = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 20)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 30)
        & F.col("l_quantity").between(20, 30)
    )
    rev_row = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
    ).cast("bigint")
    return (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(
            (F.sum(rev_row) / F.lit(10000.0)).alias("revenue"),
            F.count("*").alias("line_items"),
        )
    )


# TPC-H Q22 shape: scalar aggregate subquery feeding a filter +
# anti-join — "rich customers who never ordered".
@query(
    "waiting_customers_q22",
    oracle="""
    SELECT substr(c_name, 10, 2) AS cntrycode,
           count(*) AS numcust,
           sum(CAST(floor(c_acctbal * 10000) AS BIGINT)) / 10000.0 AS totacctbal
    FROM customer
    WHERE c_acctbal > (
        SELECT sum(CAST(floor(c_acctbal * 10000) AS BIGINT))
               / (10000.0 * count(*))
        FROM customer WHERE c_acctbal > 0
    )
    AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY 1
    """,
)
def waiting_customers_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 re-expression: the positive-balance average is a
    1-row aggregate broadcast into the filter (never a per-row
    recomputation), the 'no orders' test is a LEFT ANTI join on
    o_custkey (the only shuffle that scales with orders — and only its
    o_custkey column is read), and the final group-by runs on the tiny
    survivor set. The average is assembled from exact int64 sums so
    the threshold double is engine-identical."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    avg_row = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(
            (
                F.sum(F.floor(F.col("c_acctbal") * 10000).cast("bigint"))
                / (F.lit(10000.0) * F.count("*"))
            ).alias("avg_bal")
        )
    )
    rich = cust.join(
        broadcast(avg_row), F.col("c_acctbal") > F.col("avg_bal")
    ).select("c_custkey", "c_name", "c_acctbal")
    waiting = rich.join(
        orders.select("o_custkey"),
        rich.c_custkey == F.col("o_custkey"),
        "left_anti",
    )
    return (
        waiting.groupBy(F.substring("c_name", 10, 2).alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            _fixed_sum(F.col("c_acctbal"), "totacctbal"),
        )
    )


# TPC-H Q13 shape: distribution of per-customer order counts over a
# FILTERED left outer join — completing the 22/22 TPC-H suite. The
# canonical filter is a comment-pattern NOT LIKE; this testdata's
# orders table carries no o_comment column, so the filter is adapted
# to the available schema (exclude 1-URGENT orders) while keeping the
# shape that makes Q13 interesting: the predicate must live in the
# JOIN CONDITION, not a WHERE (a WHERE would silently turn the outer
# join inner and drop the zero-order customers that anchor the
# distribution's head).
@query(
    "customer_distribution_q13",
    oracle="""
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
        SELECT c.c_custkey,
               CAST(count(o.o_orderkey) AS BIGINT) AS c_count
        FROM customer c
        LEFT OUTER JOIN orders o
          ON c.c_custkey = o.o_custkey
         AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
)
def customer_distribution_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 re-expression: how many customers placed 0, 1, 2, ...
    qualifying orders. Two-level aggregate: per-customer counts over a
    left outer join whose non-join predicate is pushed to the ORDERS
    SIDE BEFORE the join (filter-then-join — Catalyst pushes it as a
    scan filter on orders, so the shuffle carries only qualifying
    orders), then the tiny count-of-counts. count(o_orderkey) — not
    count(*) — makes the no-match customers count 0. Scale shape: one
    shuffle of (filtered) orders on o_custkey against customers; the
    second aggregate's domain is the max order count per customer,
    ~dozens of rows. The distribution head (c_count = 0) is exactly
    the anti-join population, which is why the filter must stay in
    the join condition."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    qualifying = orders.filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        cust.select("c_custkey")
        .join(qualifying, cust.c_custkey == qualifying.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count("*").cast("bigint").alias("custdist")
    )


@query(
    "customer_spend_tiers",
    oracle="""
    WITH spend AS (
        SELECT o_custkey AS custkey,
               sum(CAST(floor(o_totalprice * 10000) AS BIGINT)) AS spend_fp
        FROM orders
        GROUP BY 1
    ),
    cuts AS (
        SELECT quantile_cont(spend_fp, 0.25) AS c1,
               quantile_cont(spend_fp, 0.50) AS c2,
               quantile_cont(spend_fp, 0.75) AS c3
        FROM spend
    )
    SELECT custkey,
           spend_fp / 10000.0 AS total_spend,
           CAST(1 + (spend_fp > c1)::INT + (spend_fp > c2)::INT
                  + (spend_fp > c3)::INT AS INTEGER) AS tier
    FROM spend, cuts
    """,
)
def customer_spend_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB twin of ``customer_spend_quartiles``: value-cutoff
    tiers instead of equal-count ranks. The quartile cutoffs come from
    ONE distributed percentile aggregate (partial+final, no global
    sort — ntile's single-partition sort is this plan's whole cost at
    scale), broadcast as a 1-row frame; tier assignment is then a pure
    projection. Spark ``percentile`` and DuckDB ``quantile_cont`` are
    the same linear interpolation over exact int64 spends, so even the
    cutoffs hash-match."""
    orders = table(spark, sf_dir, "orders")
    spend = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.sum(F.floor(F.col("o_totalprice") * 10000).cast("bigint")).alias(
            "spend_fp"
        )
    )
    cuts = spend.agg(
        F.expr("percentile(spend_fp, 0.25)").alias("c1"),
        F.expr("percentile(spend_fp, 0.50)").alias("c2"),
        F.expr("percentile(spend_fp, 0.75)").alias("c3"),
    )
    tier = (
        F.lit(1)
        + (F.col("spend_fp") > F.col("c1")).cast("int")
        + (F.col("spend_fp") > F.col("c2")).cast("int")
        + (F.col("spend_fp") > F.col("c3")).cast("int")
    )
    return spend.join(broadcast(cuts)).select(
        "custkey",
        (F.col("spend_fp") / F.lit(10000.0)).alias("total_spend"),
        tier.cast("int").alias("tier"),
    )


@query(
    "customer_order_reconciliation",
    oracle="""
    WITH spend AS (
        SELECT o_custkey, sum(CAST(floor(o_totalprice * 10000) AS BIGINT)) AS spend_fp
        FROM orders GROUP BY 1
    )
    SELECT coalesce(c_custkey, o_custkey) AS custkey,
           CASE WHEN c_custkey IS NULL THEN 'orphan_orders'
                WHEN o_custkey IS NULL THEN 'no_orders'
                ELSE 'matched' END AS status,
           coalesce(spend_fp, 0) / 10000.0 AS total_spend,
           c_acctbal IS NOT NULL AS has_account
    FROM customer FULL OUTER JOIN spend ON c_custkey = o_custkey
    """,
)
def customer_order_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided integrity reconciliation via FULL OUTER join — the
    referential-audit shape (orders with no customer AND customers with
    no orders surface in one pass, where separate anti-joins scan each
    side twice). A full outer cannot broadcast (both sides must
    survive), so it is planned as the shuffle join it has to be —
    the point is one shuffle instead of two anti-join passes."""
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    spend = (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 10000).cast("bigint")).alias(
                "spend_fp"
            )
        )
    )
    joined = cust.join(
        spend, cust.c_custkey == spend.o_custkey, "full_outer"
    )
    status = (
        F.when(F.col("c_custkey").isNull(), "orphan_orders")
        .when(F.col("o_custkey").isNull(), "no_orders")
        .otherwise("matched")
    )
    return joined.select(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"),
        status.alias("status"),
        (F.coalesce("spend_fp", F.lit(0)) / F.lit(10000.0)).alias("total_spend"),
        F.col("c_acctbal").isNotNull().alias("has_account"),
    )


# TPC-H Q4 shape: EXISTS semi-join whose condition spans both tables —
# count orders having at least one line item shipped after the order
# date, by priority.
@query(
    "late_shipment_orders_q4",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-04-01'
      AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
      )
    GROUP BY o_orderpriority
    """,
)
def late_shipment_orders_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 re-expression. The r12 LEFT SEMI form put the
    quarter's orders on the left, and a left-semi hash join can only
    BUILD its right side — so the planner built ALL OF LINEITEM
    (600k rows at sf0.1) as the broadcast hash relation to probe
    5.4k orders into it. r13: inner-join the fact against the
    quarter's orders (the build side is now the small raw-stats scan;
    lineitem streams) and restore EXISTS's emit-once property with a
    per-(order, priority) aggregate — the dedup "shuffle" it pays
    carries one row per qualifying order of one quarter, orders of
    magnitude under the lineitem hash build it replaces, and the
    orderkey grouping collapses to the priority rollup in the same
    stage. Past the broadcast threshold the planner degrades the join
    to the shuffled form — no hints, scale-adaptive."""
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    per_order = (
        li.join(
            orders.select("o_orderkey", "o_orderdate", "o_orderpriority"),
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
        )
        # EXISTS semantics: one row per qualifying order, however many
        # late lines it has.
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(F.lit(1).alias("_one"))
    )
    return per_order.groupBy("o_orderpriority").agg(
        F.count("*").alias("order_count")
    )


# TPC-H Q6 shape: the minimal scan benchmark — three pushable
# predicates, no join, one global sum.
@query(
    "forecast_revenue_q6",
    oracle="""
    SELECT sum(CAST(floor(l_extendedprice * l_discount * 10000) AS BIGINT))
               / 10000.0 AS revenue,
           count(*) AS line_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def forecast_revenue_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: every predicate reaches the parquet scan (range on
    shipdate prunes row groups; discount/quantity filter what's left),
    then a single partial+final sum — the query whose whole cost IS
    the scan, which makes it the canonical pushdown regression."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    rev = F.floor(F.col("l_extendedprice") * F.col("l_discount") * 10000).cast(
        "bigint"
    )
    return li.agg(
        (F.sum(rev) / F.lit(10000.0)).alias("revenue"),
        F.count("*").alias("line_items"),
    )


# TPC-H Q12 shape: conditional aggregation after a fact-fact join —
# "how many critical orders shipped in each line status".
@query(
    "priority_shipping_q12",
    oracle="""
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_linestatus
    """,
)
def priority_shipping_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 re-expression over the available columns: the date
    range prunes lineitem at the scan, the join shuffles only the
    year's rows, and both priority classes come out of ONE pass as
    conditional sums (a per-class GROUP BY + pivot would shuffle the
    classification; CASE inside the aggregate does not)."""
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# TPC-H Q15 shape: aggregate-of-aggregate — suppliers whose quarterly
# revenue equals the maximum quarterly revenue.
@query(
    "top_supplier_q15",
    oracle="""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))
                   AS total_fp
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY 1
    )
    SELECT s_suppkey, s_name, total_fp / 10000.0 AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_fp = (SELECT max(total_fp) FROM revenue)
    """,
)
def top_supplier_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 re-expression: the per-supplier revenue aggregate is
    computed ONCE and reused for both the max (a 1-row aggregate
    broadcast into the filter) and the detail rows — persist() makes
    the reuse explicit since Catalyst will not share the subtree
    across the two consumers. Exact int64 revenue means the max
    comparison is an integer equality — no double-tie ambiguity."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev_row = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
    ).cast("bigint")
    revenue = scoped_persist(
        li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
            F.sum(rev_row).alias("total_fp")
        ),
        "top_supplier_q15.revenue",
    )
    max_rev = revenue.agg(F.max("total_fp").alias("max_fp"))
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        supp.join(revenue, F.col("s_suppkey") == F.col("supplier_no"))
        .join(broadcast(max_rev), F.col("total_fp") == F.col("max_fp"))
        .select(
            "s_suppkey",
            "s_name",
            (F.col("total_fp") / F.lit(10000.0)).alias("total_revenue"),
        )
    )


# TPC-H Q18 shape: join against a grouped-HAVING subquery — customers
# placing very large orders.
@query(
    "large_order_customers_q18",
    oracle="""
    WITH big AS (
        SELECT l_orderkey
        FROM lineitem
        GROUP BY l_orderkey
        HAVING sum(CAST(l_quantity AS BIGINT)) > 150
    )
    SELECT c_name, c_custkey, o_orderkey,
           CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS order_day,
           floor(o_totalprice * 10000) / 10000.0 AS total_price
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN big ON o_orderkey = big.l_orderkey
    """,
)
def large_order_customers_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 re-expression: the HAVING subquery reduces lineitem
    to qualifying order keys FIRST (partial-agg + filter — tiny
    output), then drives semi-style joins back to orders/customer, so
    the expensive tables only ever join against the filtered key set.
    Exact integer quantity sum keeps the >150 cut engine-identical."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("qty"))
        .filter(F.col("qty") > 150)
        .select("l_orderkey")
    )
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.unix_date(F.col("o_orderdate").cast("date")).alias("order_day"),
            (F.floor(F.col("o_totalprice") * 10000) / F.lit(10000.0)).alias(
                "total_price"
            ),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q7/Q8/Q9/Q11/Q14/Q16/Q20/Q21 re-expressions (SURVEY.md §2.10 ad-hoc
# surface; the reference has none of these, but a warehouse "flexible enough
# to answer questions that have not yet been defined" — reference
# README.md:65 — must plan them well). Adapted to the driver schema: no
# partsupp table (Q9/Q11/Q16/Q20 pivot to lineitem-derived equivalents), no
# commit/receipt dates (Q21 defines late as shipped >60 days after order).
@query(
    "volume_shipping_q7",
    oracle="""
    SELECT sn.n_name AS supp_nation,
           cn.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INTEGER) AS ship_year,
           sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 10000)
                    AS BIGINT)) / 10000.0 AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation cn ON c.c_nationkey = cn.n_nationkey
    WHERE sn.n_name IN ('NATION_1', 'NATION_2')
      AND cn.n_name IN ('NATION_1', 'NATION_2')
      AND sn.n_name <> cn.n_name
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 3
    """,
)
def volume_shipping_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bidirectional trade volume between two nations by ship
    year. Scale shape: the 2-of-25-nations filter lands on supplier and
    customer BEFORE either fact is touched (nation is a broadcast few-row
    dim), so both fact joins see 2/25 of the key space; the only
    unavoidable big shuffle is lineitem⋈orders on orderkey. The date
    range is a plain pushdown predicate on the lineitem scan."""
    nations = table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    supp = (
        table(spark, sf_dir, "supplier")
        .join(broadcast(nations), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        table(spark, sf_dir, "customer")
        .join(broadcast(nations), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    # Join orders⋈cust BEFORE the orderkey shuffle: left-deep
    # ((li⋈supp)⋈orders)⋈cust would shuffle EVERY order into the
    # fact join and only then drop 23/25 of them at the customer
    # step — pre-filtering both sides cuts the big shuffle's payload
    # to the 2-nation slice on each side.
    orders_2n = orders.join(cust, F.col("o_custkey") == F.col("c_custkey"))
    # Project to the four needed columns BEFORE the orderkey exchange
    # (r13, guide §2.3 "project before the exchange"): the year and
    # the fixed-point row revenue replace the timestamp + two doubles
    # the r12 form shuffled (floor-per-row-then-sum == _fixed_sum, so
    # the result is byte-identical). Measured 1.01s -> 0.80s at sf0.1;
    # the (orderkey, supp_nation, year) pre-aggregate variant measured
    # WORSE (0.95s) — ~1.2 lines per order-supplier leaves the combine
    # nothing to combine, the q21 lesson again.
    left = li.join(supp, F.col("l_suppkey") == F.col("s_suppkey")).select(
        "l_orderkey",
        "supp_nation",
        F.year("l_shipdate").alias("ship_year"),
        F.floor(revenue * 10000).cast("bigint").alias("rev_fp"),
    )
    return (
        left.join(orders_2n, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", "ship_year")
        .agg((F.sum("rev_fp") / F.lit(10000.0)).alias("revenue"))
    )


@query(
    "market_share_q8",
    oracle="""
    SELECT CAST(year(o.o_orderdate) AS INTEGER) AS order_year,
           sum(CAST(floor(CASE WHEN sn.n_name = 'NATION_5'
                               THEN l.l_extendedprice * (1 - l.l_discount)
                               ELSE 0 END * 10000) AS BIGINT)) / 10000.0
               AS nation_revenue,
           sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 10000)
                    AS BIGINT)) / 10000.0 AS total_revenue
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation cn ON c.c_nationkey = cn.n_nationkey
    JOIN region r ON cn.n_regionkey = r.r_regionkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    WHERE r.r_name = 'ASIA'
      AND p.p_type = 'PROMO'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY 1
    """,
)
def market_share_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's share of a region's promo-part revenue per
    year, returned as (nation_revenue, total_revenue) exact fixed-point
    pairs (the caller divides; shipping both sums keeps the oracle
    hash-exact where a double division ratio would still be fine but a
    single CASE'd sum is clearer to verify). Scale shape: the selective
    p_type filter reduces lineitem via the partkey join first; region⋈
    nation collapses to a broadcast before customer; supplier-nation
    lookup is a broadcast; the fact-fact orderkey shuffle happens on
    promo lines only (1/6 of lineitem)."""
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cust_nations = (
        table(spark, sf_dir, "nation")
        .join(broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(F.col("n_nationkey").alias("cn_key"))
    )
    cust = (
        table(spark, sf_dir, "customer")
        .join(broadcast(cust_nations), F.col("c_nationkey") == F.col("cn_key"))
        .select("c_custkey")
    )
    supp = (
        table(spark, sf_dir, "supplier")
        .join(
            broadcast(table(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    promo_parts = table(spark, sf_dir, "part").filter(
        F.col("p_type") == "PROMO"
    ).select("p_partkey")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nation_rev = F.when(F.col("supp_nation") == "NATION_5", revenue).otherwise(
        F.lit(0.0)
    )
    return (
        li.join(promo_parts, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            _fixed_sum(nation_rev, "nation_revenue"),
            _fixed_sum(revenue, "total_revenue"),
        )
    )


@query(
    "product_profit_q9",
    oracle="""
    SELECT n.n_name AS supp_nation,
           CAST(year(o.o_orderdate) AS INTEGER) AS order_year,
           sum(CAST(floor((l.l_extendedprice * (1 - l.l_discount)
                           - p.p_retailprice * l.l_quantity * 0.01) * 10000)
                    AS BIGINT)) / 10000.0 AS profit
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE p.p_type = 'STANDARD'
    GROUP BY 1, 2
    """,
)
def product_profit_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 adapted (no partsupp: supply cost modeled as 1% of
    retail price per unit): profit by supplier nation and order year over
    one part type. Scale shape: part filter joins first (prunes
    lineitem on the partkey shuffle), supplier→nation is a broadcast
    chain, then one orderkey fact-fact shuffle, then an agg whose group
    count (25 nations × years) is tiny."""
    parts = table(spark, sf_dir, "part").filter(
        F.col("p_type") == "STANDARD"
    ).select("p_partkey", "p_retailprice")
    supp = (
        table(spark, sf_dir, "supplier")
        .join(
            broadcast(table(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice", "l_discount",
    )
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity") * F.lit(0.01)
    )
    return (
        li.join(parts, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("supp_nation", F.year("o_orderdate").alias("order_year"))
        .agg(_fixed_sum(profit, "profit"))
    )


@query(
    "top_revenue_parts_q11",
    oracle="""
    WITH per_part AS (
        SELECT l_partkey,
               sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000)
                        AS BIGINT)) AS rev_fp
        FROM lineitem GROUP BY 1
    )
    SELECT l_partkey, rev_fp / 10000.0 AS part_revenue
    FROM per_part
    WHERE rev_fp > (SELECT 0.0008 * sum(rev_fp) FROM per_part)
    """,
)
def top_revenue_parts_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 adapted (no partsupp: "important stock" becomes parts
    whose revenue exceeds a fixed fraction of GLOBAL revenue). The
    scalar-subquery shape: one partkey agg over the fact, a 1-row global
    total derived from the SAME aggregate (no second fact scan), cross
    joined (broadcast of one row) as the HAVING threshold. The fraction
    makes the predicate scale-invariant — at any SF it selects the same
    share of parts, unlike an absolute cutoff."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_discount"
    )
    rev_fp = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
    ).cast("bigint")
    per_part = li.groupBy("l_partkey").agg(F.sum(rev_fp).alias("rev_fp"))
    total = per_part.agg(
        (F.sum("rev_fp") * F.lit(0.0008)).alias("threshold_fp")
    )
    return (
        per_part.join(broadcast(total))
        .filter(F.col("rev_fp") > F.col("threshold_fp"))
        .select(
            "l_partkey",
            (F.col("rev_fp") / F.lit(10000.0)).alias("part_revenue"),
        )
    )


@query(
    "promo_revenue_q14",
    oracle="""
    SELECT sum(CAST(floor(CASE WHEN p.p_type = 'PROMO'
                               THEN l.l_extendedprice * (1 - l.l_discount)
                               ELSE 0 END * 10000) AS BIGINT)) / 10000.0
               AS promo_revenue,
           sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 10000)
                    AS BIGINT)) / 10000.0 AS total_revenue
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-03-01'
      AND l.l_shipdate < TIMESTAMP '1997-04-01'
    """,
)
def promo_revenue_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo vs total revenue for one ship month, returned as
    the exact fixed-point pair (promo percent = 100*promo/total is the
    caller's one division). Scale shape: the month predicate is a
    parquet-pushdown range on the lineitem scan (the dominant filter
    axis the layout module clusters on), so the partkey join sees only
    that month's lines; part side carries just (p_partkey, p_type)."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    ).select("l_partkey", "l_extendedprice", "l_discount")
    parts = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", revenue).otherwise(F.lit(0.0))
    return (
        li.join(parts, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            _fixed_sum(promo, "promo_revenue"),
            _fixed_sum(revenue, "total_revenue"),
        )
    )


@query(
    "supplier_part_counts_q16",
    oracle="""
    SELECT p.p_brand, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#3' AND p.p_type <> 'PROMO'
    GROUP BY 1, 2
    """,
)
def supplier_part_counts_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 adapted (no partsupp: supplier-per-part relationships
    come from shipped lineitems). Distinct-count of suppliers per
    (brand, size) with NOT-filters on the part side. Scale shape: the
    part-side exclusions prune before the fact join; countDistinct
    becomes a two-phase Expand aggregate — both shuffles are on bounded
    key spaces (brand × size, then + suppkey)."""
    parts = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#3") & (F.col("p_type") != "PROMO")
    ).select("p_partkey", "p_brand", "p_size")
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(parts, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "promo_part_suppliers_q20",
    oracle="""
    WITH promo_qty AS (
        SELECT l.l_suppkey,
               sum(CAST(floor(l.l_quantity * 10000) AS BIGINT)) AS qty_fp
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE p.p_type = 'PROMO'
          AND l.l_shipdate >= TIMESTAMP '1997-01-01'
          AND l.l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY 1
    )
    SELECT s.s_name, n.n_name AS supp_nation, q.qty_fp / 10000.0 AS promo_qty
    FROM promo_qty q
    JOIN supplier s ON q.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE q.qty_fp > (SELECT 1.5 * avg(qty_fp) FROM promo_qty)
    """,
)
def promo_part_suppliers_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 adapted (no partsupp availqty: "excess stock" becomes
    suppliers whose promo-part shipped quantity in a year exceeds 1.5×
    the average across suppliers — relative like the original's
    0.5×sum form, so it stays selective at every SF). Scale shape:
    part-type filter joins first, one suppkey agg (bounded key space),
    1-row average broadcast, then supplier/nation broadcast lookups."""
    promo_parts = table(spark, sf_dir, "part").filter(
        F.col("p_type") == "PROMO"
    ).select("p_partkey")
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_partkey", "l_suppkey", "l_quantity")
    qty_fp = F.floor(F.col("l_quantity") * 10000).cast("bigint")
    promo_qty = (
        li.join(promo_parts, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum(qty_fp).alias("qty_fp"))
    )
    threshold = promo_qty.agg((F.avg("qty_fp") * F.lit(1.5)).alias("thr"))
    supp = (
        table(spark, sf_dir, "supplier")
        .join(
            broadcast(table(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", F.col("n_name").alias("supp_nation"))
    )
    return (
        promo_qty.join(broadcast(threshold))
        .filter(F.col("qty_fp") > F.col("thr"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_name",
            "supp_nation",
            (F.col("qty_fp") / F.lit(10000.0)).alias("promo_qty"),
        )
    )


@query(
    "sole_late_supplier_q21",
    oracle="""
    WITH per_os AS (
        SELECT l.l_orderkey, l.l_suppkey,
               max(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                        THEN 1 ELSE 0 END) AS is_late
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderstatus = 'F'
        GROUP BY 1, 2
    ),
    per_o AS (
        SELECT l_orderkey,
               count(*) AS n_supp,
               CAST(sum(is_late) AS BIGINT) AS n_late
        FROM per_os GROUP BY 1
    )
    SELECT s.s_name, count(*) AS numwait
    FROM per_os x
    JOIN per_o o ON x.l_orderkey = o.l_orderkey
    JOIN supplier s ON x.l_suppkey = s.s_suppkey
    WHERE x.is_late = 1 AND o.n_supp >= 2 AND o.n_late = 1
    GROUP BY 1
    """,
)
def sole_late_supplier_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 adapted (no commit/receipt dates: "late" = shipped more
    than 60 days after the order date): suppliers who were the ONLY late
    shipper on a finished multi-supplier order. The EXISTS/NOT-EXISTS
    pair of the original is re-expressed as ONE (order, supplier)
    aggregate followed by a per-order aggregate — a self-join of the
    aggregate against its own groupBy would compute the fact join twice
    (no Exchange reuse survives differing column pruning; verified).
    Scale shape (r13): ONE orderkey shuffle over the joined fact serves
    BOTH aggregation levels — hash-partitioning on l_orderkey satisfies
    the (l_orderkey, l_suppkey) clustering because it is a subset of
    the group keys, so the pair agg, the per-order agg, and the sole-
    late-supplier pick all run in the post-shuffle stage with no second
    Exchange and no Sort (the r12 form paid a second full shuffle of
    the pair relation to move from (orderkey, suppkey) partitioning to
    the window's orderkey partitioning, plus the window's sort). The
    map-side combine the explicit repartition gives up was already
    measured worthless here (pairs average ~1.5 lines, r10 probe: the
    pre-agg form ran ~2x WORSE at 40x), and the shuffle carries only
    (orderkey, suppkey, late-flag). RepartitionByExpression without an
    explicit partition count stays AQE-coalescible, so the shuffle
    width remains scale-adaptive."""
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
        F.lit(1),
    ).otherwise(F.lit(0))
    # Join-first (non-'F' orders' lines drop before any aggregation),
    # project to the three shuffle columns, then ONE explicit orderkey
    # partitioning shared by every downstream per-order step.
    per_os = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select("l_orderkey", "l_suppkey", late.alias("late_flag"))
        .repartition(F.col("l_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("late_flag").alias("is_late"))
    )
    per_o = per_os.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"),
        F.sum("is_late").cast("bigint").alias("n_late"),
        # With n_late = 1 this is exactly the one late supplier.
        F.max(F.when(F.col("is_late") == 1, F.col("l_suppkey"))).alias(
            "late_supp"
        ),
    )
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        per_o.filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
        .join(supp, F.col("late_supp") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


@query(
    "cheapest_supplier_q2",
    oracle="""
    WITH unit AS (
        SELECT l_partkey, l_suppkey,
               min(floor(l_extendedprice / l_quantity * 10000) / 10000.0)
                   AS unit_price
        FROM lineitem GROUP BY 1, 2
    ),
    regional AS (
        SELECT u.l_partkey, u.l_suppkey, u.unit_price, s.s_name, n.n_name
        FROM unit u
        JOIN supplier s ON u.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'EUROPE'
    ),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY l_partkey
                 ORDER BY unit_price, l_suppkey) AS rk
        FROM regional
    )
    SELECT p.p_partkey, p.p_brand, ranked.s_name,
           ranked.n_name AS supp_nation, ranked.unit_price
    FROM ranked
    JOIN part p ON ranked.l_partkey = p.p_partkey
    WHERE ranked.rk = 1 AND p.p_size >= 40
    """,
)
def cheapest_supplier_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 adapted (no partsupp: the offered price becomes the
    minimum OBSERVED unit price per (part, supplier) from lineitem):
    for large parts, the cheapest European supplier. Per-group argmin
    via row_number with a deterministic tiebreak. Scale shape: one
    (partkey, suppkey) aggregate over the fact (map-side partial min),
    supplier/nation/region collapse to a broadcast BEFORE the window,
    the region filter prunes 4/5 of pairs ahead of the partkey
    shuffle, and the part join is key-equi after rank-1 filtering
    (WindowGroupLimit pushes the rank predicate below the sort)."""
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    supp = (
        table(spark, sf_dir, "supplier")
        .join(
            broadcast(
                table(spark, sf_dir, "nation").join(
                    broadcast(region),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", F.col("n_name").alias("supp_nation"))
    )
    unit = (
        table(spark, sf_dir, "lineitem")
        .select(
            "l_partkey",
            "l_suppkey",
            (
                F.floor(F.col("l_extendedprice") / F.col("l_quantity") * 10000)
                / F.lit(10000.0)
            ).alias("up"),
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("up").alias("unit_price"))
    )
    w = Window.partitionBy("l_partkey").orderBy("unit_price", "l_suppkey")
    ranked = (
        unit.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
    )
    parts = table(spark, sf_dir, "part").filter(F.col("p_size") >= 40).select(
        "p_partkey", "p_brand"
    )
    return ranked.join(parts, F.col("l_partkey") == F.col("p_partkey")).select(
        "p_partkey", "p_brand", "s_name", "supp_nation", "unit_price"
    )


@query(
    "customer_spend_quartiles_distributed",
    oracle="""
    WITH spend AS (
        SELECT o_custkey AS custkey,
               sum(CAST(floor(o_totalprice * 10000) AS BIGINT)) AS spend_fp
        FROM orders
        GROUP BY 1
    ),
    n AS (SELECT count(*) AS n FROM spend),
    r AS (
        SELECT custkey, spend_fp,
               row_number() OVER (ORDER BY spend_fp DESC, custkey) AS rnk
        FROM spend
    )
    SELECT custkey,
           spend_fp / 10000.0 AS total_spend,
           CAST(rnk AS BIGINT) AS spend_rank,
           CAST(floor(((rnk - 1) * 4) / n.n) + 1 AS INTEGER) AS quartile
    FROM r CROSS JOIN n
    """,
)
def customer_spend_quartiles_distributed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EXACT global spend rank + equal-count quartile WITHOUT a
    single-partition sort — the scale-safe answer to
    ``customer_spend_quartiles``'s acknowledged weakness (ntile needs
    every row through one task).

    Mechanics: range-repartition on the total order (spend desc,
    custkey), rank WITHIN each partition, then add per-partition
    offsets. The offsets come from a per-partition count — a frame
    bounded by the partition count (32 here, a few thousand on a real
    cluster), never by the data — so the only whole-data costs are one
    range Exchange and in-partition sorts, exactly what a distributed
    sort costs, spread over every core. The final rank is independent
    of WHERE the range boundaries land (the order is total, so any
    boundary placement yields the same global positions), which is why
    sampled range boundaries can't break determinism. Quartile is rank
    arithmetic (1 + floor((rank-1)*4/n)) instead of the ntile builtin,
    so Spark and DuckDB compute the identical IEEE expression.
    test_plan_shapes asserts NO SinglePartition Exchange on the spend
    axis and that the two consumers of the range shuffle reuse one
    Exchange."""
    orders = table(spark, sf_dir, "orders")
    spend = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.sum(F.floor(F.col("o_totalprice") * 10000).cast("bigint")).alias(
            "spend_fp"
        )
    )
    # Local ranks WITHOUT a window: after the range Exchange + an
    # in-partition sort, monotonically_increasing_id() encodes
    # (partition_id << 33) | row_index_in_partition — so pid and local
    # rank are bit-slices of one map-side expression and the Window's
    # redundant hashpartitioning(_pid) re-shuffle of the whole frame
    # never happens. persist pins ONE materialization of the ranged
    # frame so the offsets branch reads the identical partitioning
    # (and the range shuffle runs once, not once per consumer).
    ranked = scoped_persist(
        spend.repartitionByRange(F.col("spend_fp").desc(), F.col("custkey").asc())
        .sortWithinPartitions(F.desc("spend_fp"), F.asc("custkey"))
        .withColumn("_mid", F.monotonically_increasing_id())
        .withColumn("_pid", F.shiftright(F.col("_mid"), 33))
        .withColumn(
            "_lrank", F.col("_mid").bitwiseAND(F.lit((1 << 33) - 1)) + 1
        ),
        "customer_spend_quartiles_distributed.ranked",
    )
    # Offsets: one row per partition; the windowed prefix sum runs on a
    # frame whose size is the PARTITION count, not the row count.
    counts = ranked.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
    offset_w = (
        Window.orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "_pid",
        F.coalesce(F.sum("_cnt").over(offset_w), F.lit(0)).alias("_offset"),
    )
    # Total n from the same 32-row counts frame — no third scan of the
    # fact for a COUNT the partition counts already contain.
    n_frame = counts.agg(F.sum("_cnt").alias("_n"))
    return (
        ranked.join(broadcast(offsets), "_pid")
        .join(broadcast(n_frame))
        .select(
            "custkey",
            (F.col("spend_fp") / F.lit(10000.0)).alias("total_spend"),
            (F.col("_offset") + F.col("_lrank")).cast("bigint").alias("spend_rank"),
            (
                F.floor(((F.col("_offset") + F.col("_lrank") - 1) * 4) / F.col("_n"))
                + 1
            )
            .cast("int")
            .alias("quartile"),
        )
    )


@query(
    "revenue_trend_by_nation",
    oracle="""
    WITH m AS (
        SELECT c.c_nationkey,
               CAST((year(o.o_orderdate) - 1990) * 12 + month(o.o_orderdate) AS BIGINT) AS x,
               CAST(sum(CAST(floor(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2
    ),
    fit AS (
        SELECT c_nationkey,
               CAST(count(*) AS BIGINT) AS n_months,
               CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * y) AS BIGINT) AS sxy,
               CAST(sum(x * x) AS BIGINT) AS sxx
        FROM m GROUP BY 1
    )
    SELECT n.n_name,
           f.n_months,
           f.sy / 100.0 AS total_revenue,
           floor((f.n_months * f.sxy - f.sx * f.sy)
                 / (f.n_months * f.sxx - f.sx * f.sx) * 10000) / 10000.0
               AS slope_cents
    FROM fit f JOIN nation n ON f.c_nationkey = n.n_nationkey
    """,
)
def revenue_trend_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation monthly-revenue TREND via closed-form least squares —
    the grouped-regression capability (forecasting, anomaly triage,
    cohort health) expressed without any ML library: slope =
    (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2) over (month-index, monthly-cents)
    points. Every moment is an exact int64 sum (x is a month ordinal,
    y is fixed-point cents), so the regression is order-independent
    and hash-verifiable; the single double division happens once per
    nation at the very end (floor-truncated to 4 decimals, both
    engines identically).

    Scale shape: the fact collapses to (custkey-nation, month) partial
    sums before anything wide — the first agg keys on (nationkey,
    month) AFTER the customer join (customer is threshold/AQE
    broadcast like every dim chain here), so the only corpus-sized
    Exchange carries month-grain partials; the regression itself runs
    on nations x months rows. Denominator is zero only when a nation
    has ONE distinct month; ``try_divide`` makes that a NULL slope
    (matching DuckDB's x/0 -> NULL) instead of the ANSI
    DIVIDE_BY_ZERO error plain division would raise."""
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    # x anchored at 1990: the OLS slope is invariant under any affine
    # shift of x, and a small ordinal (tens, not ~24000) keeps every
    # cross-moment far from int64 overflow — with the raw year*12 form,
    # n*sxy and sx*sy both reached ~7e18 at the 40x probe and threw
    # ARITHMETIC_OVERFLOW under ANSI mode.
    x = ((F.year("o_orderdate") - 1990) * 12 + F.month("o_orderdate")).cast(
        "long"
    )
    y_cents = F.floor(F.col("o_totalprice") * 100).cast("long")
    m = (
        orders.join(
            customer.select("c_custkey", "c_nationkey"),
            orders.o_custkey == F.col("c_custkey"),
        )
        .groupBy("c_nationkey", x.alias("x"))
        .agg(F.sum(y_cents).alias("y"))
    )
    fit = m.groupBy("c_nationkey").agg(
        F.count("*").alias("n_months"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = (
        F.floor(
            F.try_divide(
                F.col("n_months") * F.col("sxy") - F.col("sx") * F.col("sy"),
                F.col("n_months") * F.col("sxx") - F.col("sx") * F.col("sx"),
            )
            * 10000
        )
        / F.lit(10000.0)
    )
    return (
        fit.join(
            broadcast(nation), fit.c_nationkey == nation.n_nationkey
        ).select(
            "n_name",
            "n_months",
            (F.col("sy") / F.lit(100.0)).alias("total_revenue"),
            slope.alias("slope_cents"),
        )
    )


_FK_EDGES = [
    ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"),
]


def _fk_edge_sql(rel: str, child: str, fk: str, parent: str, pk: str) -> str:
    return f"""
    SELECT '{rel}' AS relationship,
           CAST(sum(c.cnt) AS BIGINT) AS total,
           CAST(sum(CASE WHEN c.fk IS NULL THEN c.cnt ELSE 0 END) AS BIGINT)
               AS null_fk,
           CAST(sum(CASE WHEN c.fk IS NOT NULL AND p.pk IS NULL
                         THEN c.cnt ELSE 0 END) AS BIGINT) AS orphans
    FROM (SELECT {fk} AS fk, count(*) AS cnt FROM {child} GROUP BY 1) c
    LEFT JOIN (SELECT DISTINCT {pk} AS pk FROM {parent}) p ON c.fk = p.pk
    """


@query(
    "fk_violations",
    oracle=" UNION ALL ".join(_fk_edge_sql(*e) for e in _FK_EDGES),
)
def fk_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity report over every FK edge of the star
    schema in one frame — the warehouse-grade extension of the
    reference's data-quality layer (plugins/operators/data_quality.py:
    11-40 checks NULLs and row counts; a warehouse must also prove no
    fact row points at a missing dimension row, since neither Redshift
    nor Spark ENFORCES the declared PK/FK constraints). Per edge:
    total child rows, NULL foreign keys, and orphans (non-null FK with
    no parent).

    Scale shape per edge: the child pre-aggregates to DISTINCT FK
    values with counts (the shuffle carries one row per distinct key,
    not per fact row — the same pre-agg-before-join discipline as
    visits_by_region), then left-joins the parent's key projection
    (broadcast where the dim is bounded, AQE otherwise) and reduces to
    ONE summary row. The seven edges are independent subtrees unioned
    at the end — on a cluster they run concurrently."""
    out = None
    for rel, child, fk, parent, pk in _FK_EDGES:
        c = (
            table(spark, sf_dir, child)
            .groupBy(F.col(fk).alias("fk"))
            .agg(F.count("*").alias("cnt"))
        )
        p = table(spark, sf_dir, parent).select(F.col(pk).alias("pk")).distinct()
        edge = (
            c.join(p, c.fk == p.pk, "left")
            .agg(
                F.sum("cnt").alias("total"),
                F.sum(F.when(F.col("fk").isNull(), F.col("cnt")).otherwise(0)).alias(
                    "null_fk"
                ),
                F.sum(
                    F.when(
                        F.col("fk").isNotNull() & F.col("pk").isNull(),
                        F.col("cnt"),
                    ).otherwise(0)
                ).alias("orphans"),
            )
            .select(
                F.lit(rel).alias("relationship"), "total", "null_fk", "orphans"
            )
        )
        out = edge if out is None else out.unionByName(edge)
    return out


@query(
    "segment_zscore_pandas",
    oracle="""
    WITH x AS (
        SELECT c_custkey, c_mktsegment,
               CAST(floor(c_acctbal * 100) AS BIGINT) AS xfp
        FROM customer
        WHERE c_acctbal IS NOT NULL AND c_mktsegment IS NOT NULL
    ),
    m AS (
        SELECT c_mktsegment,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(xfp) AS BIGINT) AS s1,
               CAST(sum(xfp * xfp) AS BIGINT) AS s2
        FROM x GROUP BY 1
    )
    SELECT x.c_custkey, x.c_mktsegment,
           CASE WHEN m.n * m.s2 - m.s1 * m.s1 = 0 THEN 0.0
                ELSE floor(
                    (CAST(x.xfp AS DOUBLE)
                     - CAST(m.s1 AS DOUBLE) / CAST(m.n AS DOUBLE))
                    / sqrt(CAST(m.n * m.s2 - m.s1 * m.s1 AS DOUBLE)
                           / CAST(m.n * m.n AS DOUBLE))
                    * 10000) / 10000.0
           END AS z
    FROM x JOIN m USING (c_mktsegment)
    """,
)
def segment_zscore_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-market-segment z-score of account balance computed INSIDE an
    Arrow ``applyInPandas`` grouped map — the driver-verified proof of
    the Python-escape-hatch machinery (the z-score itself has a JVM
    window twin, operators/grouped.py; THIS registration exists so the
    Arrow path's numerics are oracle-checked end-to-end, the same
    discipline the multimodal family follows).

    Engine-exactness inside Python: balances are floored to int64
    cents, the group moments S1/S2 are integer sums (order-independent
    — the rows arrive in arbitrary shuffle order, so a float
    ``pandas.std`` would not hash-match), the variance numerator
    n*S2 - S1^2 is exact Python big-int arithmetic (S1^2 exceeds int64
    at corpus scale; S2's own int64 numpy sum holds to ~1e9 rows/group
    at 1e6-cent balances — beyond that, chunk or object-dtype it), and
    the final float sequence — double(num) /
    double(den), then (x - mean)/sqrt(var), floor-truncated to 4
    decimals — is written in the identical IEEE operation order as the
    oracle SQL (conversions and divisions are each correctly rounded,
    so same order means same bits). Zero-variance groups emit 0.0.

    Scale shape: one Exchange on the group key; each group must fit an
    executor (the applyInPandas contract — key granularity is the
    knob). For 100 TB, the window twin is the production path; this is
    the template for per-group logic windows genuinely can't express."""
    import math

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    # NULL balance has no z-score (floor(NaN).astype(int64) crashed the
    # Arrow worker); NULL segment has no group (Spark groupBy keeps a
    # NULL-key group, the oracle's equi-join drops it — join semantics
    # win, as for cohorts). r8 adversarial audit.
    cust = (
        table(spark, sf_dir, "customer")
        .filter(
            F.col("c_acctbal").isNotNull() & F.col("c_mktsegment").isNotNull()
        )
        .select("c_custkey", "c_mktsegment", "c_acctbal")
    )
    schema = StructType(
        [
            StructField("c_custkey", LongType()),
            StructField("c_mktsegment", StringType()),
            StructField("z", DoubleType()),
        ]
    )

    def z(pdf: pd.DataFrame) -> pd.DataFrame:
        x = np.floor(pdf["c_acctbal"].to_numpy() * 100).astype("int64")
        n = len(x)
        s1 = int(x.sum())
        s2 = int((x * x).sum())
        num = n * s2 - s1 * s1
        if num == 0:
            zs = np.zeros(n)
        else:
            mean = float(s1) / float(n)
            var = float(num) / float(n * n)
            zs = np.floor((x - mean) / math.sqrt(var) * 10000) / 10000.0
        return pd.DataFrame(
            {
                "c_custkey": pdf["c_custkey"],
                "c_mktsegment": pdf["c_mktsegment"],
                "z": zs,
            }
        )

    return cust.groupBy("c_mktsegment").applyInPandas(z, schema)


@query(
    "revenue_by_segment_salted",
    oracle="""
    SELECT c.c_mktsegment,
           CAST(count(*) AS BIGINT) AS orders,
           CAST(sum(CAST(floor(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
               / 100.0 AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1
    """,
)
def revenue_by_segment_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment revenue computed through the SALTED join path — the
    skew-mitigation operator (operators/skew.py: hot keys spread over 8
    salt partitions, the dim side replicated per salt) driver-verified
    against the plain-join oracle, which is exactly the operator's
    contract: result equals the unsalted join bit-for-bit. The salt
    mechanics live in the operator and are unit-tested for hot-key
    spreading (test_skew_aqe); THIS row proves the end-to-end numbers.
    At 100 TB reach for this when one customer owns a pathological
    share of orders and AQE's skew-join split isn't available or the
    skew is in an aggregation upstream of it."""
    orders = table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"),
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("price_fp"),
        "o_orderkey",
    )
    cust = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_mktsegment"
    )
    from data_engineering_capstone_project_spark.operators.skew import salted_join

    j = salted_join(orders, cust, on="custkey", salt_by=["o_orderkey"], salts=8)
    return j.groupBy("c_mktsegment").agg(
        F.count("*").alias("orders"),
        (F.sum("price_fp") / F.lit(100.0)).alias("revenue"),
    )


# Skew DIAGNOSIS companion to the salted-join operator: before
# reaching for salting/AQE-skew-join, a pipeline owner needs to know
# WHICH keys are hot and how much mass they carry.
@query(
    "heavy_hitter_custkeys",
    oracle="""
    WITH c AS (
        SELECT o_custkey, count(*) AS orders
        FROM orders GROUP BY 1
    ),
    t AS (SELECT CAST(sum(orders) AS BIGINT) AS total FROM c)
    SELECT o_custkey, orders,
           (orders * 1000000 // t.total) / 10000.0 AS pct_of_rows
    FROM c, t
    ORDER BY orders DESC, o_custkey ASC
    LIMIT 20
    """,
)
def heavy_hitter_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 hottest join keys with their share of total rows — the
    skew report you run BEFORE deciding whether a join needs salting
    (operators/skew.py) or AQE's skew split: a key carrying >1% of a
    100 TB fact is a straggler task waiting to happen. Exact, not
    sketched: one keyed count (map-side partial combine collapses the
    hot keys by definition — the skew that makes the join slow makes
    this diagnosis cheap), a broadcast 1-row total, and the top-20
    plans as TakeOrderedAndProject (running top-k per partition,
    never a global sort). Share arithmetic is int64 floor-division,
    engine-exact; overflow needs a single key's count past 9.2e12
    (orders x 1e6 under int64) — coarsen the fixed point before any
    real table gets there."""
    orders = table(spark, sf_dir, "orders")
    c = orders.groupBy("o_custkey").agg(F.count("*").alias("orders"))
    t = c.agg(F.sum("orders").cast("bigint").alias("total"))
    return (
        c.join(broadcast(t))
        .select(
            "o_custkey",
            "orders",
            (F.expr("orders * 1000000 div total") / F.lit(10000.0)).alias(
                "pct_of_rows"
            ),
        )
        .orderBy(F.desc("orders"), F.asc("o_custkey"))
        .limit(20)
    )


@query(
    "snapshot_diff",
    oracle="""
    WITH old AS (
        SELECT o_orderkey AS k,
               CAST(floor(o_totalprice * 100) AS BIGINT) AS v
        FROM orders
    ),
    new AS (
        SELECT o_orderkey AS k,
               CASE WHEN o_orderkey % 100 = 7
                    THEN CAST(floor(o_totalprice * 100) AS BIGINT) + 100
                    ELSE CAST(floor(o_totalprice * 100) AS BIGINT) END AS v
        FROM orders WHERE o_orderkey % 100 <> 13
        UNION ALL
        SELECT o_orderkey + 10000000000 AS k,
               CAST(floor(o_totalprice * 100) AS BIGINT) AS v
        FROM orders WHERE o_orderkey % 100 = 21
    )
    SELECT COALESCE(old.k, new.k) AS o_orderkey,
           CASE WHEN old.k IS NULL THEN 'insert'
                WHEN new.k IS NULL THEN 'delete'
                ELSE 'update' END AS change_type
    FROM old FULL OUTER JOIN new ON old.k = new.k
    WHERE old.k IS NULL OR new.k IS NULL OR old.v <> new.v
    """,
)
def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-style reconciliation between two table snapshots: which
    keys were inserted, deleted, or changed — the diff every
    migration/backfill/replication pipeline runs before trusting a
    copy, and the audit log a merge pipeline emits. The "new" snapshot
    is derived deterministically from orders (drop keys %100==13,
    bump totalprice by $1 for %100==7, insert 10B-shifted copies of
    %100==21) so both engines diff the same pair. The 10B insert
    shift sits far ABOVE any plausible scale-probe replica stride
    (i x 10M would need i > 1000; probes run i < 160): inserted keys
    never collide with a neighboring replica's real keys — an
    earlier 10M shift made the probe measure a diff whose insert leg
    had mostly cancelled against the next replica, and the 500M
    shift it was first raised to still collided from the 80x leg up. Rows that are
    identical in both snapshots are filtered OUT before any
    materialization — the diff's output is change-sized, not
    table-sized.

    Scale shape: one full-outer key join of the two snapshots (at
    100 TB: co-partition or co-bucket both sides on the key — the
    bucketed-pair machinery removes this Exchange entirely) with the
    value comparison on a fixed-point row fingerprint; here the
    fingerprint is the single business column, in general concat the
    compared columns into one hash BEFORE the join so the shuffle
    carries (key, hash), never wide rows. Output cardinality is the
    change count — at a healthy 0.1% daily churn, 1000x smaller than
    either input."""
    orders = table(spark, sf_dir, "orders")
    fp = F.floor(F.col("o_totalprice") * 100).cast("bigint")
    old = orders.select(F.col("o_orderkey").alias("k"), fp.alias("v"))
    mod = F.pmod(F.col("o_orderkey"), F.lit(100))
    new = (
        orders.filter(mod != 13)
        .select(
            F.col("o_orderkey").alias("k"),
            F.when(mod == 7, fp + 100).otherwise(fp).alias("v"),
        )
        .unionByName(
            orders.filter(mod == 21).select(
                (F.col("o_orderkey") + 10_000_000_000).alias("k"), fp.alias("v")
            )
        )
    )
    o, n = old.alias("o"), new.alias("n")
    joined = o.join(n, F.col("o.k") == F.col("n.k"), "full_outer")
    change = (
        F.when(F.col("o.k").isNull(), F.lit("insert"))
        .when(F.col("n.k").isNull(), F.lit("delete"))
        .otherwise(F.lit("update"))
    )
    return joined.filter(
        F.col("o.k").isNull()
        | F.col("n.k").isNull()
        | (F.col("o.v") != F.col("n.v"))
    ).select(
        F.coalesce(F.col("o.k"), F.col("n.k")).alias("o_orderkey"),
        change.alias("change_type"),
    )


@query(
    "co_ordered_parts",
    oracle="""
    WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM lineitem),
    pm AS (SELECT l_partkey, count(*) AS c FROM lp GROUP BY 1),
    freq AS (
        SELECT l_partkey FROM pm, n
        WHERE c >= greatest(2, n_orders // 1000)
    ),
    lpf AS (
        SELECT lp.l_orderkey, lp.l_partkey
        FROM lp JOIN freq USING (l_partkey)
    ),
    pairs AS (
        SELECT a.l_partkey AS p1, b.l_partkey AS p2, count(*) AS co
        FROM lpf a JOIN lpf b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
    )
    SELECT p1, p2, co,
           ((co * n.n_orders * 1000000) // (c1.c * c2.c))
               / 1000000.0 AS lift
    FROM pairs
    CROSS JOIN n
    JOIN pm c1 ON c1.l_partkey = p1
    JOIN pm c2 ON c2.l_partkey = p2
    ORDER BY co DESC, p1 ASC, p2 ASC
    LIMIT 20
    """,
)
def co_ordered_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket 2-itemset mining: the top-20 part pairs most
    often ordered together, with their lift (observed co-rate over
    the independence expectation) — the association-rule primitive
    behind "frequently bought together". Lift is computed in exact
    INTEGER division (``div`` in Spark, ``//`` in DuckDB — never a
    double divide, whose 2^53 mantissa cliff would corrupt the floor
    ~1000x below the int64 bound), so the ranking and values are
    engine-exact all the way to the documented overflow limit.

    Mining is restricted to FREQUENT parts — support >= max(2,
    0.1% of orders), the standard Apriori prefilter, applied as a
    broadcast semi-join on the catalog-sized frequent-part set
    BEFORE the pair explosion (the oracle mirrors the identical
    threshold). This is part of the query's declared semantics, not
    an approximation of it: a part below min-support cannot anchor an
    association rule worth acting on, and any pair containing it has
    co < min-support by the subset bound. Pruning before the
    self-join is what keeps the (p1, p2) grid from densifying as
    orders accumulate over a fixed catalog.

    Scale shape: the pair explosion is a per-order self-join — cost
    bounded by (lines per order choose 2), a CONSTANT per order (~21
    at TPC-H's <=7 lines), never a cross of the part catalog; one
    (p1, p2) Exchange carries partial co-counts; the part marginals
    frame is catalog-sized and joins after aggregation; the final
    top-20 plans as TakeOrderedAndProject. Overflow: co x n_orders x
    1e6 needs co x n_orders under 9.2e12 — at 1e10 orders coarsen the
    lift fixed point or compute lift on the top-k only (the rank
    itself never overflows: it is a plain count)."""
    li = table(spark, sf_dir, "lineitem")
    lp = li.select("l_orderkey", "l_partkey").distinct()
    # n_orders stays a 1-row FRAME joined in (broadcast), not a
    # driver-side collect — no extra job at plan-build time.
    n_frame = li.agg(F.count_distinct("l_orderkey").alias("n_orders"))
    pm = lp.groupBy("l_partkey").agg(F.count("*").alias("c"))
    # Apriori min-support prefilter: marginals stay the FULL counts
    # (lift needs the true support), only the pairing input shrinks.
    freq = (
        pm.join(broadcast(n_frame))
        .filter(
            F.col("c") >= F.greatest(F.lit(2), F.expr("n_orders div 1000"))
        )
        .select("l_partkey")
    )
    lpf = lp.join(broadcast(freq), "l_partkey", "left_semi")
    a = lpf.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("p1")
    )
    b = lpf.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("p2")
    )
    pairs = (
        a.join(b, "ok")
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count("*").alias("co"))
    )
    lift = (
        F.expr("(co * n_orders * 1000000L) div (c1 * c2)")
        / F.lit(1000000.0)
    )
    return (
        pairs.join(broadcast(n_frame))
        .join(
            pm.select(F.col("l_partkey").alias("p1"), F.col("c").alias("c1")),
            "p1",
        )
        .join(
            pm.select(F.col("l_partkey").alias("p2"), F.col("c").alias("c2")),
            "p2",
        )
        .select("p1", "p2", "co", lift.alias("lift"))
        .orderBy(F.desc("co"), F.asc("p1"), F.asc("p2"))
        .limit(20)
    )


# Per-column canonical profile expressions for orders_profile: numeric
# min/max are fixed-pointed to 2 decimals and rendered as integer
# strings, timestamps as epoch-second strings — the repo's
# engine-exactness recipe applied to a profile (a raw CAST(double AS
# STRING) renders differently in Spark vs DuckDB).
_PROFILE_COLS = [
    ("o_orderkey", "int"),
    ("o_custkey", "int"),
    ("o_orderstatus", "str"),
    ("o_totalprice", "num"),
    ("o_orderdate", "ts"),
    ("o_orderpriority", "str"),
]


def _profile_canon_sql(col: str, kind: str, agg: str) -> str:
    if kind == "num":
        return f"CAST(CAST(floor({agg}({col}) * 100) AS BIGINT) AS VARCHAR)"
    if kind == "ts":
        return f"strftime({agg}({col}), '%Y-%m-%d %H:%M:%S')"
    return f"CAST({agg}({col}) AS VARCHAR)"


_PROFILE_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS column_name,
           CAST(count(*) - count({c}) AS BIGINT) AS n_nulls,
           CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
           {_profile_canon_sql(c, k, 'min')} AS min_val,
           {_profile_canon_sql(c, k, 'max')} AS max_val
    FROM orders"""
    for c, k in _PROFILE_COLS
)


def _profile_canon(col: str, kind: str, fn) -> Column:
    if kind == "num":
        return F.floor(fn(F.col(col)) * 100).cast("bigint").cast("string")
    if kind == "ts":
        # NTZ-safe calendar rendering: date_format reads the naive
        # fields directly — no tz cast, so the value is identical
        # whatever timezone the (plain) driver session runs in.
        return F.date_format(fn(F.col(col)), "yyyy-MM-dd HH:mm:ss")
    if kind == "int":
        return fn(F.col(col)).cast("bigint").cast("string")
    return fn(F.col(col)).cast("string")


@query("orders_profile", oracle=_PROFILE_ORACLE)
def orders_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-profiling summary (the Deequ/Great-Expectations shape the
    reference's data_quality.py checks by hand, generalized): for
    every column of orders — null count, exact distinct count, and
    canonicalized min/max — one row per column, the frame a quality
    dashboard or schema-drift monitor consumes. Min/max are rendered
    through the engine-exact canon (fixed-point integers for numerics,
    epoch seconds for timestamps) so the profile hash-matches DuckDB.

    Scale shape: ONE wide aggregate over the table computes all 6x4
    statistics — the multiple count_distincts run as a single
    expand-based pass (6x map-side row fan-out, partial aggs, one
    Exchange), NOT one scan per column like a naive profiler; the
    1-row aggregate is then unpivoted driver-free via a 6-element
    explode. At 100 TB swap count_distinct for approx_count_distinct
    (HLL: one pass, no expand, mergeable) and keep the frame shape —
    the documented accuracy/cost dial, same trade as
    approx_distinct_parts vs kmv_distinct_users."""
    o = table(spark, sf_dir, "orders")
    aggs = []
    for c, k in _PROFILE_COLS:
        aggs += [
            (F.count(F.lit(1)) - F.count(F.col(c))).alias(f"nn_{c}"),
            F.count_distinct(F.col(c)).alias(f"nd_{c}"),
            _profile_canon(c, k, F.min).alias(f"mn_{c}"),
            _profile_canon(c, k, F.max).alias(f"mx_{c}"),
        ]
    wide = o.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col(f"nn_{c}").alias("n_nulls"),
                F.col(f"nd_{c}").alias("n_distinct"),
                F.col(f"mn_{c}").alias("min_val"),
                F.col(f"mx_{c}").alias("max_val"),
            )
            for c, _ in _PROFILE_COLS
        ]
    )
    return wide.select(F.explode(rows).alias("p")).select("p.*")


@query(
    "copurchase_triangles",
    oracle="""
    WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pm AS (SELECT l_partkey, count(*) AS c FROM lp GROUP BY 1),
    n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM lineitem),
    freq AS (
        SELECT pm.l_partkey FROM pm, n
        WHERE c >= greatest(2, n_orders // 1000)
    ),
    lpf AS (SELECT lp.* FROM lp JOIN freq USING (l_partkey)),
    pairs AS (
        SELECT a.l_partkey AS p1, b.l_partkey AS p2, count(*) AS co
        FROM lpf a JOIN lpf b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
    ),
    edges AS (SELECT p1, p2 FROM pairs WHERE co >= 2),
    deg AS (
        SELECT p, count(*) AS d FROM (
            SELECT p1 AS p FROM edges UNION ALL SELECT p2 FROM edges
        ) GROUP BY 1
    ),
    oe AS (
        SELECT CASE WHEN (d1.d < d2.d) OR (d1.d = d2.d AND e.p1 < e.p2)
                    THEN e.p1 ELSE e.p2 END AS u,
               CASE WHEN (d1.d < d2.d) OR (d1.d = d2.d AND e.p1 < e.p2)
                    THEN e.p2 ELSE e.p1 END AS v
        FROM edges e
        JOIN deg d1 ON d1.p = e.p1
        JOIN deg d2 ON d2.p = e.p2
    ),
    tri AS (
        SELECT o1.u AS a, o1.v AS b, o2.v AS c
        FROM oe o1
        JOIN oe o2 ON o1.u = o2.u AND o1.v < o2.v
        JOIN edges e ON e.p1 = o1.v AND e.p2 = o2.v
    )
    SELECT part, CAST(count(*) AS BIGINT) AS n_triangles FROM (
        SELECT a AS part FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
    ) GROUP BY 1
    ORDER BY n_triangles DESC, part ASC
    LIMIT 10
    """,
)
def copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting on the co-purchase graph — the clustering
    primitive behind community detection and recommender diversity
    ("parts bought together in cliques, not just pairs"). Nodes are
    frequent parts, edges are pairs co-ordered in >= 2 orders (the
    ``co_ordered_parts`` min-support discipline, so the graph stays
    catalog-sparse as orders accumulate); reports the top-10 parts by
    triangle participation.

    The algorithm is DEGREE-ORIENTED wedge closing (Chiba-Nishizeki /
    the MapReduce formulation of Suri & Vassilvitskii 2011): each
    edge is directed from its lower-degree endpoint (id tiebreak),
    which makes the orientation acyclic with per-node out-degree
    O(sqrt(E)) — so the wedge self-join (u,v)x(u,w) is bounded by
    sum-of-squared-OUT-degrees, immune to the hub-node blowup that
    kills id-oriented counting on skewed graphs (a degree-10^6 hub
    oriented by id creates 10^12 wedges; oriented by degree it
    creates ~E). Each triangle has exactly ONE node with two
    out-edges within it, so the wedge-close join counts every
    triangle exactly once, no division by 3 needed.

    Scale shape: edge building reuses the per-order self-join bound
    (lines-per-order choose 2, constant per order); the wedge join
    and the closing equi-join Exchange on edge keys — edges-sized,
    never catalog x catalog; degrees are a catalog-sized broadcast;
    top-10 plans as TakeOrderedAndProject."""
    li = table(spark, sf_dir, "lineitem")
    lp = li.select("l_orderkey", "l_partkey").distinct()
    n_frame = li.agg(F.count_distinct("l_orderkey").alias("n_orders"))
    pm = lp.groupBy("l_partkey").agg(F.count("*").alias("c"))
    freq = (
        pm.join(broadcast(n_frame))
        .filter(
            F.col("c") >= F.greatest(F.lit(2), F.expr("n_orders div 1000"))
        )
        .select("l_partkey")
    )
    lpf = lp.join(broadcast(freq), "l_partkey")
    a = lpf.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("p1")
    )
    b = lpf.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("p2")
    )
    # The edge list feeds FOUR consumers (both degree projections, the
    # orientation, and the closing join): without a persist the whole
    # per-order self-join subtree is recomputed once per reference —
    # 4-6x the corpus work, silently. scoped_persist caches it once,
    # edges-sized (the dedup-signature convention).
    edges = scoped_persist(
        a.join(b, "ok")
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count("*").alias("co"))
        .filter(F.col("co") >= 2)
        .select("p1", "p2"),
        "copurchase_edges",
    )
    deg = (
        edges.select(F.col("p1").alias("p"))
        .unionAll(edges.select(F.col("p2").alias("p")))
        .groupBy("p")
        .agg(F.count("*").alias("d"))
    )
    lower_first = (F.col("d1") < F.col("d2")) | (
        (F.col("d1") == F.col("d2")) & (F.col("p1") < F.col("p2"))
    )
    oe = (
        edges.join(
            broadcast(deg.select(F.col("p").alias("p1"), F.col("d").alias("d1"))),
            "p1",
        )
        .join(
            broadcast(deg.select(F.col("p").alias("p2"), F.col("d").alias("d2"))),
            "p2",
        )
        .select(
            F.when(lower_first, F.col("p1")).otherwise(F.col("p2")).alias("u"),
            F.when(lower_first, F.col("p2")).otherwise(F.col("p1")).alias("v"),
        )
    )
    o1 = oe.select("u", F.col("v").alias("v1"))
    o2 = oe.select("u", F.col("v").alias("v2"))
    tri = (
        o1.join(o2, "u")
        .filter(F.col("v1") < F.col("v2"))
        .join(
            edges,
            (F.col("v1") == F.col("p1")) & (F.col("v2") == F.col("p2")),
        )
        .select(F.col("u").alias("a"), F.col("v1").alias("b"), F.col("v2").alias("c"))
    )
    part = (
        tri.select(F.col("a").alias("part"))
        .unionAll(tri.select(F.col("b").alias("part")))
        .unionAll(tri.select(F.col("c").alias("part")))
    )
    return (
        part.groupBy("part")
        .agg(F.count("*").alias("n_triangles"))
        .orderBy(F.desc("n_triangles"), F.asc("part"))
        .limit(10)
    )


@query(
    "bloom_semi_join_orders",
    oracle="""
    WITH hp(r, a, b) AS (
        VALUES (0, CAST(2654435761 AS BIGINT), CAST(17 AS BIGINT)),
               (1, CAST(2246822519 AS BIGINT), CAST(101 AS BIGINT))
    ),
    mem AS (SELECT c_custkey FROM customer WHERE c_nationkey = 7),
    bits AS (
        SELECT DISTINCT hp.r AS r,
               ((mem.c_custkey * hp.a + hp.b) % 1000000007) % 4096 AS pos
        FROM mem, hp
    ),
    probe AS (
        SELECT o.o_orderkey,
               CASE WHEN b0.pos IS NOT NULL AND b1.pos IS NOT NULL
                    THEN 1 ELSE 0 END AS bloom_pass,
               CASE WHEN m.c_custkey IS NOT NULL THEN 1 ELSE 0 END
                   AS exact_match
        FROM orders o
        LEFT JOIN bits b0
          ON b0.r = 0
         AND b0.pos = ((o.o_custkey * 2654435761 + 17) % 1000000007) % 4096
        LEFT JOIN bits b1
          ON b1.r = 1
         AND b1.pos = ((o.o_custkey * 2246822519 + 101) % 1000000007) % 4096
        LEFT JOIN (SELECT DISTINCT c_custkey FROM mem) m
          ON m.c_custkey = o.o_custkey
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM mem) AS n_members,
           (SELECT CAST(count(*) AS BIGINT) FROM bits) AS n_bits_set,
           CAST(sum(bloom_pass) AS BIGINT) AS n_bloom_pass,
           CAST(sum(exact_match) AS BIGINT) AS n_exact,
           CAST(sum(bloom_pass) - sum(exact_match) AS BIGINT)
               AS false_positives
    FROM probe
    """,
)
def bloom_semi_join_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join prefilter (Bloom 1970; the pattern
    behind Spark's own runtime bloom pruning, built here explicitly
    and deterministically): membership of "customers in nation 7" is
    compressed into a k=2-hash, m=4096-bit filter — materialized as
    the DISTINCT (row, bit) set, a <=2|members|-row broadcast frame —
    and orders are prefiltered by testing BOTH bits. The report pins
    the two structural guarantees as columns a driver hash checks:
    NO false negatives (n_bloom_pass >= n_exact, i.e. false_positives
    >= 0 — every true match passes the filter) and the exact
    false-positive count vs the true semi-join (both sides computed
    in the same single pass).

    Why it matters at 100 TB: a shuffled semi-join moves the fact
    table on the join key to discard 96% of it; the bloom frame is
    kilobytes, ships with the task binaries, and drops non-matching
    rows AT THE SCAN — the correct shape whenever the build side is
    small and the probe side is the corpus. The deterministic hashes
    make the whole construction engine-exact (DuckDB rebuilds the
    identical filter), unlike Spark's internal might-contain
    expression, which is implementation-defined.

    Scale shape: ONE corpus scan of orders with three broadcast
    left joins (two bit probes + the exact-match twin) feeding a
    single aggregate row — zero corpus Exchanges; the bits frame is
    bounded by min(2 x members, 2 x 4096) rows regardless of data
    volume."""
    cust = table(spark, sf_dir, "customer")
    # The member set feeds FOUR consumers (both bit projections, the
    # exact-match build, the count frame): one cached scan of customer
    # instead of four — at 100 TB the build side is re-read from a
    # members-sized cache, the corpus side still exactly once.
    mem = scoped_persist(
        cust.filter(F.col("c_nationkey") == 7).select("c_custkey"),
        "bloom_members",
    )
    hp = [(0, 2654435761, 17), (1, 2246822519, 101)]

    def pos(key: Column, a: int, b: int) -> Column:
        return F.pmod(
            F.pmod(key.cast("bigint") * F.lit(a) + F.lit(b), F.lit(1000000007)),
            F.lit(4096),
        )

    bits = (
        mem.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(r).alias("r"),
                            pos(F.col("c_custkey"), a, b).alias("pos"),
                        )
                        for r, a, b in hp
                    ]
                )
            ).alias("rb")
        )
        .select("rb.r", "rb.pos")
        .distinct()
    )
    counts = bits.groupBy().agg(F.count("*").alias("n_bits_set"))
    n_mem = mem.groupBy().agg(F.count("*").alias("n_members"))

    o = table(spark, sf_dir, "orders")
    b0 = bits.filter(F.col("r") == 0).select(F.col("pos").alias("p0"))
    b1 = bits.filter(F.col("r") == 1).select(F.col("pos").alias("p1"))
    probe = (
        o.select(
            "o_orderkey",
            "o_custkey",
            pos(F.col("o_custkey"), hp[0][1], hp[0][2]).alias("h0"),
            pos(F.col("o_custkey"), hp[1][1], hp[1][2]).alias("h1"),
        )
        .join(broadcast(b0), F.col("h0") == F.col("p0"), "left")
        .join(broadcast(b1), F.col("h1") == F.col("p1"), "left")
        .join(
            broadcast(mem.withColumn("_m", F.lit(1))),
            F.col("o_custkey") == F.col("c_custkey"),
            "left",
        )
    )
    agg = probe.agg(
        F.sum(
            F.when(
                F.col("p0").isNotNull() & F.col("p1").isNotNull(), 1
            ).otherwise(0)
        ).alias("n_bloom_pass"),
        F.sum(F.coalesce(F.col("_m"), F.lit(0))).alias("n_exact"),
    )
    return (
        agg.join(broadcast(n_mem))
        .join(broadcast(counts))
        .select(
            F.col("n_members").cast("bigint").alias("n_members"),
            F.col("n_bits_set").cast("bigint").alias("n_bits_set"),
            F.col("n_bloom_pass").cast("bigint").alias("n_bloom_pass"),
            F.col("n_exact").cast("bigint").alias("n_exact"),
            (F.col("n_bloom_pass") - F.col("n_exact"))
            .cast("bigint")
            .alias("false_positives"),
        )
    )


@query(
    "join_size_estimate",
    oracle="""
    WITH lo AS (
        SELECT l_orderkey AS k, count(*) AS cl FROM lineitem GROUP BY 1
    ),
    oo AS (
        SELECT o_orderkey AS k, count(*) AS co FROM orders GROUP BY 1
    ),
    j AS (
        SELECT lo.k, lo.cl * oo.co AS contrib
        FROM lo JOIN oo USING (k)
    )
    SELECT CAST(count(*) AS BIGINT) AS n_join_keys,
           CAST(sum(contrib) AS BIGINT) AS join_rows,
           CAST(max(contrib) AS BIGINT) AS max_key_contribution,
           CAST(max(contrib) * 1000000 // sum(contrib) AS BIGINT)
               AS max_key_ppm
    FROM j
    """,
)
def join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality PRE-FLIGHT: the exact output size of
    lineitem JOIN orders on orderkey — sum over keys of the marginal
    count product — computed WITHOUT executing the join. This is the
    planning primitive behind broadcast-vs-shuffle-vs-salt decisions
    (and what AQE's runtime statistics approximate): two
    partial-aggregating keyed counts, then a KEY-SIZED join of
    aggregates whose payload is two int64s per key — never the fact
    rows themselves. The report also pins the skew diagnosis the
    decision actually needs: the largest single key's contribution
    and its parts-per-million share (max_key_ppm >> 1e6/n_keys means
    salting, not more partitions, is the fix — the
    revenue_by_segment_salted trade documented as a measurement).

    Scale shape: two corpus scans each collapsing map-side to keyed
    counts, one Exchange each on the join key; the aggregate join and
    final single-row agg are key-cardinality-sized. Overflow: contrib
    sums need sum(cl*co) < 9.2e18 — at TPC-H shapes (cl<=7, co=1)
    that is 6.4e17 even at 1e17 lineitems; the ppm product needs
    max_contrib < 9.2e12, ~1e12 rows from ONE key, far past where
    salting would have been mandatory anyway."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    lo = li.groupBy(F.col("l_orderkey").alias("k")).agg(
        F.count("*").alias("cl")
    )
    oo = o.groupBy(F.col("o_orderkey").alias("k")).agg(
        F.count("*").alias("co")
    )
    j = lo.join(oo, "k").select(
        "k", (F.col("cl") * F.col("co")).alias("contrib")
    )
    return j.agg(
        F.count("*").cast("bigint").alias("n_join_keys"),
        F.sum("contrib").cast("bigint").alias("join_rows"),
        F.max("contrib").cast("bigint").alias("max_key_contribution"),
        F.expr("CAST(max(contrib) * 1000000L div sum(contrib) AS BIGINT)")
        .alias("max_key_ppm"),
    )


@query(
    "name_ed1_blocking",
    oracle="""
    WITH v AS (
        SELECT c_name AS name, CAST(g.i AS INTEGER) AS i,
               substring(c_name, 1, CAST(g.i AS INTEGER) - 1) ||
               substring(c_name, CAST(g.i AS INTEGER) + 1, length(c_name))
                   AS del
        FROM customer,
             unnest(generate_series(1, length(c_name))) g(i)
    )
    SELECT a.i AS diff_pos, CAST(count(*) AS BIGINT) AS n_pairs
    FROM v a
    JOIN v b ON a.i = b.i AND a.del = b.del AND a.name < b.name
    WHERE levenshtein(a.name, b.name) = 1
    GROUP BY 1
    """,
)
def name_ed1_blocking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-similarity JOIN via deletion-neighborhood blocking
    (FastSS, Bocek et al. 2007) — the edit-distance counterpart to
    the set-similarity joins (prefix_filter_jaccard) and the
    hash-similarity joins (MinHash/SimHash): all customer-name pairs
    at edit distance exactly 1, the near-key linkage an entity-
    resolution pass runs on id-like strings (one-digit typos,
    OCR slips). Naively this is an all-pairs levenshtein —
    O(n^2) string comparisons, a scale-killer. Blocking makes it an
    EQUI-join: each name emits its |name| single-deletion variants;
    two equal-length names differing in exactly one position share
    the variant deleted AT that position (and no other), so every
    substitution pair lands in exactly one (position, variant)
    bucket — found once, no dedup pass. The levenshtein verify is
    the declared candidates-then-verify discipline (same as the LSH
    pairs): with cross-position matching it would prune the ED-2
    survivors; here it is oracle-mirrored so both engines apply the
    identical rule. Output is the differing-position histogram (the
    block position IS the differing position — no string search).

    Scale shape: the variant explode is map-side (fan-out = name
    length, bounded); ONE Exchange on (i, del); bucket sizes are
    bounded by the alphabet at the deleted position (<=10 digit
    alternatives for serial-style keys), so the within-bucket
    self-join can never go quadratic in n — the all-pairs term the
    blocking exists to kill. Aggregate output is <=|name| rows."""
    # DISTINCT name VALUES: the similarity join is over the string
    # domain, not the row multiset — duplicate full names are exact
    # dedup's job (and without the distinct, d copies of one name
    # turn every bucket join into d^2 rows for the same pair set:
    # measured 46x at the 40x probe before this line).
    c = (
        table(spark, sf_dir, "customer")
        .select(F.col("c_name").alias("name"))
        .distinct()
    )
    v = c.select(
        "name",
        F.explode(F.sequence(F.lit(1), F.length("name"))).alias("i"),
    ).select(
        "name",
        "i",
        F.expr(
            "substring(name, 1, i - 1) ||"
            " substring(name, i + 1, length(name))"
        ).alias("del"),
    )
    a = v.select(F.col("name").alias("na"), "i", "del")
    b = v.select(F.col("name").alias("nb"), "i", "del")
    return (
        a.join(b, ["i", "del"])
        .filter(F.col("na") < F.col("nb"))
        .filter(F.levenshtein("na", "nb") == 1)
        .groupBy(F.col("i").alias("diff_pos"))
        .agg(F.count("*").alias("n_pairs"))
    )


@query(
    "scd2_point_in_time",
    oracle="""
    WITH chg AS (
        SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey % 6 = 3
    ),
    scd AS (
        SELECT c_custkey, c_mktsegment, 9000 AS valid_from,
               10500 AS valid_to, FALSE AS is_current
        FROM chg
        UNION ALL
        SELECT c_custkey, 'PROMO', 10500, NULL, TRUE FROM chg
        UNION ALL
        SELECT c_custkey, c_mktsegment, 9000, NULL, TRUE
        FROM customer WHERE c_custkey % 6 <> 3
    ),
    o AS (
        SELECT o_custkey,
               CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
                   AS od,
               o_totalprice
        FROM orders
    )
    SELECT s.c_mktsegment AS segment,
           CAST(s.is_current AS INTEGER) AS from_current_version,
           count(*) AS orders,
           sum(CAST(floor(o.o_totalprice * 10000) AS BIGINT)) / 10000.0
               AS revenue
    FROM o
    JOIN scd s
      ON o.o_custkey = s.c_custkey
     AND o.od >= s.valid_from
     AND (s.valid_to IS NULL OR o.od < s.valid_to)
    GROUP BY 1, 2
    """,
)
def scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal) join against a REAL SCD2 dimension: the
    query every history-preserving warehouse runs ("revenue by the
    segment the customer was in WHEN they ordered") and the reason SCD2
    exists at all — the reference's full-refresh dimensions
    (dag_immigration.py:191-331) cannot answer it. This drives the
    actual ``scd2_init``/``scd2_apply`` operators (operators/scd.py)
    end-to-end: a base snapshot effective day 9000 (before the first
    order), then an update snapshot effective day 10500 (mid order
    range) that re-segments custkey%3==0 customers to 'PROMO' — except
    custkey%6==0, whose update is attribute-identical and must be a
    NO-OP (the idempotence branch). Each order then joins to the ONE
    version whose [valid_from, valid_to) interval contains its order
    day. The oracle constructs the post-apply SCD table directly in
    SQL, so equality proves scd2_apply's close-out/open/no-op routing
    AND the interval containment: pre-cutoff orders of changed
    customers must land on the CLOSED version (from_current_version=0),
    post-cutoff on the open 'PROMO' one.

    Scale shape: SCD2 apply is one full-outer join on the business key
    (dim-sized); the PIT join is an equi-join on custkey with the
    interval predicate as a residual filter — NOT a range join, since
    versions-per-key is small and bounded (<= snapshots applied), the
    equi-join fans out by at most that constant. One corpus-sized
    Exchange on o_custkey; at 100 TB AQE picks shuffle vs broadcast by
    the dim's actual post-apply size."""
    from data_engineering_capstone_project_spark.operators.scd import (
        scd2_apply,
        scd2_init,
    )

    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    base = cust.withColumn("effective_day", F.lit(9000).cast("bigint"))
    scd0 = scd2_init(
        base, ["c_custkey"], ["c_mktsegment"], effective_col="effective_day"
    )
    upd = (
        cust.filter(F.col("c_custkey") % 3 == 0)
        .withColumn(
            "c_mktsegment",
            F.when(
                F.col("c_custkey") % 6 == 0, F.col("c_mktsegment")
            ).otherwise(F.lit("PROMO")),
        )
        .withColumn("effective_day", F.lit(10500).cast("bigint"))
    )
    scd = scd2_apply(
        scd0, upd, ["c_custkey"], ["c_mktsegment"], effective_col="effective_day"
    )
    orders = table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    od = F.datediff(
        F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
    ).cast("bigint")
    pit = (
        orders.withColumn("od", od)
        .join(scd, F.col("o_custkey") == F.col("c_custkey"))
        .filter(
            (F.col("od") >= F.col("valid_from"))
            & (F.col("valid_to").isNull() | (F.col("od") < F.col("valid_to")))
        )
    )
    return pit.groupBy(
        F.col("c_mktsegment").alias("segment"),
        F.col("is_current").cast("int").alias("from_current_version"),
    ).agg(
        F.count("*").alias("orders"),
        _fixed_sum(F.col("o_totalprice"), "revenue"),
    )


@query(
    "part_price_skyline",
    oracle="""
    SELECT a.p_partkey, a.p_size,
           floor(a.p_retailprice * 10000) / 10000.0 AS price
    FROM part a
    WHERE a.p_size IS NOT NULL AND a.p_retailprice IS NOT NULL
      AND NOT EXISTS (
        SELECT 1 FROM part b
        WHERE b.p_size >= a.p_size
          AND b.p_retailprice <= a.p_retailprice
          AND (b.p_size > a.p_size OR b.p_retailprice < a.p_retailprice)
    )
    """,
)
def part_price_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline / Pareto-frontier operator: the parts not DOMINATED by
    any other part — nothing is both cheaper-or-equal AND
    bigger-or-equal with one strict — i.e. the efficient frontier of
    (minimize p_retailprice, maximize p_size). Multi-criteria shortlist
    queries ("best trade-offs, not one weighted score") are a classic
    operator class (Borzsony et al., "The Skyline Operator", ICDE'01)
    that SQL engines lack natively; the naive form is the quadratic
    self-join the ORACLE deliberately uses, so oracle equality proves
    the fast plan against an independent brute-force formulation
    (ties included: equal (price, size) points do not dominate each
    other and all survive).

    The fast plan exploits the 2-D structure: a point survives iff its
    price equals the MIN price of its own size (no same-size strict
    undercut) AND is strictly below the min price over all LARGER
    sizes (no dominating bigger part). So: one corpus-sized hash agg to
    (size -> min price) — a grid bounded by the SIZE DOMAIN (~50
    values), not the corpus — then a running-min window over that tiny
    grid (the usual bounded-grid exemption for its single-partition
    sort), broadcast back for a map-side semi-filter. Total corpus
    cost: one partial+final agg and one broadcast join probe — vs the
    oracle's O(n^2). At 100 TB the grid is still ~50 rows."""
    part = table(spark, sf_dir, "part").select(
        "p_partkey", "p_size", "p_retailprice"
    )
    return pareto_frontier_2d(
        part, maximize_col="p_size", minimize_col="p_retailprice"
    ).select(
        "p_partkey",
        "p_size",
        (F.floor(F.col("p_retailprice") * 10000) / F.lit(10000.0)).alias(
            "price"
        ),
    )


def pareto_frontier_2d(
    df: DataFrame, maximize_col: str, minimize_col: str
) -> DataFrame:
    """2-D skyline: rows not dominated under (maximize ``maximize_col``,
    minimize ``minimize_col``); equal points do not dominate each other
    and all survive. One corpus hash agg to the maximize-domain grid, a
    running-min window over that grid, and a broadcast semi-filter back
    (property-tested against a brute-force dominance check in
    tests/test_property_round6c.py). Rows with a NULL on either axis
    are excluded up front: dominance is undefined for them — SQL
    three-valued logic would let a NULL row survive every NOT EXISTS
    check and sit vacuously on the frontier (r8 adversarial audit;
    the oracle filters identically)."""
    df = df.filter(
        F.col(maximize_col).isNotNull() & F.col(minimize_col).isNotNull()
    )
    gmin = df.groupBy(maximize_col).agg(F.min(minimize_col).alias("m"))
    # Min of the minimize axis over STRICTLY larger maximize values:
    # order the grid descending, running min of the preceding rows.
    w = Window.orderBy(F.desc(maximize_col)).rowsBetween(
        Window.unboundedPreceding, -1
    )
    sky_keys = gmin.withColumn("suff", F.min("m").over(w)).filter(
        F.col("suff").isNull() | (F.col("m") < F.col("suff"))
    )
    return (
        df.join(broadcast(sky_keys), maximize_col)
        .filter(F.col(minimize_col) == F.col("m"))
        .drop("m", "suff")
    )


@query(
    "merge_upsert_parity",
    oracle="""
    WITH base AS (
        SELECT o_orderkey, o_orderstatus AS status, o_totalprice AS price,
               CAST(year(o_orderdate) AS INTEGER) AS o_year
        FROM orders WHERE o_orderkey % 100 < 50
    ),
    upd AS (
        SELECT o_orderkey, 'U' AS status, o_totalprice + 1000 AS price,
               CAST(year(o_orderdate) AS INTEGER) AS o_year
        FROM orders WHERE o_orderkey % 10 = 3
    ),
    merged AS (
        SELECT * FROM base
        WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)
        UNION ALL
        SELECT * FROM upd
    )
    SELECT o_year, status, count(*) AS orders,
           CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
           sum(CAST(floor(price * 10000) AS BIGINT)) / 10000.0 AS revenue
    FROM merged GROUP BY 1, 2
    """,
)
def merge_upsert_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-verified parity run for the row-level MERGE operator
    (sources/writers.py merge_upsert_partitioned), previously exercised
    only by the local test suite: seed a hive-partitioned parquet table
    (orders with o_orderkey%100<50, partitioned by order year), then
    MERGE a deterministic changeset (every o_orderkey%10==3 order,
    re-statused 'U' with price+1000) — which both REPLACES existing
    keys (%100<50) and INSERTS new ones (%100>=50) — and apply the SAME
    changeset a second time, which must be a no-op on the final state
    (replacing rows with identical rows). The result is the merged
    table's per-(year, status) row count, exact key checksum, and
    fixed-point revenue; the oracle computes the merged state
    set-algebraically (base minus updated keys, union changeset), so
    equality proves the operator's anti-join/union/dynamic-overwrite
    mechanics AND its idempotence under replay.

    Scale shape: the operator reads ONLY the partitions the changeset
    touches (broadcast IN-filter -> partition pruning), anti-joins the
    updated keys, and dynamically overwrites just those partitions —
    at 100 TB a merge touching one day rewrites one day. The parity
    table here is order-scale, written to a pid-keyed scratch dir
    reclaimed at interpreter exit."""
    from data_engineering_capstone_project_spark.plans.events_windows import (
        _parity_scratch_dir,
    )
    from data_engineering_capstone_project_spark.sources.writers import (
        merge_upsert_partitioned,
    )

    path = _parity_scratch_dir("decps_merge_upsert_parity")
    orders = table(spark, sf_dir, "orders")
    year = F.year("o_orderdate").cast("int").alias("o_year")
    base = orders.filter(F.col("o_orderkey") % 100 < 50).select(
        "o_orderkey",
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("price"),
        year,
    )
    upd = orders.filter(F.col("o_orderkey") % 10 == 3).select(
        "o_orderkey",
        F.lit("U").alias("status"),
        (F.col("o_totalprice") + F.lit(1000)).alias("price"),
        year,
    )
    base.write.mode("overwrite").partitionBy("o_year").parquet(path)
    merge_upsert_partitioned(spark, path, upd, ["o_orderkey"], ["o_year"])
    # Replay: merging the identical changeset must leave the state fixed.
    merge_upsert_partitioned(spark, path, upd, ["o_orderkey"], ["o_year"])
    try:
        merged = spark.read.parquet(path)
    except Exception as exc:
        if "UNABLE_TO_INFER_SCHEMA" not in str(exc):
            raise
        # Empty source -> empty seed + empty changeset -> a dir with
        # no parquet footers; the merged state is the empty base.
        merged = base.limit(0)
    return merged.groupBy(
        F.col("o_year").cast("int").alias("o_year"), "status"
    ).agg(
        F.count("*").alias("orders"),
        F.sum("o_orderkey").alias("key_sum"),
        _fixed_sum(F.col("price"), "revenue"),
    )


@query(
    "k_anonymity_audit",
    oracle="""
    WITH g AS (
        SELECT c_nationkey,
               c_mktsegment,
               CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_bucket,
               count(*) AS group_n
        FROM customer
        GROUP BY 1, 2, 3
    )
    SELECT CAST(c_nationkey AS INTEGER) AS c_nationkey,
           c_mktsegment,
           bal_bucket,
           group_n
    FROM g WHERE group_n < 5
    """,
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over quasi-identifiers — the privacy gate a
    training-data release pipeline runs before shipping "anonymized"
    records: any combination of quasi-identifier values shared by
    FEWER than k individuals is a re-identification risk (Sweeney,
    "k-Anonymity", 2002: 87% of the US population is unique on
    {ZIP, birth date, sex}). Here the quasi-identifier tuple is
    (nation, market segment, account-balance-to-the-$1000), k=5, and
    the output is exactly the risky groups with their sizes — the
    worklist a suppression/generalization pass would consume.

    Scale shape: one partial+final hash aggregation on the
    quasi-identifier tuple (map-side combine collapses the corpus
    before the Exchange), then a grid-sized HAVING filter. The output
    is bounded by the quasi-identifier domain, not the corpus; no
    joins, no windows, no second pass at 100 TB."""
    cust = table(spark, sf_dir, "customer")
    return (
        cust.groupBy(
            F.col("c_nationkey").cast("int").alias("c_nationkey"),
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias(
                "bal_bucket"
            ),
        )
        .agg(F.count("*").alias("group_n"))
        .filter(F.col("group_n") < 5)
    )


@query(
    "orc_roundtrip_parity",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
           o_orderpriority,
           count(*) AS orders,
           CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
           sum(CAST(floor(o_totalprice * 10000) AS BIGINT)) / 10000.0
               AS revenue
    FROM orders
    WHERE o_orderkey % 4 = 1
    GROUP BY 1, 2
    """,
)
def orc_roundtrip_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC source/sink parity: a deterministic orders slice is written
    as ORC (Spark's second built-in columnar format — the one a user
    migrating a Hive/Hadoop estate actually has on disk), read back
    through the ORC reader, and aggregated; the oracle computes the
    same aggregate straight from the parquet table, so equality
    proves the ORC writer+reader round-trips values, timestamps
    (calendar semantics under year()), and nulls bit-exactly. Predicate
    pushdown works on ORC scans the same way it does on parquet
    (Catalyst emits PushedFilters for orc), so a user can point any
    registered query at an ORC copy of the warehouse without plan
    regressions.

    Scale shape: the write is one pass over the filtered slice; the
    read-back aggregate is the ordinary partial+final hash agg. Scratch
    lives in a pid-keyed dir reclaimed at interpreter exit."""
    from data_engineering_capstone_project_spark.plans.events_windows import (
        _parity_scratch_dir,
    )

    path = _parity_scratch_dir("decps_orc_roundtrip")
    orders = table(spark, sf_dir, "orders")
    sliced = orders.filter(F.col("o_orderkey") % 4 == 1)
    sliced.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    return back.groupBy(
        F.year("o_orderdate").cast("int").alias("o_year"),
        "o_orderpriority",
    ).agg(
        F.count("*").alias("orders"),
        F.sum("o_orderkey").alias("key_sum"),
        _fixed_sum(F.col("o_totalprice"), "revenue"),
    )


@query(
    "latest_state_compaction",
    oracle="""
    WITH log AS (
        SELECT o_orderkey AS k, 1 AS seq, 'U' AS op,
               o_totalprice AS price FROM orders
        UNION ALL
        SELECT o_orderkey, 2, 'U', o_totalprice + 500
        FROM orders WHERE o_orderkey % 7 = 0
        UNION ALL
        SELECT o_orderkey, 3, 'D', NULL
        FROM orders WHERE o_orderkey % 13 = 0
    ),
    latest AS (
        SELECT k, op, price,
               row_number() OVER (PARTITION BY k ORDER BY seq DESC) AS rk
        FROM log
    )
    SELECT CAST(count(*) AS BIGINT) AS live_keys,
           CAST(sum(k) AS BIGINT) AS key_sum,
           sum(CAST(floor(price * 10000) AS BIGINT)) / 10000.0
               AS price_sum,
           CAST(sum(CASE WHEN price > 100000 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_bumped_over_100k
    FROM latest WHERE rk = 1 AND op <> 'D'
    """,
)
def latest_state_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC changelog compaction — materialize the LATEST state from an
    append-only (key, seq, op, payload) log, dropping keys whose last
    operation is a delete: the read-side of every Kafka-compacted
    topic / Debezium stream / Delta CDF, and the inverse of
    merge_upsert_partitioned (which maintains state write-side, while
    this derives it from history read-side). The changelog is built
    deterministically from orders (seq 1 = base row for every key,
    seq 2 = price+500 update for keys %7==0, seq 3 = delete for keys
    %13==0), compacted by a per-key latest-wins window, and summarized
    (live keys, exact key checksum, fixed-point price sum, bumped-row
    count) so the oracle pins both the winner-selection and the
    delete-suppression.

    Scale shape: ONE corpus-sized Exchange — the per-key window (rank
    by sequence descending) that every compaction engine pays; at
    100 TB this is the same shuffle a merge would do, but over the log
    instead of log+table. Spark's WindowGroupLimit pushes the rk=1
    filter into the sort, so no full ranking is materialized."""
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    base = orders.select(
        F.col("o_orderkey").alias("k"),
        F.lit(1).alias("seq"),
        F.lit("U").alias("op"),
        F.col("o_totalprice").alias("price"),
    )
    upd = orders.filter(F.col("o_orderkey") % 7 == 0).select(
        F.col("o_orderkey").alias("k"),
        F.lit(2).alias("seq"),
        F.lit("U").alias("op"),
        (F.col("o_totalprice") + F.lit(500)).alias("price"),
    )
    dels = orders.filter(F.col("o_orderkey") % 13 == 0).select(
        F.col("o_orderkey").alias("k"),
        F.lit(3).alias("seq"),
        F.lit("D").alias("op"),
        F.lit(None).cast("double").alias("price"),
    )
    from data_engineering_capstone_project_spark.operators.scd import (
        changelog_latest_state,
    )

    log = base.unionByName(upd).unionByName(dels)
    latest = changelog_latest_state(log, ["k"], seq_col="seq", op_col="op")
    return latest.agg(
        F.count("*").cast("bigint").alias("live_keys"),
        F.sum("k").cast("bigint").alias("key_sum"),
        _fixed_sum(F.col("price"), "price_sum"),
        F.sum((F.col("price") > 100000).cast("int"))
        .cast("bigint")
        .alias("n_bumped_over_100k"),
    )


# First-digit probabilities log10(1 + 1/d), d = 1..9, as shared exact
# literals (12 dp) so Spark and DuckDB evaluate the identical doubles.
_BENFORD_P = {
    1: "0.301029995664", 2: "0.176091259056", 3: "0.124938736608",
    4: "0.096910013008", 5: "0.079181246048", 6: "0.066946789631",
    7: "0.057991946978", 8: "0.051152522447", 9: "0.045757490561",
}
# CAST each branch to DOUBLE: a bare decimal literal parses as
# DECIMAL in both engines, and decimal multiply/divide SCALE RULES
# differ between Spark and DuckDB — double arithmetic is IEEE-defined
# and identical.
_BENFORD_CASE_SQL = "CASE digit " + " ".join(
    f"WHEN {d} THEN CAST({p} AS DOUBLE)" for d, p in _BENFORD_P.items()
) + " END"


@query(
    "benford_first_digit_audit",
    oracle=f"""
    WITH d AS (
        SELECT CAST(substr(CAST(CAST(floor(o_totalprice * 100) AS BIGINT)
                                AS VARCHAR), 1, 1) AS INTEGER) AS digit
        FROM orders WHERE o_totalprice > 0
    ),
    o AS (SELECT digit, count(*) AS observed FROM d GROUP BY 1),
    n AS (SELECT CAST(sum(observed) AS BIGINT) AS n FROM o),
    e AS (
        SELECT o.digit, o.observed, n.n,
               n.n * {_BENFORD_CASE_SQL} AS expected
        FROM o, n
    )
    SELECT digit, CAST(observed AS BIGINT) AS observed,
           floor(expected * 10000) / 10000.0 AS expected,
           floor((observed - expected) * (observed - expected) / expected
                 * 1000000000) / 1000000000.0 AS chi2_term
    FROM e
    """,
)
def benford_first_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit — the fraud/data-quality screen
    for "does this amount column look organically generated?"
    (fabricated or capped numbers flunk it; auditors and data-quality
    suites run exactly this on monetary columns). First digits come
    from INTEGER string rendering (floor(price·100) -> first char —
    int64-to-decimal-string is identical in any engine; no
    double-formatting, no transcendental log10 at runtime: the Benford
    probabilities log10(1+1/d) are shared 12-digit literals evaluated
    identically as doubles on both sides). Emits per digit the
    observed count, expected count, and chi-square term, floored at
    the house resolutions. (TPC-H totalprice is a bounded sum of
    uniform-ish prices, so the audit correctly FLAGS it as
    non-Benford — large chi2 terms are the right answer here, and the
    oracle pins them digit for digit.)

    Scale shape: one corpus Exchange collapsing to at most 9 digit
    rows map-side; the expectation join is a 1-row broadcast."""
    d = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 0)
        .select(
            F.substring(
                F.floor(F.col("o_totalprice") * 100)
                .cast("bigint")
                .cast("string"),
                1,
                1,
            )
            .cast("int")
            .alias("digit")
        )
    )
    o = d.groupBy("digit").agg(F.count("*").alias("observed"))
    n = o.agg(F.sum("observed").cast("bigint").alias("n"))
    e = o.crossJoin(broadcast(n)).withColumn(
        "expected", F.col("n") * F.expr(_BENFORD_CASE_SQL)
    )
    chi = (
        (F.col("observed") - F.col("expected"))
        * (F.col("observed") - F.col("expected"))
        / F.col("expected")
    )
    return e.select(
        "digit",
        F.col("observed").cast("bigint").alias("observed"),
        (F.floor(F.col("expected") * 10000) / F.lit(10000.0)).alias(
            "expected"
        ),
        (F.floor(chi * 1000000000) / F.lit(1000000000.0)).alias("chi2_term"),
    )


@query(
    "revenue_concentration_deciles",
    oracle="""
    WITH cr AS (
        SELECT o_custkey,
               sum(CAST(floor(o_totalprice * 10000) AS BIGINT)) AS rev
        FROM orders GROUP BY 1
    ),
    r AS (
        SELECT rev,
               row_number() OVER (ORDER BY rev DESC, o_custkey ASC) AS rk,
               count(*) OVER () AS n
        FROM cr
    ),
    d AS (
        SELECT CAST(((rk - 1) * 10) // n AS INTEGER) AS decile,
               count(*) AS customers, sum(rev) AS rev_fp
        FROM r GROUP BY 1
    ),
    t AS (SELECT CAST(sum(rev_fp) AS BIGINT) AS tot FROM d)
    SELECT d.decile, CAST(d.customers AS BIGINT) AS customers,
           d.rev_fp / 10000.0 AS revenue,
           floor(sum(d.rev_fp) OVER (ORDER BY d.decile
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 * 10000.0 / t.tot) / 10000.0 AS cum_share
    FROM d, t
    """,
)
def revenue_concentration_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration (the 80/20 report): customers ranked by
    lifetime revenue, cut into EXACT deciles, with each decile's
    revenue and the cumulative share — "the top 10% of customers carry
    X% of revenue", the Lorenz-curve readout every commercial team
    asks for (and the Gini input, served here as the curve itself
    because the curve is what decisions read). The global revenue-desc
    rank uses the SAME grid-offset assembly as stratified sampling
    (one stratum, key = max_rev - rev so ascending key IS descending
    revenue; shard count scaled to the customer count by the
    _corpus_shard_count rule) — no single-partition sort of the
    customer frame; the oracle's flat row_number proves the assembly.
    Cumulative shares are computed on the 10-row decile grid.

    Scale shape: one corpus Exchange (orders -> per-customer revenue),
    one customer-grain Exchange for the sharded rank, then 10-row
    arithmetic. The max/count scalars are a bounded 1-row collect
    (the allowed scalar-aggregate class)."""
    import math

    from data_engineering_capstone_project_spark.plans.text_analysis import (
        grid_offset_stratum_rank,
    )

    cr = (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(F.floor(F.col("o_totalprice") * 10000)).alias("rev"))
    )
    cr = scoped_persist(cr, "revenue_concentration.cr")
    mxrev, n_cust = cr.agg(F.max("rev"), F.count("*")).collect()[0]
    if not n_cust or mxrev is None:
        # No customers — or customers whose revenue is entirely NULL
        # (un-rankable) -> the empty report, not int(None) on the
        # max-revenue scalar (r7 empty/all-NULL input audits).
        return spark.createDataFrame(
            [],
            "decile int, customers bigint, revenue double, "
            "cum_share double",
        )
    shards = int(2 ** math.ceil(math.log2(max(n_cust / 5000.0, 64.0))))
    width = int(mxrev) // shards + 1
    keyed = cr.withColumn("_s", F.lit(1)).withColumn(
        "key", F.lit(int(mxrev)) - F.col("rev")
    )
    ranked = grid_offset_stratum_rank(
        keyed, stratum_col="_s", hash_col="key", id_col="o_custkey",
        width=width,
    )
    d = (
        ranked.withColumn(
            "decile",
            F.expr(f"((sample_rank - 1) * 10) div {int(n_cust)}").cast("int"),
        )
        .groupBy("decile")
        .agg(F.count("*").alias("customers"), F.sum("rev").alias("rev_fp"))
    )
    tot = d.agg(F.sum("rev_fp").cast("bigint").alias("tot"))
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return (
        d.crossJoin(broadcast(tot))
        .select(
            "decile",
            F.col("customers").cast("bigint").alias("customers"),
            (F.col("rev_fp") / F.lit(10000.0)).alias("revenue"),
            (
                F.floor(
                    F.sum("rev_fp").over(w) * F.lit(10000.0) / F.col("tot")
                )
                / F.lit(10000.0)
            ).alias("cum_share"),
        )
    )


@query(
    "dq_expectation_suite",
    oracle="""
    WITH m AS (
        SELECT CAST(count(*) AS BIGINT) AS rows_total,
               CAST(count(o_orderkey) AS BIGINT) AS nn_orderkey,
               CAST(count(DISTINCT o_orderkey) AS BIGINT) AS dist_orderkey,
               CAST(count(o_custkey) AS BIGINT) AS nn_custkey,
               CAST(sum(CASE WHEN o_totalprice > 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS pos_price,
               CAST(sum(CASE WHEN o_orderstatus IN ('O','F','P')
                             THEN 1 ELSE 0 END) AS BIGINT) AS status_ok,
               CAST(sum(CASE WHEN regexp_matches(o_orderpriority, '^[1-5]-')
                             THEN 1 ELSE 0 END) AS BIGINT) AS prio_ok,
               CAST(sum(CASE WHEN o_orderdate >= TIMESTAMP '1995-01-01'
                              AND o_orderdate < TIMESTAMP '2001-01-01'
                             THEN 1 ELSE 0 END) AS BIGINT) AS date_ok
        FROM orders
    ),
    checks AS (
        SELECT 'not_null:o_orderkey' AS check_name,
               nn_orderkey * 1000000 // rows_total AS observed_ppm,
               CAST(1000000 AS BIGINT) AS threshold_ppm FROM m
        UNION ALL
        SELECT 'unique:o_orderkey',
               dist_orderkey * 1000000 // nn_orderkey, 1000000 FROM m
        UNION ALL
        SELECT 'not_null:o_custkey',
               nn_custkey * 1000000 // rows_total, 1000000 FROM m
        UNION ALL
        SELECT 'range:o_totalprice_positive',
               pos_price * 1000000 // rows_total, 1000000 FROM m
        UNION ALL
        SELECT 'accepted_set:o_orderstatus',
               status_ok * 1000000 // rows_total, 1000000 FROM m
        UNION ALL
        SELECT 'pattern:o_orderpriority',
               prio_ok * 1000000 // rows_total, 1000000 FROM m
        UNION ALL
        SELECT 'range:o_orderdate_1995_2000',
               date_ok * 1000000 // rows_total, 900000 FROM m
    )
    SELECT check_name, observed_ppm,
           CAST(threshold_ppm AS BIGINT) AS threshold_ppm,
           observed_ppm >= threshold_ppm AS passed
    FROM checks
    """,
)
def dq_expectation_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality expectations (the Deequ /
    Great-Expectations contract shape, completing the Q-row family):
    a SUITE of named checks — not-null, uniqueness, accepted value
    set, pattern, numeric range, date-window coverage — evaluated
    against orders in ONE aggregate pass and reported as
    (check, observed_ppm, threshold_ppm, passed) rows a CI gate or
    freshness monitor consumes directly. Where ``orders_profile``
    DESCRIBES the table, this one JUDGES it against a contract; the
    reference's DataQualityOperator (data_quality.py:21-38) ran one
    generated SQL statement per check against Redshift — N scans for
    N checks — while here every metric is a conditional sum in the
    same partial-aggregating job, so the suite costs one table scan
    at any table size (the same one-pass discipline as
    ``quality.null_counts``). Coverage ratios are integer ppm under
    floor division; the date-window check carries a 90% threshold
    (the fixture's order dates run past 2000, so the check
    demonstrates a sub-1e6 observation judged against a tolerance
    rather than vacuous all-pass rows).

    Scale shape: one scan, one single-row aggregate, then a 7-row
    literal unpivot (``stack``) — nothing downstream of the agg ever
    exceeds the check count.

    Empty-table semantics (r7 audit): denominators are
    greatest(count, 1), so an EMPTY orders table reports every check
    at 0 ppm observed = FAILED rather than crashing on ANSI
    divide-by-zero — the safe direction for a CI gate, where an empty
    upstream is almost always a broken pipeline, not a clean bill."""
    o = table(spark, sf_dir, "orders")
    in_window = (
        F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp")
    ) & (F.col("o_orderdate") < F.lit("2001-01-01").cast("timestamp"))
    m = o.agg(
        F.count("*").alias("rows_total"),
        F.count("o_orderkey").alias("nn_orderkey"),
        F.count_distinct("o_orderkey").alias("dist_orderkey"),
        F.count("o_custkey").alias("nn_custkey"),
        F.sum((F.col("o_totalprice") > 0).cast("long")).alias("pos_price"),
        F.sum(
            F.col("o_orderstatus").isin("O", "F", "P").cast("long")
        ).alias("status_ok"),
        F.sum(
            F.col("o_orderpriority").rlike("^[1-5]-").cast("long")
        ).alias("prio_ok"),
        F.sum(in_window.cast("long")).alias("date_ok"),
    )
    stacked = m.select(
        F.expr(
            """stack(7,
            'not_null:o_orderkey',
                nn_orderkey * 1000000 div greatest(rows_total, 1), CAST(1000000 AS BIGINT),
            'unique:o_orderkey',
                dist_orderkey * 1000000 div greatest(nn_orderkey, 1), CAST(1000000 AS BIGINT),
            'not_null:o_custkey',
                nn_custkey * 1000000 div greatest(rows_total, 1), CAST(1000000 AS BIGINT),
            'range:o_totalprice_positive',
                pos_price * 1000000 div greatest(rows_total, 1), CAST(1000000 AS BIGINT),
            'accepted_set:o_orderstatus',
                status_ok * 1000000 div greatest(rows_total, 1), CAST(1000000 AS BIGINT),
            'pattern:o_orderpriority',
                prio_ok * 1000000 div greatest(rows_total, 1), CAST(1000000 AS BIGINT),
            'range:o_orderdate_1995_2000',
                date_ok * 1000000 div greatest(rows_total, 1), CAST(900000 AS BIGINT)
            ) AS (check_name, observed_ppm, threshold_ppm)"""
        )
    )
    return stacked.select(
        "check_name",
        "observed_ppm",
        "threshold_ppm",
        (F.col("observed_ppm") >= F.col("threshold_ppm")).alias("passed"),
    )


@query(
    "snapshot_diff_columns",
    oracle="""
    WITH old AS (
        SELECT o_orderkey AS k,
               CAST(floor(o_totalprice * 100) AS BIGINT) AS price_c,
               o_orderstatus AS status,
               o_orderpriority AS priority
        FROM orders
    ),
    new AS (
        SELECT o_orderkey AS k,
               CASE WHEN o_orderkey % 100 = 7
                    THEN CAST(floor(o_totalprice * 100) AS BIGINT) + 100
                    ELSE CAST(floor(o_totalprice * 100) AS BIGINT) END
                   AS price_c,
               CASE WHEN o_orderkey % 100 = 23 THEN 'X'
                    ELSE o_orderstatus END AS status,
               o_orderpriority AS priority
        FROM orders WHERE o_orderkey % 100 <> 13
        UNION ALL
        SELECT o_orderkey + 10000000000 AS k,
               CAST(floor(o_totalprice * 100) AS BIGINT),
               o_orderstatus, o_orderpriority
        FROM orders WHERE o_orderkey % 100 = 21
    ),
    j AS (SELECT old.k AS ok, new.k AS nk,
                 old.price_c AS op, new.price_c AS np,
                 old.status AS os, new.status AS ns,
                 old.priority AS opr, new.priority AS npr
          FROM old FULL OUTER JOIN new ON old.k = new.k),
    m AS (
        SELECT CAST(sum(CASE WHEN ok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS inserted,
               CAST(sum(CASE WHEN nk IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS deleted,
               CAST(sum(CASE WHEN ok IS NOT NULL AND nk IS NOT NULL
                              AND op <> np THEN 1 ELSE 0 END) AS BIGINT)
                   AS chg_price,
               CAST(sum(CASE WHEN ok IS NOT NULL AND nk IS NOT NULL
                              AND os <> ns THEN 1 ELSE 0 END) AS BIGINT)
                   AS chg_status,
               CAST(sum(CASE WHEN ok IS NOT NULL AND nk IS NOT NULL
                              AND opr <> npr THEN 1 ELSE 0 END) AS BIGINT)
                   AS chg_priority
        FROM j
    )
    SELECT 'rows_inserted' AS change, inserted AS n FROM m
    UNION ALL SELECT 'rows_deleted', deleted FROM m
    UNION ALL SELECT 'col:o_totalprice', chg_price FROM m
    UNION ALL SELECT 'col:o_orderstatus', chg_status FROM m
    UNION ALL SELECT 'col:o_orderpriority', chg_priority FROM m
    """,
)
def snapshot_diff_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-ATTRIBUTED snapshot reconciliation — `snapshot_diff`
    answers "which keys changed"; replication/migration triage next
    asks "which COLUMNS drifted, how much" (a schema-mapping bug
    changes one column everywhere; a replay bug inserts/deletes
    rows). Same derived second snapshot family as `snapshot_diff`
    (price bumped on the %100==7 stripe, status rewritten on the
    %100==23 stripe, priority untouched, %100==13 deleted, %100==21
    re-inserted above the 10B key shift), but the report is the
    per-column change histogram from ONE full-outer join + ONE
    conditional-sum aggregate + a 5-row unpivot. The untouched
    column's zero row is load-bearing: it proves per-column
    attribution, not just row-level detection.

    Scale shape: one key-partitioned full-outer join (both sides
    corpus-sized — the irreducible diff cost, same as snapshot_diff's
    probed 0.90-3.81 band), then a single-row aggregate; nothing
    downstream exceeds the column count."""
    o = table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100).cast("bigint")
    old = o.select(
        F.col("o_orderkey").alias("k"),
        cents.alias("price_c"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderpriority").alias("priority"),
    )
    mod = F.pmod(F.col("o_orderkey"), F.lit(100))
    new = (
        o.filter(mod != 13)
        .select(
            F.col("o_orderkey").alias("k"),
            F.when(mod == 7, cents + 100).otherwise(cents).alias("price_c"),
            F.when(mod == 23, F.lit("X"))
            .otherwise(F.col("o_orderstatus"))
            .alias("status"),
            F.col("o_orderpriority").alias("priority"),
        )
        .unionByName(
            o.filter(mod == 21).select(
                (F.col("o_orderkey") + F.lit(10_000_000_000)).alias("k"),
                cents.alias("price_c"),
                F.col("o_orderstatus").alias("status"),
                F.col("o_orderpriority").alias("priority"),
            )
        )
    )
    j = old.alias("o").join(
        new.alias("n"), F.col("o.k") == F.col("n.k"), "full_outer"
    )
    both = F.col("o.k").isNotNull() & F.col("n.k").isNotNull()
    m = j.agg(
        F.sum(F.col("o.k").isNull().cast("long")).alias("inserted"),
        F.sum(F.col("n.k").isNull().cast("long")).alias("deleted"),
        F.sum(
            (both & (F.col("o.price_c") != F.col("n.price_c"))).cast("long")
        ).alias("chg_price"),
        F.sum(
            (both & (F.col("o.status") != F.col("n.status"))).cast("long")
        ).alias("chg_status"),
        F.sum(
            (both & (F.col("o.priority") != F.col("n.priority"))).cast("long")
        ).alias("chg_priority"),
    )
    return m.select(
        F.expr(
            """stack(5,
            'rows_inserted', inserted,
            'rows_deleted', deleted,
            'col:o_totalprice', chg_price,
            'col:o_orderstatus', chg_status,
            'col:o_orderpriority', chg_priority
            ) AS (change, n)"""
        )
    )


_BOOT_B = 16
# Poisson(1) CDF * 1000, floor — the deterministic weight table:
# h in [0,368) -> 0 copies, [368,736) -> 1, [736,920) -> 2,
# [920,981) -> 3, [981,996) -> 4, [996,999) -> 5, [999,1000) -> 6.
_BOOT_CUTS = (368, 736, 920, 981, 996, 999)


def _boot_weight_sql(h: str) -> str:
    w = f"CASE WHEN {h} < 368 THEN 0 WHEN {h} < 736 THEN 1"
    w += f" WHEN {h} < 920 THEN 2 WHEN {h} < 981 THEN 3"
    w += f" WHEN {h} < 996 THEN 4 WHEN {h} < 999 THEN 5 ELSE 6 END"
    return w


@query(
    "bootstrap_revenue_ci",
    oracle=f"""
    WITH reps AS (SELECT unnest(range({_BOOT_B})) AS b),
    w AS (
        SELECT r.b,
               {_boot_weight_sql("((o.o_orderkey * 2654435761 + r.b * 97) % 1000000007) % 1000")}
                   AS w,
               CAST(floor(o.o_totalprice * 100) AS BIGINT) AS cents
        FROM orders o CROSS JOIN reps r
    ),
    per AS (
        SELECT b, CAST(sum(w) AS BIGINT) AS n_b,
               CAST(sum(w * cents) AS BIGINT) AS s_b
        FROM w GROUP BY 1
    ),
    means AS (SELECT b, s_b // n_b AS m_c FROM per),
    full_m AS (
        SELECT CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                    // count(*) AS BIGINT) AS full_c
        FROM orders
    ),
    ctr AS (SELECT m.m_c - f.full_c AS mc FROM means m, full_m f),
    agg AS (
        SELECT CAST(count(*) AS BIGINT) AS bb,
               CAST(sum(mc) AS BIGINT) AS smc,
               CAST(sum(mc * mc) AS BIGINT) AS smc2
        FROM ctr
    )
    SELECT a.bb AS replicas,
           f.full_c / 100.0 AS mean_price,
           floor(sqrt((a.bb * a.smc2 - a.smc * a.smc)
                      / (1.0 * a.bb * (a.bb - 1)))
                 / 100.0 * 10000) / 10000.0 AS boot_se,
           CAST((SELECT min(m_c) FROM means) AS BIGINT) AS min_rep_mean_c,
           CAST((SELECT max(m_c) FROM means) AS BIGINT) AS max_rep_mean_c
    FROM agg a, full_m f
    """,
)
def bootstrap_revenue_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass Poisson bootstrap (Chamandy et al., Google 2012) —
    the standard-error machine for statistics at a scale where
    resampling-with-replacement is impossible: instead of B shuffled
    resamples, each row gets B deterministic Poisson(1) weights and
    every replicate statistic is a weighted aggregate computed in THE
    SAME single pass (a B-way map-side explode, no second scan, no
    materialized resamples). Here: the bootstrap SE of mean order
    price from B=16 replicates. Weights come from the house
    multiplicative hash through a floor(CDF·1000) lookup table, so
    the whole procedure — weights, replicate means, centered second
    moment, the final IEEE sqrt — is bit-identical in any engine.
    Replicate means are centered on the full-data mean before
    squaring (variance is shift-invariant) to keep the second moment
    in exact-int64 range; the one double division + sqrt happen once,
    floor-truncated to 4 decimals.

    Scale shape: one scan with a ×16 map-side fan-out into a 16-row
    aggregate — partial aggregation absorbs the fan-out before any
    Exchange; everything downstream of the groupBy is B-sized. At
    100 TB this is how you put error bars on ANY pipeline metric
    without re-reading data B times."""
    o = table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100).cast("bigint")
    reps = F.array(*[F.lit(b) for b in range(_BOOT_B)])
    h = F.pmod(
        F.pmod(
            F.col("o_orderkey") * F.lit(2654435761) + F.col("b") * F.lit(97),
            F.lit(1000000007),
        ),
        F.lit(1000),
    )
    w = F.when(h < _BOOT_CUTS[0], 0)
    for i, cut in enumerate(_BOOT_CUTS[1:], start=1):
        w = w.when(h < cut, i)
    w = w.otherwise(len(_BOOT_CUTS)).cast("bigint")
    weighted = (
        o.select("o_orderkey", cents.alias("cents"))
        .withColumn("b", F.explode(reps))
        .withColumn("w", w)
    )
    per = weighted.groupBy("b").agg(
        F.sum("w").alias("n_b"), F.sum(F.col("w") * F.col("cents")).alias("s_b")
    )
    means = per.select("b", F.expr("s_b div n_b").alias("m_c"))
    full_m = o.agg(
        F.expr(
            "CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))"
            " div count(*) AS BIGINT)"
        ).alias("full_c")
    )
    ctr = means.crossJoin(F.broadcast(full_m)).select(
        (F.col("m_c") - F.col("full_c")).alias("mc"), "m_c", "full_c"
    )
    agg = ctr.agg(
        F.count("*").alias("bb"),
        F.sum("mc").alias("smc"),
        F.sum(F.col("mc") * F.col("mc")).alias("smc2"),
        F.min("m_c").alias("min_rep_mean_c"),
        F.max("m_c").alias("max_rep_mean_c"),
        F.first("full_c").alias("full_c"),
    )
    return agg.select(
        F.col("bb").cast("bigint").alias("replicas"),
        (F.col("full_c") / F.lit(100.0)).alias("mean_price"),
        (
            F.floor(
                F.sqrt(
                    (F.col("bb") * F.col("smc2") - F.col("smc") * F.col("smc"))
                    / (F.lit(1.0) * F.col("bb") * (F.col("bb") - F.lit(1)))
                )
                / F.lit(100.0)
                * F.lit(10000)
            )
            / F.lit(10000.0)
        ).alias("boot_se"),
        F.col("min_rep_mean_c").cast("bigint").alias("min_rep_mean_c"),
        F.col("max_rep_mean_c").cast("bigint").alias("max_rep_mean_c"),
    )
