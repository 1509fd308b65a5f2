"""Order-insensitive Spark-vs-DuckDB result comparison (shared by
tools/check_oracle.py and the pytest suite). Stricter than any driver
hash: canonicalized values must match exactly."""

from __future__ import annotations

import datetime
import decimal
import math

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        return f"f:{v!r}"
    if isinstance(v, decimal.Decimal):
        return f"f:{float(v)!r}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, datetime.datetime):
        return f"ts:{v.isoformat()}"
    if isinstance(v, datetime.date):
        return f"d:{v.isoformat()}"
    if isinstance(v, list):
        return "l:[" + ",".join(canon(x) for x in v) + "]"
    return f"s:{v}"


def hugeint_columns(con, oracle: str) -> list[str]:
    """DuckDB sum() over integers yields HUGEINT (even sum(CAST(x AS
    BIGINT))), and the driver renders HUGEINT differently from Spark's
    BIGINT — hash_match fails although every value is identical (r2
    priority_shipping_q12, r3 doc_rarity/conversion_funnel). Python
    collapses both to int, so value comparison can't see it; the output
    SCHEMA must be checked. Fix is always CAST(sum(...) AS BIGINT)
    *outside* the aggregate."""
    rel = con.sql(oracle)  # lazy bind: plans, doesn't execute
    return [
        f"oracle column {c} has DuckDB type {t} (driver hash diverges "
        "from Spark BIGINT): wrap in CAST(... AS BIGINT) outside the aggregate"
        for c, t in zip(rel.columns, rel.types)
        if "HUGEINT" in str(t).upper()
    ]


def row_multiset(rows, col_order):
    return sorted(tuple(canon(r[i]) for i in col_order) for r in rows)


def compare_query(spark, con, fn, oracle: str, sf_dir: str) -> list[str]:
    """Run a (spark, sf_dir) -> DataFrame callable and its DuckDB oracle;
    return a list of mismatch descriptions (empty = pass)."""
    sdf = fn(spark, sf_dir)
    scols = list(sdf.columns)
    srows = sdf.collect()
    res = con.execute(oracle)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()

    problems: list[str] = []
    problems += hugeint_columns(con, oracle)
    if sorted(scols) != sorted(ocols):
        problems.append(f"columns spark={sorted(scols)} oracle={sorted(ocols)}")
    if len(srows) != len(orows):
        problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
    if not problems:
        sm = row_multiset(srows, [scols.index(c) for c in sorted(scols)])
        om = row_multiset(orows, [ocols.index(c) for c in sorted(ocols)])
        if sm != om:
            for a, b in zip(sm, om):
                if a != b:
                    problems.append(f"first diff row: spark={a} oracle={b}")
                    break
            else:
                problems.append("row multiset mismatch")
    return problems
