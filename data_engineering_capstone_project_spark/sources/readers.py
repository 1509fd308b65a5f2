"""Source operators S1-S7 (SURVEY.md §2.1).

All are thin, typed wrappers over Spark's declarative readers so that
Catalyst sees the scan directly (predicate pushdown, column pruning,
partition pruning all stay free). Reference citations:

* S1 text-line scan       -- data_preparation.py:112,303
* S2/S3/S4 CSV scans      -- data_preparation.py:124-134,151,202,243,347
* S5 parquet scan (glob)  -- data_preparation.py:421
* S6 literal rows         -- data_preparation.py:259-272,281-294
* S7 view registration    -- data_preparation.py:121,148,...,482
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_text_lines(spark: SparkSession, path: str) -> DataFrame:
    """S1: one row per line, single column ``value: string``."""
    return spark.read.text(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """S2/S3/S4: CSV scan.

    With ``schema`` -> fixed types (S2/S3); without -> header-only
    all-string columns, matching the reference's no-inference reads (S4:
    data_preparation.py:151,202,243 -- it never sets inferSchema, so an
    inference pass here would change both types and scan cost).
    """
    reader = spark.read.option("header", str(header).lower()).option("sep", sep)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.csv(path)


def read_parquet(spark: SparkSession, *paths: str) -> DataFrame:
    """S5: parquet scan; globs/multi-part dirs handled natively."""
    return spark.read.parquet(*paths)


def read_literal_rows(
    spark: SparkSession,
    rows: Iterable[Mapping | tuple],
    schema: StructType | str,
) -> DataFrame:
    """S6: in-memory literal relation (list of dicts/tuples + schema)."""
    return spark.createDataFrame(list(rows), schema)


def register_view(df: DataFrame, name: str) -> DataFrame:
    """S7: name an intermediate relation so SQL and the DataFrame API both
    see it (the reference's one architectural invariant, SURVEY.md §3 E2).
    Returns the input for chaining.
    """
    df.createOrReplaceTempView(name)
    return df


def read_parquet_evolving(spark: SparkSession, *paths: str) -> DataFrame:
    """Parquet scan across SCHEMA GENERATIONS: a long-lived table whose
    writers added columns over time reads as the union schema, with
    absent columns NULL in older files (mergeSchema).

    Off by default in plain reads because the footer merge touches
    every file's metadata at planning time — at 100 TB, prefer
    declaring the current schema explicitly (``spark.read.schema(...)
    .parquet(...)``), which gets the same NULL-fill semantics with
    zero extra planning I/O; this helper is for the exploratory case
    where the union schema is not known."""
    return spark.read.option("mergeSchema", "true").parquet(*paths)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
) -> DataFrame:
    """JSON-lines corpus scan (the interchange format LLM training
    corpora actually ship in — one JSON document per line, typically
    gzip/zstd files Spark decompresses transparently per-file).

    Pass an explicit ``schema`` in production: without one Spark runs a
    full inference pre-pass over the data (a second scan — unacceptable
    at 100 TB) and schema drift across dumps silently widens columns.
    With a schema the scan is single-pass, missing fields are NULL, and
    extra fields are ignored — exactly the tolerant-reader posture a
    multi-source corpus needs. Malformed lines land in
    ``_corrupt_record`` (PERMISSIVE mode) instead of failing the job;
    filter/count them as a quality gate rather than crashing a
    100 TB ingest on one bad line."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines export (training-shard handoff to tokenizer/loader
    stacks that do not read parquet). Columnar work should stay in
    parquet; this is the boundary format for the last hop."""
    df.write.mode(mode).json(path)
