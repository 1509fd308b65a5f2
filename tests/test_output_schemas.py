"""Driver-representability guard: no registered query may emit a
top-level ArrayType / MapType / StructType column.

The driver's comparator canonicalizes results through pandas
``sort_values`` over every column; a Python list/dict cell is
unhashable there, so the row errors out even when every value is
correct. This killed embedding_projection in r4 (CORRECTNESS_r04:
``TypeError: unhashable type: 'list'``) although the Spark answer
matched DuckDB under the repo's own comparator. The house rule
(plans/relational.py, customer_order_keys) is to exchange arrays as
CSV strings — "engines render arrays differently; strings hash
identically". This test turns that convention into a pre-commit
contract: it BUILDS every registered query's DataFrame and asserts
the output schema is flat. Building is cheap for most queries but NOT
free for all: the index queries run their one-time encode and the
streamed-parity queries run their full micro-batch protocol at
plan-build time, so this suite costs minutes — the price of checking
the real registered callables instead of a hand-maintained list.

Companion to tests/test_oracle_types.py, which guards the oracle side
of the same contract (no DuckDB HUGEINT output column).
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import ArrayType, MapType, StructType

from tests.conftest import SF_SMALL

import __spark_entry__ as entry_mod

_QUERIES = sorted(entry_mod.queries().items())


@pytest.mark.parametrize("name,fn", _QUERIES, ids=[n for n, _ in _QUERIES])
def test_output_schema_is_driver_representable(spark, name, fn):
    schema = fn(spark, SF_SMALL).schema
    complex_cols = [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert complex_cols == [], (
        f"{name} emits complex top-level column(s) {complex_cols}; "
        "serialize as CSV string (concat_ws / array_to_string) or "
        "explode to rows — the driver's pandas canonicalizer cannot "
        "sort list/dict cells"
    )
