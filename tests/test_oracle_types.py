"""Oracle output-type guard: no oracle may emit a DuckDB HUGEINT
column.

DuckDB ``sum()`` over any integer type returns HUGEINT — even
``sum(CAST(x AS BIGINT))`` — and the driver's comparator renders
HUGEINT differently from Spark's BIGINT, so hash_match fails although
every value is identical. This killed priority_shipping_q12 in r2 and
doc_rarity / conversion_funnel in r3. Python's DB-API fetch collapses
HUGEINT to plain int, so value-level comparison can never see the bug;
the output *schema* has to be checked. The fix is always
``CAST(sum(...) AS BIGINT)`` applied OUTSIDE the aggregate.

This test binds (but does not execute) every registered oracle against
sf0.001, so it is fast and needs no SparkSession.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL
from tools.compare import duck_connection, hugeint_columns

import __spark_entry__ as entry_mod


@pytest.fixture(scope="module")
def con():
    c = duck_connection(SF_SMALL)
    yield c
    c.close()


_ORACLES = [(n, o) for n, o in entry_mod.oracle_sql().items() if o is not None]


@pytest.mark.parametrize("name,oracle", _ORACLES, ids=[n for n, _ in _ORACLES])
def test_oracle_emits_no_hugeint(con, name, oracle):
    assert hugeint_columns(con, oracle) == []
