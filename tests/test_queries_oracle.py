"""Every registered query must match its DuckDB oracle at sf0.001
(the driver's gate runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL
from tools.compare import compare_query, duck_connection

import __spark_entry__ as entry_mod


@pytest.fixture(scope="module")
def con():
    c = duck_connection(SF_SMALL)
    yield c
    c.close()


def _cases():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    return [(name, qs[name], oracles.get(name)) for name in qs]


@pytest.mark.parametrize("name,fn,oracle", _cases(), ids=[c[0] for c in _cases()])
def test_query_matches_oracle(spark, con, name, fn, oracle):
    if oracle is None:
        # rows-only contract: must at least run and return a stable schema
        df = fn(spark, SF_SMALL)
        assert df.columns
        df.collect()
        return
    problems = compare_query(spark, con, fn, oracle, SF_SMALL)
    assert not problems, f"{name}: {problems}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.columns
    assert len(df.collect()) >= 0
