"""Parse functions replacing the reference's Python UDFs D1-D4
(SURVEY.md §2.9; reference data_preparation.py:20-67).

The reference round-trips every row through a Python worker (pickle ->
regex -> pickle). These are pure Catalyst expressions -- they stay
inside whole-stage codegen, never leave the JVM, and don't block
pushdown of surrounding predicates. On a 100 TB text scan that is the
difference between I/O-bound and Python-bound.

Failure semantics: the reference UDFs call ``match.group`` without a
None check, so a malformed line crashes the job (SURVEY.md §2.9
hazard). ``regexp_extract`` is total and returns ``''``; we normalize
``''`` -> NULL so malformed rows are detectable by the Q1 quality gate
instead of killing the stage.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _extract_or_null(col: Column, pattern: str, group: int) -> Column:
    """regexp_extract with '' (no-match) mapped to NULL."""
    return F.nullif(F.regexp_extract(col, pattern, group), F.lit(""))


# D1: parseCountriesUDF (data_preparation.py:20-31).
# Input lines like ``236 =  'AFGHANISTAN'`` from
# I94_SAS_Labels_Descriptions-derived internal_country_codes.txt.
_COUNTRY_LINE = r"^\s*([0-9]+)\s*=\s*'(.+)'\s*$"


def parse_country_line(col: Column) -> dict[str, Column]:
    """-> {int_country_code, int_country_name} columns."""
    return {
        "int_country_code": _extract_or_null(col, _COUNTRY_LINE, 1),
        "int_country_name": F.trim(_extract_or_null(col, _COUNTRY_LINE, 2)),
    }


# D2: parseISOCodesUDF (data_preparation.py:33-41): "AF / AFG" -> "AF".
_ISO_CODES = r"^([A-Z]+)\s*/\s*[A-Z]+$"


def parse_iso_code(col: Column) -> Column:
    return _extract_or_null(F.trim(col), _ISO_CODES, 1)


# D3: parseGdpUsdUDF (data_preparation.py:43-54): "20.65 Billion" -> "20.65".
_GDP_USD = r"^([0-9.]+)"


def parse_gdp_usd(col: Column) -> Column:
    return _extract_or_null(F.trim(col), _GDP_USD, 1)


# D4: parsePortOfEntryUDF (data_preparation.py:56-67).
# Input lines like ``'ALC'\t=\t'ALCAN, AK '`` from port_of_entry.txt.
_PORT_LINE = r"^\s*'(.+)'\s*=\s*'(.+)'\s*$"


def parse_port_of_entry_line(col: Column) -> dict[str, Column]:
    """-> {port_of_entry_code, port_of_entry_name} columns, trimmed."""
    return {
        "port_of_entry_code": F.trim(_extract_or_null(col, _PORT_LINE, 1)),
        "port_of_entry_name": F.trim(_extract_or_null(col, _PORT_LINE, 2)),
    }


def map_subscript_select(parsed: Column, keys: list[str]) -> list[Column]:
    """F7/F8 (data_preparation.py:116-118,307-309): the reference builds
    ``parsed['k'] as k`` select strings from a key list; same pattern over
    a map-typed column, as Column objects."""
    return [parsed.getItem(k).alias(k) for k in keys]
