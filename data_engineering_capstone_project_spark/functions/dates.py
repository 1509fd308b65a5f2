"""Date functions (SURVEY.md §2.8 F4-F5, §2.9 D5).

D5 ``convert_sas_date`` (reference data_preparation.py:69-77,84) was a
Python UDF: SAS epoch 1960-01-01 + N days, NULL on any failure. Here it
is a codegen'd expression with identical null semantics: a non-numeric
or NULL input makes the cast yield NULL and date_add propagates it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SAS_EPOCH = "1960-01-01"


def sas_date(col: Column) -> Column:
    """SAS numeric day offset -> DateType (NULL-safe)."""
    return F.date_add(F.lit(SAS_EPOCH).cast("date"), col.cast("int"))


def date_parts(col: Column) -> dict[str, Column]:
    """F4 (data_preparation.py:466-470): extract year/quarter/month/day/week.

    ``weekofyear`` is ISO-8601 week (DuckDB twin: ``isoweek``)."""
    return {
        "year": F.year(col),
        "quarter": F.quarter(col),
        "month": F.month(col),
        "day": F.dayofmonth(col),
        "week": F.weekofyear(col),
    }
