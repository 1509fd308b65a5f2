"""Grouped-map operators via applyInPandas (Arrow-batched, one pandas
frame per group). This is the escape hatch for per-group logic the
built-in aggregates/windows can't express (model scoring per segment,
iterative per-key fitting); each group must fit one executor's memory,
so key granularity is the scale knob.

z-score IS expressible as windows — group_zscore exists precisely so
tests can prove the applyInPandas path agrees with the pure-JVM window
formulation it replaces (same contract the multimodal operators follow:
exercise the plumbing with semantics that something else can verify).
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def group_zscore(
    df: DataFrame, keys: Sequence[str], value_col: str
) -> DataFrame:
    """Per-group z-score of ``value_col`` (population stddev), appended
    as ``zscore``; single-row / zero-variance groups get 0.0."""
    # Fresh StructType: StructType.add mutates in place, which would
    # corrupt df's own resolved schema.
    from pyspark.sql.types import DoubleType, StructField, StructType

    schema = StructType(
        list(df.schema.fields) + [StructField("zscore", DoubleType())]
    )

    def z(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value_col].astype("float64")
        std = v.std(ddof=0)
        pdf = pdf.copy()
        if pd.isna(std) or std == 0:
            pdf["zscore"] = 0.0
        else:
            # fillna(0.0): NULL inputs get 0.0, matching the window
            # twin's coalesce — the two paths must agree everywhere.
            pdf["zscore"] = ((v - v.mean()) / std).fillna(0.0)
        return pdf

    return df.groupBy(*keys).applyInPandas(z, schema)


def group_zscore_window(
    df: DataFrame, keys: Sequence[str], value_col: str
) -> DataFrame:
    """Pure-JVM twin of group_zscore (window aggregates; no Python).
    Prefer this in production — it exists as the verification oracle
    for the applyInPandas path and for hot paths where the ~10x Arrow
    serialization overhead matters."""
    w = Window.partitionBy(*keys)
    v = F.col(value_col)
    std = F.stddev_pop(v).over(w)
    z = F.when(std == 0, F.lit(0.0)).otherwise((v - F.avg(v).over(w)) / std)
    return df.withColumn("zscore", F.coalesce(z, F.lit(0.0)))
