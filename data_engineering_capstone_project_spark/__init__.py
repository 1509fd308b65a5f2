"""PySpark-native analytics engine with the capabilities of
davekmg/Data-Engineering-Capstone-Project, re-expressed Spark-first.

Layout:
    session      -- SparkSession factory with scale-ready defaults
    sources      -- readers (S1-S7) and writers (K1-K3) from SURVEY.md §2.1-2.2
    functions    -- scalar/parse/date/key/text functions (§2.8-2.9, UDF-free)
    operators    -- relational core, dedup, similarity, multimodal (§2.3-2.7 + M5)
    plans        -- the analytical query surface (README questions #1-#4 and beyond)
    streaming    -- Structured Streaming event-time ops with batch twins (§2.11)
    pipeline     -- the star-schema ETL rebuilt on the above (§3 E2)
    quality      -- data-quality assertions (§2.10)
"""

from data_engineering_capstone_project_spark.session import get_spark

__all__ = ["get_spark"]
