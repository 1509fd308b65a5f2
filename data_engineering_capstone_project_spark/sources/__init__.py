from data_engineering_capstone_project_spark.sources.readers import (
    read_csv,
    read_literal_rows,
    read_parquet,
    read_text_lines,
    register_view,
)
from data_engineering_capstone_project_spark.sources.writers import (
    write_parquet,
    write_parquet_partitioned,
    write_table,
)

__all__ = [
    "read_text_lines",
    "read_csv",
    "read_parquet",
    "read_literal_rows",
    "register_view",
    "write_parquet",
    "write_parquet_partitioned",
    "write_table",
]
