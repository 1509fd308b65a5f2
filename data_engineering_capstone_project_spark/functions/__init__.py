from data_engineering_capstone_project_spark.functions.parsing import (
    parse_country_line,
    parse_gdp_usd,
    parse_iso_code,
    parse_port_of_entry_line,
)
from data_engineering_capstone_project_spark.functions.dates import (
    date_parts,
    sas_date,
)
from data_engineering_capstone_project_spark.functions.keys import (
    random_uuid,
    surrogate_key,
)

__all__ = [
    "parse_country_line",
    "parse_iso_code",
    "parse_gdp_usd",
    "parse_port_of_entry_line",
    "sas_date",
    "date_parts",
    "surrogate_key",
    "random_uuid",
]
