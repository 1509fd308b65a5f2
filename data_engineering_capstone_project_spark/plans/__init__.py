from data_engineering_capstone_project_spark.plans.registry import ORACLES, QUERIES

__all__ = ["QUERIES", "ORACLES"]

# Importing the query modules populates the registries.
from data_engineering_capstone_project_spark.plans import relational  # noqa: E402,F401
from data_engineering_capstone_project_spark.plans import text_analysis  # noqa: E402,F401
from data_engineering_capstone_project_spark.plans import events_windows  # noqa: E402,F401
from data_engineering_capstone_project_spark.plans import similarity_search  # noqa: E402,F401
from data_engineering_capstone_project_spark.plans import temporal_joins  # noqa: E402,F401
from data_engineering_capstone_project_spark.plans import media  # noqa: E402,F401
from data_engineering_capstone_project_spark.plans import star_schema_parity  # noqa: E402,F401
from data_engineering_capstone_project_spark.plans import layout  # noqa: E402,F401
