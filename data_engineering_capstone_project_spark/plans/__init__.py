from data_engineering_capstone_project_spark.plans.registry import ORACLES, QUERIES

__all__ = ["QUERIES", "ORACLES"]

# Importing the query modules populates the registries.
from data_engineering_capstone_project_spark.plans import relational  # noqa: E402,F401
