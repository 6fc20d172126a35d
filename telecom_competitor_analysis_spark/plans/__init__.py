"""Declared query plans (SURVEY.md §2 inventory) and their DuckDB oracle
SQL. ``QUERIES`` / ``ORACLES`` back ``__spark_entry__.queries()`` /
``oracle_sql()``."""

from telecom_competitor_analysis_spark.plans.queries import QUERIES  # noqa: F401
from telecom_competitor_analysis_spark.plans.oracles import ORACLES  # noqa: F401
