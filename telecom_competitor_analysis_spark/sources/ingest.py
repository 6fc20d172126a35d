"""Extraction-edge ingestion (SURVEY.md §3.2): the browser/scraper layer
stays outside the engine; the moment rows exist they enter Spark here,
with validation playing the reference's pydantic role
(``validate_products`` aborts the task on any violation, reference
dags/data_model.py:27-37, used at dags/viking_class_scraper.py:356-359).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


class ValidationError(ValueError):
    """Raised when required fields are null — the engine's equivalent of
    the pydantic ValidationError that fails the Airflow task."""


def ingest_rows(
    spark: SparkSession, rows: Sequence[dict], schema: T.StructType
) -> DataFrame:
    """Collector rows (list of dicts from the extractor) → typed DataFrame
    under the declared schema. Type mismatches raise immediately
    (createDataFrame verifies against the explicit schema)."""
    return spark.createDataFrame(rows, schema)


def validate_required(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Abort-on-violation check: any null in a non-nullable field raises
    ValidationError with per-column counts (one aggregate pass — no
    row-at-a-time loop, no collect of data rows). Returns df unchanged on
    success so it chains inside a pipeline."""
    required = [f.name for f in schema.fields if not f.nullable]
    if not required:
        return df
    counts = df.agg(
        *[
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(c)
            for c in required
        ]
    ).first()
    bad = {c: counts[c] for c in required if counts[c]}
    if bad:
        raise ValidationError(f"null values in required columns: {bad}")
    return df
