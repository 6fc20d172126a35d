"""Clean stage — bronze raw products → silver typed/normalized relation
(reference dags/transform.py:52-100 ``clean_product_data`` /
``clean_data_task``).

The reference loops 2 competitors × 3 headers applying row-at-a-time
Python; here it's one declarative plan per header (or one unioned plan
with ``competitor_name`` as a column — Spark parallelizes within the
DataFrame, no outer loop needed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from telecom_competitor_analysis_spark.functions.cleaning import convert_speed


def clean_products(raw: DataFrame) -> DataFrame:
    """Normalize raw product rows (schemas.RAW_PRODUCT → CLEAN_PRODUCT):

    - speeds '1gbps'/'100mbps'/bare numerics → Mbps doubles
      (reference dags/transform.py:8-29,61-63),
    - nulls pass through untouched (reference dags/transform.py:64-66),
    - scraped_at 'yyyy-MM-dd' string → DateType.

    Sentinel -1.0 = unlimited is preserved as-is (reference
    dags/utils.py:31-32) — it's applied at extraction time upstream.
    """
    return raw.select(
        "product_name",
        "competitor_name",
        "product_category",
        "product_url",
        F.col("price").cast("double").alias("price"),
        F.to_date(F.col("scraped_at"), "yyyy-MM-dd").alias("scraped_at"),
        F.col("data").cast("double").alias("data"),
        F.col("minutes").cast("double").alias("minutes"),
        F.col("sms").cast("long").alias("sms"),
        convert_speed(F.col("upload_speed")).alias("upload_speed"),
        convert_speed(F.col("download_speed")).alias("download_speed"),
    )
