"""Explicit StructType schemas — the engine's single source of truth.

The reference declares its data model twice: pydantic models validate at
extraction time (reference dags/data_model.py:9-24) and BigQuery schemas
enforce types at the sink (reference dags/load_to_bigquery_dag.py:25-79).
Here both roles collapse into one module of StructTypes, used as
``schema=`` on reads (with FAILFAST for the pydantic role) and as sink DDL.

Type reconciliation (SURVEY.md §1.2): the reference is inconsistent about
``sms`` (int vs float) and ``upload/download_speed`` (str in pydantic,
FLOAT in BQ; reconciled by ``convert_speed``, reference
dags/transform.py:8-29). The engine picks one canonical type per column —
DoubleType for all numeric measures, LongType for counts/ids — and coerces
at the ingestion edge.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --------------------------------------------------------------------------
# Bronze: raw scraped records (reference dags/data_model.py:9-21 plus the
# pack/option/log shapes of FIXTURES.md §A). `scraped_at` arrives as a
# yyyy-MM-dd string (reference dags/viking_class_scraper.py:43); kept as
# string in bronze, parsed to DateType in silver.
# --------------------------------------------------------------------------

RAW_PRODUCT = T.StructType(
    [
        T.StructField("product_name", T.StringType(), False),
        T.StructField("competitor_name", T.StringType(), False),
        T.StructField("product_category", T.StringType(), False),
        T.StructField("product_url", T.StringType(), False),
        T.StructField("price", T.DoubleType(), False),
        T.StructField("scraped_at", T.StringType(), False),
        T.StructField("data", T.DoubleType(), False),  # GB; -1.0 = unlimited
        T.StructField("minutes", T.DoubleType(), True),  # -1 = unlimited
        T.StructField("sms", T.LongType(), True),  # -1 = unlimited
        T.StructField("upload_speed", T.StringType(), True),  # raw '1gbps'
        T.StructField("download_speed", T.StringType(), True),
    ]
)

RAW_PACK = T.StructType(
    [
        T.StructField("competitor_name", T.StringType(), False),
        T.StructField("pack_name", T.StringType(), False),
        T.StructField("pack_url", T.StringType(), False),
        T.StructField("pack_description", T.StringType(), True),
        T.StructField("price", T.DoubleType(), False),
        T.StructField("scraped_at", T.StringType(), False),
        T.StructField("mobile_product_name", T.StringType(), True),
        T.StructField("internet_product_name", T.StringType(), True),
    ]
)

# Dead data path in the reference (scraped, never loaded — SURVEY.md §1.1);
# modeled anyway. Canonical field name `option_name`
# (reference dags/scarlet_scraper.py:131-140).
RAW_OPTION = T.StructType(
    [
        T.StructField("product_category", T.StringType(), True),
        T.StructField("option_name", T.StringType(), False),
        T.StructField("option_details", T.StringType(), True),
        T.StructField("option_url", T.StringType(), True),
        T.StructField("price", T.DoubleType(), False),
        T.StructField("scraped_at", T.StringType(), False),
        T.StructField("pack_name", T.StringType(), True),
    ]
)

RAW_LOG = T.StructType(
    [
        T.StructField("competitor_name", T.StringType(), False),
        T.StructField("scraped_at", T.StringType(), False),
        T.StructField("error_details", T.StringType(), True),
        T.StructField("status", T.StringType(), True),
    ]
)

# --------------------------------------------------------------------------
# Silver: cleaned products — speeds normalized to Mbps doubles
# (reference dags/transform.py:52-67), scraped_at parsed to DateType.
# --------------------------------------------------------------------------

CLEAN_PRODUCT = T.StructType(
    [
        T.StructField("product_name", T.StringType(), False),
        T.StructField("competitor_name", T.StringType(), False),
        T.StructField("product_category", T.StringType(), False),
        T.StructField("product_url", T.StringType(), False),
        T.StructField("price", T.DoubleType(), False),
        T.StructField("scraped_at", T.DateType(), False),
        T.StructField("data", T.DoubleType(), False),
        T.StructField("minutes", T.DoubleType(), True),
        T.StructField("sms", T.LongType(), True),
        T.StructField("upload_speed", T.DoubleType(), True),  # Mbps
        T.StructField("download_speed", T.DoubleType(), True),
    ]
)

# --------------------------------------------------------------------------
# Gold: the 6-table star schema (reference dags/load_to_bigquery_dag.py:25-79).
# Surrogate keys are deterministic sha2 hex strings (SURVEY.md F12) rather
# than the reference's uuid4 (reference dags/bigquery.py:186-188), so runs
# are reproducible and oracle-checkable.
# --------------------------------------------------------------------------

COMPETITORS = T.StructType(
    [
        T.StructField("competitor_uuid", T.StringType(), False),
        T.StructField("competitor_name", T.StringType(), False),
        T.StructField("created_at", T.TimestampType(), False),
    ]
)

PRODUCTS = T.StructType(
    [
        T.StructField("product_uuid", T.StringType(), False),
        T.StructField("product_name", T.StringType(), False),
        T.StructField("product_category", T.StringType(), True),
        T.StructField("competitor_name", T.StringType(), False),
        T.StructField("competitor_uuid", T.StringType(), False),
        T.StructField("feature_uuid", T.StringType(), False),
        T.StructField("scraped_at", T.DateType(), False),
    ]
)

FEATURES = T.StructType(
    [
        T.StructField("feature_uuid", T.StringType(), False),
        T.StructField("product_uuid", T.StringType(), False),
        T.StructField("product_name", T.StringType(), False),
        T.StructField("product_url", T.StringType(), True),
        T.StructField("scraped_at", T.DateType(), False),
        T.StructField("data", T.DoubleType(), True),
        T.StructField("minutes", T.DoubleType(), True),
        T.StructField("sms", T.LongType(), True),
        T.StructField("upload_speed", T.DoubleType(), True),
        T.StructField("download_speed", T.DoubleType(), True),
    ]
)

PRODUCT_PRICES = T.StructType(
    [
        T.StructField("price_uuid", T.StringType(), False),
        T.StructField("feature_uuid", T.StringType(), False),
        T.StructField("price", T.DoubleType(), False),
        T.StructField("scraped_at", T.DateType(), False),
    ]
)

PACKS = RAW_PACK  # same columns; scraped_at stays string in the reference BQ
LOGS = RAW_LOG

STAR_SCHEMA: dict[str, T.StructType] = {
    "competitors": COMPETITORS,
    "products": PRODUCTS,
    "features": FEATURES,
    "product_prices": PRODUCT_PRICES,
    "packs": PACKS,
    "logs": LOGS,
}

# --------------------------------------------------------------------------
# Driver testdata (TESTDATA.md) — TPC-H-ish tables plus events / documents /
# embeddings. Parquet carries its own schema; these are for reference and
# for FAILFAST re-validation in tests.
# --------------------------------------------------------------------------

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
