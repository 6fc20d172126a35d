"""Star-schema operators (SURVEY.md §2.2 P1, §2.5 J1).

- ``star_split``: one cleaned product row fans out into the product /
  feature / price projections with FK wiring (reference
  dags/bigquery.py:175-220 ``prepare_data_for_insertion`` builds the three
  dicts per record in a loop; here three ``select``s off one DataFrame
  sharing deterministic sha2 keys — the input is scanned once and the
  projections are column-pruned independently by Catalyst).
- ``pack_cross_join``: packs = internet × mobile with price arithmetic and
  name synthesis (reference dags/viking_class_scraper.py:389-431
  ``generate_packs`` nested loops; here a crossJoin that Catalyst executes
  as BroadcastNestedLoopJoin — both sides are per-competitor product lists,
  i.e. tiny; the cartesian never touches big data).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame

from telecom_competitor_analysis_spark.functions.keys import surrogate_key


def star_split(clean_products: DataFrame) -> dict[str, DataFrame]:
    """P1 — project one cleaned-product DataFrame into the star-schema
    triple (products, features, product_prices) with shared surrogate keys
    (reference dags/bigquery.py:175-220; key columns per reference
    dags/load_to_bigquery_dag.py:33-61).

    Keys are content-addressed: feature_uuid hashes the feature payload,
    price_uuid hashes (feature, price, scraped_at) — so unchanged rows
    reproduce identical keys across runs (enables idempotent anti-join
    appends downstream).
    """
    base = clean_products.withColumn(
        "competitor_uuid", surrogate_key("competitor_name")
    ).withColumn(
        "product_uuid", surrogate_key("competitor_name", "product_name")
    ).withColumn(
        "feature_uuid",
        surrogate_key(
            "competitor_name",
            "product_name",
            "data",
            "minutes",
            "sms",
            "upload_speed",
            "download_speed",
        ),
    ).withColumn(
        "price_uuid", surrogate_key("feature_uuid", "price", "scraped_at")
    )

    products = base.select(
        "product_uuid",
        "product_name",
        "product_category",
        "competitor_name",
        "competitor_uuid",
        "feature_uuid",
        "scraped_at",
    )
    features = base.select(
        "feature_uuid",
        "product_uuid",
        "product_name",
        "product_url",
        "scraped_at",
        "data",
        "minutes",
        "sms",
        "upload_speed",
        "download_speed",
    )
    prices = base.select("price_uuid", "feature_uuid", "price", "scraped_at")
    return {"products": products, "features": features, "product_prices": prices}


def pack_cross_join(
    left: DataFrame,
    right: DataFrame,
    price_expr: Column,
    name_expr: Column,
    extra_cols: dict[str, Column] | None = None,
) -> DataFrame:
    """J1 — cartesian pack generation with derived price/name columns
    (reference dags/viking_class_scraper.py:389-431: pack price =
    mobile.price + internet.price − discount, pack name = concat).

    Caller aliases the inputs ('m', 'i') and writes expressions against
    those aliases. Physical plan is BroadcastNestedLoopJoin — correct for
    the tiny per-competitor product lists; do NOT feed fact tables here.
    """
    out = left.crossJoin(right).select(
        name_expr.alias("pack_name"),
        price_expr.alias("price"),
        *[expr.alias(name) for name, expr in (extra_cols or {}).items()],
    )
    return out
