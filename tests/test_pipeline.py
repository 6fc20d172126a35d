"""End-to-end telecom pipeline semantics on FIXTURES.md §A fixtures:
clean → star split → incremental merge across two scrape days, including
the reference's first-vs-latest change-detection quirk (SURVEY.md §2.5)."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # end-to-end job/pipeline tier; fast tier is -m 'not slow'



from telecom_competitor_analysis_spark.jobs.clean import clean_products
from telecom_competitor_analysis_spark.jobs.load import (
    plan_pack_appends,
    plan_star_appends,
)
from telecom_competitor_analysis_spark.schemas import RAW_PACK, RAW_PRODUCT


def _raw_products(spark, rows):
    return spark.createDataFrame(rows, RAW_PRODUCT)


DAY1 = [
    # (name, competitor, category, url, price, scraped, data, min, sms, up, down)
    ("mobile_prepaid_data_15_gb", "mobileviking", "mobile_prepaid",
     "http://v/p1", 15.0, "2023-11-01", 15.0, -1.0, -1, None, None),
    ("fast_internet", "mobileviking", "internet_subscription",
     "http://v/i1", 50.0, "2023-11-01", -1.0, None, None, "1gbps", "100mbps"),
    ("mobile_subscription_20_gb", "scarlet", "mobile_subscription",
     "http://s/m1", 20.0, "2023-11-01", 20.0, 300.0, 300, None, None),
]

DAY2 = [
    # unchanged product
    ("mobile_prepaid_data_15_gb", "mobileviking", "mobile_prepaid",
     "http://v/p1", 15.0, "2023-11-02", 15.0, -1.0, -1, None, None),
    # price changed (feature unchanged)
    ("fast_internet", "mobileviking", "internet_subscription",
     "http://v/i1", 55.0, "2023-11-02", -1.0, None, None, "1gbps", "100mbps"),
    # feature changed (data 20→25 GB) → new feature_uuid
    ("mobile_subscription_20_gb", "scarlet", "mobile_subscription",
     "http://s/m1", 20.0, "2023-11-02", 25.0, 300.0, 300, None, None),
    # brand-new product
    ("mobile_prepaid_data_5_gb", "scarlet", "mobile_prepaid",
     "http://s/p5", 10.0, "2023-11-02", 5.0, 100.0, 100, None, None),
]


def test_clean_normalizes_speeds_and_dates(spark):
    silver = clean_products(_raw_products(spark, DAY1))
    rows = {r.product_name: r for r in silver.collect()}
    fi = rows["fast_internet"]
    assert fi.upload_speed == 1000.0 and fi.download_speed == 100.0
    assert str(fi.scraped_at) == "2023-11-01"
    mp = rows["mobile_prepaid_data_15_gb"]
    assert mp.minutes == -1.0 and mp.sms == -1  # unlimited sentinels intact
    assert mp.upload_speed is None  # null passthrough


def test_first_load_then_incremental(spark):
    day1 = clean_products(_raw_products(spark, DAY1))
    first = plan_star_appends(day1, {t: None for t in
                                     ("competitors", "products", "features", "product_prices")})
    assert first["competitors"].count() == 2
    assert first["products"].count() == 3
    assert first["features"].count() == 3
    assert first["product_prices"].count() == 3

    # warehouse now contains day-1 rows
    wh = {k: v for k, v in first.items()}
    day2 = clean_products(_raw_products(spark, DAY2))
    second = plan_star_appends(day2, wh)

    # no new competitors; one new product
    assert second["competitors"].count() == 0
    new_products = {r.product_name for r in second["products"].collect()}
    assert new_products == {"mobile_prepaid_data_5_gb"}

    # features: changed scarlet sub (data 20→25) + the brand-new product
    new_feat = {r.product_name for r in second["features"].collect()}
    assert new_feat == {"mobile_subscription_20_gb", "mobile_prepaid_data_5_gb"}

    # prices: fast_internet 50→55 appends; scarlet feature change creates a
    # new feature_uuid (new price key) and the new product appends
    new_price_keys = second["product_prices"].count()
    assert new_price_keys == 3

    # idempotency: re-planning day 2 against warehouse+day2 appends nothing
    wh2 = {
        k: wh[k].unionByName(second[k].select(wh[k].columns)) for k in wh
    }
    third = plan_star_appends(day2, wh2)
    for table, df in third.items():
        assert df.count() == 0, f"{table} not idempotent"


def test_bug_compat_first_per_key_drops_revert(spark):
    """The reference compares against the EARLIEST stored row (ascending
    ORDER BY + LIMIT 1, reference dags/bigquery.py:295,315): a price that
    changes then reverts to its original is silently dropped. The engine
    default (latest) catches the revert."""
    base = [("p", "c", "cat", "u", 10.0, "2023-11-01", 1.0, None, None, None, None)]
    changed = [("p", "c", "cat", "u", 12.0, "2023-11-02", 1.0, None, None, None, None)]
    reverted = [("p", "c", "cat", "u", 10.0, "2023-11-03", 1.0, None, None, None, None)]

    d1 = clean_products(_raw_products(spark, base))
    wh = plan_star_appends(d1, {t: None for t in
                                ("competitors", "products", "features", "product_prices")})
    d2 = clean_products(_raw_products(spark, changed))
    app2 = plan_star_appends(d2, wh)
    assert app2["product_prices"].count() == 1  # 10→12 detected either way
    wh = {k: wh[k].unionByName(app2[k].select(wh[k].columns)) for k in wh}

    d3 = clean_products(_raw_products(spark, reverted))
    # bug-compat: compare vs earliest (price 10) → revert looks unchanged
    buggy = plan_star_appends(d3, wh, use_latest=False)
    assert buggy["product_prices"].count() == 0
    # intended: compare vs latest (price 12) → revert detected
    fixed = plan_star_appends(d3, wh, use_latest=True)
    assert fixed["product_prices"].count() == 1


def test_pack_anti_join(spark):
    packs1 = spark.createDataFrame(
        [("mobileviking", "combo_a", "u", None, 60.0, "2023-11-01", None, None)],
        RAW_PACK,
    )
    packs2 = spark.createDataFrame(
        [
            ("mobileviking", "combo_a", "u", None, 65.0, "2023-11-02", None, None),
            ("mobileviking", "combo_b", "u", None, 70.0, "2023-11-02", None, None),
        ],
        RAW_PACK,
    )
    assert plan_pack_appends(packs1, None).count() == 1
    new = plan_pack_appends(packs2, packs1)
    # combo_a exists (same key, despite new price) → only combo_b appends
    assert [r.pack_name for r in new.collect()] == ["combo_b"]
