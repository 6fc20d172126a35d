"""S1 extraction contract: HTML cards → bronze rows → typed DataFrame →
clean stage, end-to-end without a browser."""

from __future__ import annotations

from telecom_competitor_analysis_spark.extraction import parse_products_html
from telecom_competitor_analysis_spark.jobs.clean import clean_products
from telecom_competitor_analysis_spark.schemas import RAW_PRODUCT
from telecom_competitor_analysis_spark.sources.ingest import (
    ingest_rows,
    validate_required,
)

HTML = """
<html><body>
  <div class="product-card">
    <span data-field="data">15 GB</span>
    <span data-field="minutes">150 minutes</span>
    <span data-field="sms">Unlimited</span>
    <span data-field="price">€15</span>
  </div>
  <div class="product-card">
    <span data-field="data">Unlimited</span>
    <span data-field="minutes">Unlimited</span>
    <span data-field="sms">Unlimited</span>
    <span data-field="price">€30</span>
    <span data-field="download_speed">1gbps</span>
    <span data-field="upload_speed">100mbps</span>
  </div>
</body></html>
"""


def test_html_to_clean_dataframe(spark):
    rows = parse_products_html(
        HTML, "mobileviking", "mobile_prepaid",
        "http://example/prepaid", scraped_at="2023-11-01",
    )
    assert len(rows) == 2
    assert rows[0]["product_name"] == "mobile_prepaid_15_gb"
    assert rows[0]["sms"] == -1 and rows[0]["minutes"] == 150.0
    assert rows[1]["data"] == -1.0  # unlimited sentinel
    assert rows[1]["download_speed"] == "1gbps"  # raw until clean stage

    df = validate_required(ingest_rows(spark, rows, RAW_PRODUCT), RAW_PRODUCT)
    silver = clean_products(df)
    got = {r.product_name: r for r in silver.collect()}
    assert got["mobile_prepaid_unlimited_gb"].download_speed == 1000.0
    assert got["mobile_prepaid_15_gb"].price == 15.0


def test_parser_ignores_non_card_markup():
    rows = parse_products_html(
        "<div><span data-field='data'>99</span></div><p>noise</p>",
        "x", "cat", "http://u",
    )
    assert rows == []


def test_parser_survives_nested_divs():
    """Layout wrapper <div>s inside a card must not close the card early
    and silently drop the remaining fields (div nesting-depth tracking)."""
    html = """
    <div class="product-card">
      <div class="row"><span data-field="data">15 GB</span></div>
      <div class="row">
        <div class="cell"><span data-field="minutes">150</span></div>
        <div class="cell"><span data-field="sms">Unlimited</span></div>
      </div>
      <span data-field="price">€15</span>
    </div>
    <div class="product-card">
      <div data-field="data">5 GB</div>
      <span data-field="price">€5</span>
    </div>
    """
    rows = parse_products_html(html, "x", "mobile", "http://u",
                               scraped_at="2023-11-01")
    assert len(rows) == 2
    assert rows[0]["data"] == 15.0
    assert rows[0]["minutes"] == 150.0
    assert rows[0]["sms"] == -1
    assert rows[0]["price"] == 15.0
    assert rows[1]["data"] == 5.0 and rows[1]["price"] == 5.0


def test_parser_recovers_from_unclosed_divs():
    """One unclosed wrapper div must not swallow the rest of the page:
    a new product-card flushes the previous (malformed) one."""
    html = """
    <div class="product-card">
      <div class="row"><span data-field="price">5</span>
    </div>
    <div class="product-card">
      <span data-field="price">7</span>
    </div>
    """
    rows = parse_products_html(html, "x", "mobile", "http://u",
                               scraped_at="2023-11-01")
    assert [r["price"] for r in rows] == [5.0, 7.0]


def test_parser_handles_same_tag_nesting_in_field():
    """A nested element with the same tag name inside a data-field must
    not close the field early and drop trailing text."""
    html = """
    <div class="product-card">
      <div data-field="data">15 <div class="badge">extra</div> 99</div>
      <span data-field="price">9</span>
    </div>
    """
    rows = parse_products_html(html, "x", "mobile", "http://u",
                               scraped_at="2023-11-01")
    assert len(rows) == 1
    # field text accumulated across the nested div: first number is 15
    assert rows[0]["data"] == 15.0
    assert rows[0]["price"] == 9.0
