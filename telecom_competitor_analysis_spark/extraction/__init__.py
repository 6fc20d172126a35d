"""Extraction layer (SURVEY.md §2.1 S1): the reference scrapes competitor
pages with Playwright + BeautifulSoup (reference
dags/viking_class_scraper.py:80-96, dags/scarlet_scraper.py:21-37).
Browser I/O stays outside the engine; what belongs IN the engine is the
extraction contract: HTML → RAW_PRODUCT-shaped rows → typed DataFrame via
sources.ingest. This package provides a dependency-free (stdlib
html.parser) product-card parser implementing that contract so the full
path is testable without a browser; a production deployment swaps in
Playwright for fetching and keeps the same row contract."""

from telecom_competitor_analysis_spark.extraction.html_products import (  # noqa: F401
    parse_products_html,
)
