"""S1 — HTML product-card extraction via stdlib html.parser.

The reference selects DOM nodes by CSS class and assembles product dicts
(reference dags/viking_class_scraper.py:99-140 builds prepaid rows from
card elements; field synthesis per dags/viking_class_scraper.py:123-138).
This parser consumes the same card shape — elements tagged with
``data-field`` attributes — and applies the same normalizations at the
edge (sentinel mapping, key synthesis); speed strings stay raw for the
clean stage (engine boundary: extraction emits bronze, cleaning owns
unit parsing).
"""

from __future__ import annotations

import re
import time
from html.parser import HTMLParser


class _CardParser(HTMLParser):
    """Collects text per data-field within each <div class="product-card">.

    Tracks div nesting depth so a plain <div> inside a card (layout
    wrappers, grids) does not prematurely close the card and drop its
    remaining fields; the card closes only when its own outer </div> is
    reached. A data-field closes only when the tag that opened it ends
    (same-name nesting tracked by a field depth counter). Malformed
    markup is self-healing: a new product-card opening while one is
    still open flushes the previous card, so one unclosed wrapper div
    can never swallow the rest of the page."""

    def __init__(self) -> None:
        super().__init__()
        self.cards: list[dict[str, str]] = []
        self._current: dict[str, str] | None = None
        self._field: str | None = None
        self._field_tag: str | None = None
        self._field_depth = 0  # same-name tags open inside the field
        self._depth = 0  # open <div> count inside the current card

    def _flush(self) -> None:
        if self._current:
            self.cards.append(self._current)
        self._current = None
        self._field = None
        self._field_tag = None
        self._field_depth = 0

    def handle_starttag(self, tag, attrs):
        a = dict(attrs)
        if tag == "div" and "product-card" in (a.get("class") or ""):
            if self._current is not None:
                self._flush()  # unclosed previous card: recover
            self._current = {}
            self._depth = 1
            return
        if self._current is None:
            return
        if tag == "div":
            self._depth += 1
        if self._field is not None and tag == self._field_tag:
            self._field_depth += 1
        elif a.get("data-field"):
            self._field = a["data-field"]
            self._field_tag = tag
            self._field_depth = 0

    def handle_endtag(self, tag):
        if self._current is None:
            return
        field_closed_div = False
        if self._field is not None and tag == self._field_tag:
            if self._field_depth > 0:
                self._field_depth -= 1
            else:
                self._field = None
                self._field_tag = None
                field_closed_div = tag == "div"
                if not field_closed_div:
                    return
        if tag == "div":
            self._depth -= 1
            if self._depth <= 0:
                self._flush()

    def handle_data(self, data):
        if self._current is not None and self._field:
            self._current[self._field] = (
                self._current.get(self._field, "") + data.strip()
            )


def _unlimited_or_float(s: str | None) -> float | None:
    """Sentinel mapping at the edge (reference dags/utils.py:31-32)."""
    if s is None or s == "":
        return None
    if s.strip().lower() == "unlimited":
        return -1.0
    m = re.search(r"\d+(\.\d+)?", s)
    return float(m.group(0)) if m else None


def parse_products_html(
    html: str,
    competitor_name: str,
    product_category: str,
    base_url: str,
    scraped_at: str | None = None,
) -> list[dict]:
    """Parse product cards → RAW_PRODUCT-shaped dicts (bronze rows).

    Product-name synthesis mirrors the reference's key format
    ``{category}_{data}_gb`` (reference dags/viking_class_scraper.py:127);
    date stamping per reference dags/viking_class_scraper.py:43.
    """
    parser = _CardParser()
    parser.feed(html)
    stamp = scraped_at or time.strftime("%Y-%m-%d")
    rows: list[dict] = []
    for card in parser.cards:
        data_gb = _unlimited_or_float(card.get("data"))
        data_label = (
            "unlimited" if data_gb == -1.0 else str(int(data_gb or 0))
        )
        sms = _unlimited_or_float(card.get("sms"))
        minutes = _unlimited_or_float(card.get("minutes"))
        rows.append(
            {
                "product_name": f"{product_category}_{data_label}_gb",
                "competitor_name": competitor_name,
                "product_category": product_category,
                "product_url": base_url,
                "price": _unlimited_or_float(card.get("price")),
                "scraped_at": stamp,
                "data": data_gb,
                "minutes": minutes,
                "sms": int(sms) if sms is not None else None,
                "upload_speed": card.get("upload_speed") or None,
                "download_speed": card.get("download_speed") or None,
            }
        )
    return rows
