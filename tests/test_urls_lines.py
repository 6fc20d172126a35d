"""Behavioral tests for URL canonicalization (functions/urls.py) and
C4-style line-level cleaning (operators/quality.py::c4_line_filter) on
planted fixtures — the oracle-parity sweep proves engine agreement on
the synthetic corpus; these pin the edge semantics (default-port rules,
tracking-param boundaries, rule-attribution precedence) that the
synthetic URLs/texts don't all exercise."""

from __future__ import annotations

import hashlib

import pytest

from telecom_competitor_analysis_spark.functions.urls import (
    canonicalize_url,
    url_host,
    url_scheme,
)
from telecom_competitor_analysis_spark.operators.quality import c4_line_filter


def _canon(spark, *urls: str) -> list[str]:
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    import pyspark.sql.functions as F

    rows = df.select(canonicalize_url(F.col("u")).alias("c")).collect()
    return [r.c for r in rows]


def test_case_fold_www_port_fragment_slash(spark):
    # the classic variant storm: all six collapse onto one key
    variants = [
        "https://www.Example.COM/a/b?x=1",
        "HTTPS://EXAMPLE.com/a/b?x=1",
        "https://example.com:443/a/b?x=1",
        "https://example.com/a/b/?x=1",
        "https://example.com/a/b?x=1#frag",
        "https://www.example.com:443/a/b//?x=1#s",
    ]
    out = set(_canon(spark, *variants))
    assert out == {"https://example.com/a/b?x=1"}


def test_default_port_is_scheme_specific(spark):
    # :443 is only default for https, :80 only for http — a non-default
    # port must SURVIVE (it addresses a different server)
    a, b, c, d = _canon(
        spark,
        "http://example.com:80/x",
        "http://example.com:443/x",
        "https://example.com:80/x",
        "https://example.com:8080/x",
    )
    assert a == "http://example.com/x"
    assert b == "http://example.com:443/x"
    assert c == "https://example.com:80/x"
    assert d == "https://example.com:8080/x"


def test_tracking_params_removed_others_sorted(spark):
    (c,) = _canon(
        spark,
        "https://e.com/p?utm_source=x&b=2&gclid=g&a=1&fbclid=f&ref=r&utm_campaign=y",
    )
    assert c == "https://e.com/p?a=1&b=2"


def test_tracking_prefix_does_not_overmatch(spark):
    # 'referrer' / 'refresh' start with 'ref' but are NOT tracking params;
    # 'utm' without underscore is not utm_*
    (c,) = _canon(spark, "https://e.com/p?referrer=a&refresh=1&utm=x&ref=gone")
    assert c == "https://e.com/p?referrer=a&refresh=1&utm=x"


def test_query_dropped_entirely_and_empty_path(spark):
    a, b = _canon(
        spark,
        "https://e.com?utm_source=only",
        "https://e.com/",
    )
    # all params tracking → no '?' at all; empty path → '/'
    assert a == "https://e.com/"
    assert b == "https://e.com/"


def test_scheme_and_host_helpers(spark):
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [("HtTpS://WWW.Foo.ORG:443/x#f",), ("not a url",)], "u string"
    )
    rows = df.select(
        url_scheme(F.col("u")).alias("s"), url_host(F.col("u")).alias("h")
    ).collect()
    assert (rows[0].s, rows[0].h) == ("https", "foo.org")
    # non-URL input degrades to empty strings, never nulls/errors
    assert (rows[1].s, rows[1].h) == ("", "")


# ---------------------------------------------------------------------------
# c4_line_filter
# ---------------------------------------------------------------------------


def _words(n: int, tag: str) -> str:
    return " ".join(f"{tag}{i}" for i in range(n))


def test_line_filter_rules_and_counts(spark):
    # doc 1: line1 = 3 clean words (ok), line2 has the badword (cut),
    # line3 = 3 clean (ok), line4 = tail of 1 word (short) → kept 2 < 3
    # → doc dropped entirely
    d1 = _words(3, "a") + " x dup y " + _words(3, "b") + " tail"
    # doc 2: four clean 3-word lines → survives with zero drops
    d2 = " ".join(_words(3, t) for t in ("p", "q", "r", "s"))
    docs = spark.createDataFrame([(1, d1), (2, d2)], "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in c4_line_filter(
            docs, "doc_id", "text", w=3, min_line_words=3, min_kept_lines=3
        ).collect()
    }
    assert set(out) == {2}
    r = out[2]
    assert r.n_lines == 4 and r.n_kept == 4
    assert r.n_drop_short == 0 and r.n_drop_badword == 0
    assert r.n_kept_words == 12
    assert r.clean_md5 == hashlib.md5(d2.encode()).hexdigest()


def test_line_filter_attribution_precedence_and_partition(spark):
    # one 10-word doc, w=3 → lines of 3/3/3/1; plant 'dup' in the 1-word
    # tail: it fails BOTH rules and must count as short (first rule wins)
    text = _words(9, "w") + " dup"
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = c4_line_filter(
        docs, "doc_id", "text", w=3, min_line_words=3, min_kept_lines=1
    ).collect()[0]
    assert r.n_lines == 4
    assert r.n_drop_short == 1 and r.n_drop_badword == 0
    # drop counts partition the line set exactly
    assert r.n_lines == r.n_kept + r.n_drop_short + r.n_drop_badword
    assert r.n_kept_words == 9


def test_line_filter_reassembly_digest(spark):
    # badword line cut from the MIDDLE: digest must be of the survivors
    # joined in order, not of the original text
    text = _words(3, "a") + " u dup v " + _words(3, "c")
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = c4_line_filter(
        docs, "doc_id", "text", w=3, min_line_words=3, min_kept_lines=1
    ).collect()[0]
    surviving = _words(3, "a") + " " + _words(3, "c")
    assert r.clean_md5 == hashlib.md5(surviving.encode()).hexdigest()
    assert r.n_kept == 2 and r.n_drop_badword == 1


def test_line_filter_rejects_bad_width(spark):
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        c4_line_filter(docs, "doc_id", "text", w=0)
