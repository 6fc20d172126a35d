"""Property-based tests (hypothesis) for the scalar cleaners: the fixed
testdata exercises the happy path; these generate adversarial inputs
(unicode, whitespace, garbage, overflow) and check the functions against
plain-Python reference implementations of the reference pipeline's
semantics (dags/transform.py:8-29, dags/scarlet_scraper.py:238-244).

One Spark job per hypothesis example: the generated values are batched
into a single DataFrame."""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from telecom_competitor_analysis_spark.functions.cleaning import (
    convert_speed,
    digits_only,
)

_SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# printable-ish text including unicode, no surrogates
_TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0x2FFF),
    max_size=30,
)


@settings(**_SETTINGS)
@given(ns=st.lists(st.integers(0, 10**6), min_size=1, max_size=20))
def test_convert_speed_unit_parse(spark, ns):
    rows = []
    for n in ns:
        rows.append((f"{n}gbps", float(n) * 1000.0))
        rows.append((f"  {n}MBPS ", float(n)))  # case + whitespace
        rows.append((str(n), float(n)))  # bare numeric passthrough
        rows.append((f"speed: {n} mbps!", float(n)))  # unit mid-string
    rows.append(("no digits here", None))
    rows.append(("", None))
    df = spark.createDataFrame(rows, "s string, expected double")
    got = df.select(convert_speed(F.col("s")).alias("g"), "expected").collect()
    for r in got:
        assert r.g == r.expected, f"{r}"


@settings(**_SETTINGS)
@given(texts=st.lists(_TEXT, min_size=1, max_size=20))
def test_digits_only_matches_python_filter(spark, texts):
    def py_ref(s: str):
        d = "".join(c for c in s if c in "0123456789")
        if not d:
            return None
        v = int(d)
        return v if -(2**63) <= v < 2**63 else None  # try_cast overflow → null

    rows = [(t,) for t in texts]
    df = spark.createDataFrame(rows, "s string")
    got = [r.g for r in df.select(digits_only(F.col("s")).alias("g")).collect()]
    want = [py_ref(t) for t in texts]
    assert got == want
