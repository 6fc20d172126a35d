"""Property-based tests (hypothesis): the native column expressions agree
with a straight-Python model of the reference semantics on arbitrary
inputs — not just the hand-picked A6 fixtures."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from telecom_competitor_analysis_spark.functions.cleaning import (
    convert_speed,
    digits_only,
    unlimited_to_float,
)

# unit forms, numbers, junk. Alphabet is ASCII + representative non-ASCII
# (accents, currency, arabic digit): the goal is semantic coverage, not
# chasing Java-vs-Python unicode trivia (NEL-as-whitespace, locale
# lowercasing) — the engine's Java semantics are the spec there.
JUNK_ALPHABET = (
    "abcdefgmpsGMPS0123456789 .#-€é٣Ω"
)
speedish = st.one_of(
    st.from_regex(r"[0-9]{1,4} ?(mbps|gbps|Mbps|GBPS)", fullmatch=True),
    st.from_regex(r"[0-9]{1,6}(\.[0-9]{1,3})?", fullmatch=True),
    st.text(alphabet=JUNK_ALPHABET, max_size=20),
    st.none(),
)


def _model_convert_speed(v):
    # ASCII-digit semantics: Java regex \d is ASCII-only (the engine is the
    # spec; Python's unicode-digit \d is the outlier)
    if v is None:
        return None
    # Spark trim strips the space char only; Java \s is ASCII whitespace
    s = str(v).strip(" ").lower()
    m = re.search(r"([0-9]+)[ \t\n\r\f\x0b]*(mbps|gbps)", s)
    if m:
        return float(m.group(1)) * (1000.0 if m.group(2) == "gbps" else 1.0)
    if re.fullmatch(r"[0-9]+(\.[0-9]+)?", s):
        return float(s)
    return None


def _model_unlimited(v):
    # ASCII numeric forms only — Spark's cast rejects unicode digits that
    # Python's float() accepts (e.g. '٣')
    if v is None:
        return None
    s = str(v).strip()
    if s.lower() == "unlimited":
        return -1.0
    if re.fullmatch(r"[+-]?([0-9]+\.?[0-9]*|\.[0-9]+)([eE][+-]?[0-9]+)?", s):
        return float(s)
    return None


def _model_digits(v):
    if v is None:
        return None
    d = "".join(ch for ch in str(v) if ch.isdigit() and ch.isascii())
    return int(d) if d else None


@settings(max_examples=20, deadline=None)
@given(st.lists(speedish, min_size=1, max_size=30))
def test_convert_speed_property(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "x string")
    got = [r.y for r in df.select(convert_speed(F.col("x")).alias("y")).collect()]
    assert got == [_model_convert_speed(v) for v in values]


@settings(max_examples=20, deadline=None)
@given(st.lists(speedish, min_size=1, max_size=30))
def test_unlimited_property(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "x string")
    got = [
        r.y for r in df.select(unlimited_to_float(F.col("x")).alias("y")).collect()
    ]
    want = [_model_unlimited(v) for v in values]
    for g, w in zip(got, want):
        # Spark casts some exotic numerics (inf/nan spellings) differently;
        # compare only where the model is defined
        if w is not None:
            assert g == w


@settings(max_examples=20, deadline=None)
@given(st.lists(speedish, min_size=1, max_size=30))
def test_digits_only_property(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "x string")
    got = [r.y for r in df.select(digits_only(F.col("x")).alias("y")).collect()]
    assert got == [_model_digits(v) for v in values]
