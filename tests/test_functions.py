"""Unit tests for the scalar-function module (FIXTURES.md §A6 — the exact
edge cases visible in the reference: dags/transform.py:17-29,
dags/utils.py:31-32, dags/viking_class_scraper.py:204-208)."""

from __future__ import annotations

from pyspark.sql import functions as F

from telecom_competitor_analysis_spark.functions.cleaning import (
    ascii_strip,
    convert_speed,
    digits_only,
    first_number,
    regex_extract_default,
    status_derive,
    string_clean,
    unlimited_to_float,
)


def _eval(spark, col, values, in_type="string"):
    df = spark.createDataFrame([(v,) for v in values], f"x {in_type}")
    return [r.y for r in df.select(col(F.col("x")).alias("y")).collect()]


def test_convert_speed_units(spark):
    got = _eval(
        spark,
        convert_speed,
        ["1gbps", "100mbps", "  100MBPS ", "2Gbps", "nonsense", None],
    )
    assert got == [1000.0, 100.0, 100.0, 2000.0, None, None]


def test_convert_speed_numeric_passthrough(spark):
    assert _eval(spark, convert_speed, ["50", "12.5", None]) == [50.0, 12.5, None]
    # already-numeric column (reference dags/transform.py:19-20)
    assert _eval(spark, convert_speed, [50, None], "int") == [50.0, None]


def test_unlimited_sentinel(spark):
    got = _eval(spark, unlimited_to_float, ["Unlimited", "unlimited", "200", None])
    assert got == [-1.0, -1.0, 200.0, None]


def test_regex_extract_default(spark):
    col = lambda c: regex_extract_default(c, r"(\d+) minutes")  # noqa: E731
    got = _eval(spark, col, ["150 minutes and 200 texts", "unlimited calls", None])
    assert got == [150.0, -1.0, -1.0]


def test_first_number_and_digits(spark):
    assert _eval(spark, first_number, ["€25 discount", "no digits"]) == [25, None]
    assert _eval(spark, digits_only, ["a1b2c3", "Brand#13", "xyz"]) == [123, 13, None]


def test_ascii_strip(spark):
    assert _eval(spark, ascii_strip, ["Scarlet Trio é€", "plain"]) == [
        "Scarlet Trio ",
        "plain",
    ]


def test_string_clean_and_status(spark):
    col = lambda c: string_clean(c, {"GB": "", " ": "_"})  # noqa: E731
    assert _eval(spark, col, ["  15 GB Data "]) == ["15__data"]
    assert _eval(spark, status_derive, ["no error", "timeout"]) == [
        "success",
        "failed",
    ]
