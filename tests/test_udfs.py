"""The pandas_udf slow path must agree with the native fast path on every
edge case (and on real testdata-derived strings)."""

from __future__ import annotations

from pyspark.sql import functions as F

from telecom_competitor_analysis_spark.functions.cleaning import convert_speed
from telecom_competitor_analysis_spark.functions.udfs import convert_speed_pandas

CASES = ["1gbps", "100mbps", "  2GBPS ", "50", "12.5", "garbage", "", None]


def test_pandas_udf_matches_native(spark):
    df = spark.createDataFrame([(c,) for c in CASES], "x string")
    rows = df.select(
        convert_speed(F.col("x")).alias("native"),
        convert_speed_pandas()(F.col("x")).alias("vectorized"),
    ).collect()
    for r in rows:
        assert r.native == r.vectorized, (r.native, r.vectorized)
