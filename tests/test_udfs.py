"""The pandas_udf slow path must agree with the native fast path on every
edge case (and on real testdata-derived strings)."""

from __future__ import annotations

from pyspark.sql import functions as F

from telecom_competitor_analysis_spark.functions.cleaning import convert_speed
from telecom_competitor_analysis_spark.functions.udfs import convert_speed_pandas

CASES = ["1gbps", "100mbps", "  2GBPS ", "50", "12.5", "garbage", "", None]


def test_grouped_agg_pandas_udf(spark):
    from telecom_competitor_analysis_spark.functions.udfs import (
        weighted_mean_pandas,
    )

    df = spark.createDataFrame(
        [("a", 1.0, 1.0), ("a", 3.0, 3.0), ("b", 10.0, 2.0), ("b", 20.0, 0.0)],
        "grp string, v double, w double",
    )
    got = {
        r.grp: r.wm
        for r in df.groupBy("grp")
        .agg(weighted_mean_pandas()(F.col("v"), F.col("w")).alias("wm"))
        .collect()
    }
    assert got["a"] == (1.0 * 1 + 3.0 * 3) / 4  # 2.5
    assert got["b"] == 10.0  # zero-weight row ignored


def test_udtf_matches_posexplode(spark):
    from telecom_competitor_analysis_spark.functions.udfs import tokenize_udtf

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "x y")], "doc_id long, text string"
    )
    spark.udtf.register("tokenize", tokenize_udtf())
    docs.createOrReplaceTempView("docs_v")
    got = sorted(
        map(
            tuple,
            spark.sql(
                "SELECT d.doc_id, t.word, t.pos FROM docs_v d, "
                "LATERAL tokenize(d.text) t"
            ).collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            docs.select(
                "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word")
            ).select("doc_id", "word", "pos").collect(),
        )
    )
    assert got == want


def test_pandas_udf_matches_native(spark):
    df = spark.createDataFrame([(c,) for c in CASES], "x string")
    rows = df.select(
        convert_speed(F.col("x")).alias("native"),
        convert_speed_pandas()(F.col("x")).alias("vectorized"),
    ).collect()
    for r in rows:
        assert r.native == r.vectorized, (r.native, r.vectorized)
