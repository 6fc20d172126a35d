"""as-of join unit semantics: the attached values must all come from THE
matched right row — including its NULLs. Filling value columns
independently would back-fill a matched-row NULL from an older row and
could stitch columns from different right rows (ADVICE round 1)."""

from __future__ import annotations

from telecom_competitor_analysis_spark.operators.asof import asof_join


def _frames(spark):
    left = spark.createDataFrame(
        [("k", 5), ("k", 15), ("k", 25), ("z", 10)],
        "key string, ts long",
    )
    # right rows at ts 0 (price 100/qty 1), ts 10 (price NULL/qty 2),
    # ts 20 (price 300/qty NULL)
    right = spark.createDataFrame(
        [("k", 0, 100, 1), ("k", 10, None, 2), ("k", 20, 300, None)],
        "key string, ts long, price int, qty int",
    )
    return left, right


def test_asof_carries_matched_row_nulls(spark):
    left, right = _frames(spark)
    got = {
        (r.key, r.ts): (r.asof_price, r.asof_qty)
        for r in asof_join(
            left, right, on=["key"], ts_col="ts",
            right_value_cols=["price", "qty"],
        ).collect()
    }
    assert got[("k", 5)] == (100, 1)       # matched row ts=0
    # matched row ts=10 has price NULL — must NOT back-fill 100 from ts=0
    assert got[("k", 15)] == (None, 2)
    # matched row ts=20 has qty NULL — must NOT carry qty=2 from ts=10
    assert got[("k", 25)] == (300, None)
    assert got[("z", 10)] == (None, None)  # no earlier right row


def test_asof_inclusive_at_equal_ts(spark):
    left, right = _frames(spark)
    got = {
        (r.key, r.ts): r.asof_price
        for r in asof_join(
            left.selectExpr("key", "ts * 2 as ts").selectExpr(
                "key", "ts / 2 as _", "cast(10 as long) as ts"
            ).select("key", "ts").distinct(),
            right, on=["key"], ts_col="ts", right_value_cols=["price"],
        ).collect()
    }
    # left ts == right ts → the equal-ts right row matches (backward
    # inclusive), so price is the ts=10 row's NULL, not ts=0's 100
    assert got[("k", 10)] is None
