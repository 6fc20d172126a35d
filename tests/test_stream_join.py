"""Stream-stream interval join end-to-end: purchases and clicks arrive as
two file streams, join state survives a checkpointed restart (a click
buffered in batch 1 matches a purchase arriving in batch 2), and the
accumulated output equals the batch twin (q_stream_join's plan) over the
same data — the batch-is-the-oracle pattern."""

from __future__ import annotations

import shutil
import tempfile
from datetime import datetime
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow  # full-run default; excluded by the -m 'not slow' fast tier

from pyspark.sql import types as T

from telecom_competitor_analysis_spark.streaming.joins import (
    click_attribution_join,
)

P_SCHEMA = T.StructType(
    [
        T.StructField("purchase_id", T.LongType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("p_ts", T.TimestampType(), False),
    ]
)
C_SCHEMA = T.StructType(
    [
        T.StructField("click_id", T.LongType(), False),
        T.StructField("c_user_id", T.LongType(), False),
        T.StructField("c_ts", T.TimestampType(), False),
    ]
)


def _ts(h, m):
    return datetime(2024, 1, 1, h, m)


# batch 1: one in-batch match (user 1), one click awaiting its purchase
# (user 2); batch 2: the cross-restart match (user 2, 20 min later —
# inside the 30-min horizon, above the 1-h watermark), an in-batch match
# (user 3), and a purchase with no click in range (user 1)
P1 = [(101, 1, _ts(10, 10))]
C1 = [(201, 1, _ts(10, 0)), (202, 2, _ts(10, 50))]
P2 = [(102, 2, _ts(11, 10)), (103, 3, _ts(11, 5)), (104, 1, _ts(12, 30))]
C2 = [(203, 3, _ts(11, 0))]

EXPECTED = {(101, 201), (102, 202), (103, 203)}


@pytest.fixture()
def dirs():
    root = tempfile.mkdtemp(prefix="stream_join_")
    paths = {n: f"{root}/{n}" for n in ("purchases", "clicks", "ckpt", "out")}
    for n in ("purchases", "clicks"):
        Path(paths[n]).mkdir()
    yield paths
    shutil.rmtree(root, ignore_errors=True)


def test_stream_stream_join_across_restart(spark, dirs):
    def drop(rows, schema, path):
        spark.createDataFrame(rows, schema).write.mode("append").json(path)

    def run_stream_once():
        p = spark.readStream.schema(P_SCHEMA).json(dirs["purchases"])
        c = spark.readStream.schema(C_SCHEMA).json(dirs["clicks"])
        q = (
            click_attribution_join(p, c)
            .writeStream.format("parquet")
            .option("path", dirs["out"])
            .option("checkpointLocation", dirs["ckpt"])
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    drop(P1, P_SCHEMA, dirs["purchases"])
    drop(C1, C_SCHEMA, dirs["clicks"])
    run_stream_once()
    got1 = {
        (r.purchase_id, r.click_id)
        for r in spark.read.parquet(dirs["out"]).collect()
    }
    assert got1 == {(101, 201)}

    drop(P2, P_SCHEMA, dirs["purchases"])
    drop(C2, C_SCHEMA, dirs["clicks"])
    run_stream_once()
    out = spark.read.parquet(dirs["out"])
    got2 = {(r.purchase_id, r.click_id) for r in out.collect()}
    # (102, 202) proves click state crossed the checkpointed restart
    assert got2 == EXPECTED

    # batch twin over the union of all drops must agree exactly
    batch = click_attribution_join(
        spark.createDataFrame(P1 + P2, P_SCHEMA),
        spark.createDataFrame(C1 + C2, C_SCHEMA),
    )
    want = {
        (r.purchase_id, r.click_id, r.user_id, r.secs_before)
        for r in batch.collect()
    }
    got_full = {
        (r.purchase_id, r.click_id, r.user_id, r.secs_before)
        for r in out.collect()
    }
    assert got_full == want


def test_stream_stream_left_outer_emits_null_after_watermark(spark, dirs):
    """leftOuter: the unattributed purchase (104, 12:30) emits its
    null-click row only once the GLOBAL watermark (min over both inputs
    of max-event − delay) passes 12:30 — and a micro-batch runs with
    that watermark. Three bounded runs make the mechanics explicit:
    run A ingests the data (watermark still at its initial value during
    the batch), run B ingests watermark-pump events on BOTH sides
    (advancing the stored watermark to 13:00 at batch end), run C's
    batch then executes WITH watermark 13:00 > 12:30 and evicts/emits
    the null row. This is the real operational behavior of streaming
    outer joins: unmatched rows surface late, only after both inputs'
    event time moves on."""
    def drop(rows, schema, path):
        spark.createDataFrame(rows, schema).write.mode("append").json(path)

    def run_once():
        q = (
            click_attribution_join(
                spark.readStream.schema(P_SCHEMA).json(dirs["purchases"]),
                spark.readStream.schema(C_SCHEMA).json(dirs["clicks"]),
                how="leftOuter",
            )
            .writeStream.format("parquet")
            .option("path", dirs["out"])
            .option("checkpointLocation", dirs["ckpt"])
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    drop(P1 + P2, P_SCHEMA, dirs["purchases"])
    drop(C1 + C2, C_SCHEMA, dirs["clicks"])
    run_once()

    # watermark pumps on both sides (min across inputs governs):
    # clicks → 14:00−1h = 13:00, purchases → 14:10−1h = 13:10
    drop([(998, 98, _ts(14, 10))], P_SCHEMA, dirs["purchases"])
    drop([(299, 99, _ts(14, 0))], C_SCHEMA, dirs["clicks"])
    run_once()

    # a further batch must run for eviction at watermark 13:00
    drop([(997, 97, _ts(15, 10))], P_SCHEMA, dirs["purchases"])
    drop([(298, 96, _ts(15, 0))], C_SCHEMA, dirs["clicks"])
    run_once()

    got = {
        (r.purchase_id, r.click_id)
        for r in spark.read.parquet(dirs["out"]).collect()
    }
    assert (104, None) in got, "null row for the unattributed purchase"
    assert EXPECTED <= got


def test_stream_join_rejects_unsupported_how(spark):
    import pytest as _pytest

    p = spark.createDataFrame(P1, P_SCHEMA)
    c = spark.createDataFrame(C1, C_SCHEMA)
    with _pytest.raises(ValueError, match="inner.*leftOuter"):
        click_attribution_join(p, c, how="full")
