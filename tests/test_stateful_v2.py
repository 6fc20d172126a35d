"""transformWithStateInPandas (Spark 4 arbitrary-stateful-processing v2):
the processor's aggregation semantics are unit-tested against a stubbed
ValueState (exact micro-unit accumulation, state continuation across
batches); the end-to-end streaming run requires the protobuf package
(the v2 state-server wire protocol), absent in this container, so that
test skips — the v1 applyInPandasWithState sessionizer keeps the
fully-integrated stateful coverage (tests/test_sessionize.py)."""

from __future__ import annotations

import shutil
import tempfile

import pandas as pd
import pytest

from telecom_competitor_analysis_spark.streaming.stateful import (
    ROCKSDB_PROVIDER,
    RunningUserStats,
)


class _FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = v


class _FakeHandle:
    def __init__(self):
        self.states = {}

    def getValueState(self, name, schema, ttlDurationMs=None):
        return self.states.setdefault(name, _FakeValueState())


def _run_batch(proc, key, frames):
    return list(proc.handleInputRows(key, iter(frames), None))


def test_running_stats_accumulate_across_batches():
    """Two batches through one processor instance: totals continue (the
    contract the checkpointed state store provides in production), sums
    are exact integer micro-units, max tracks across batches."""
    proc = RunningUserStats()
    proc.init(_FakeHandle())

    out1 = _run_batch(
        proc, (7,), [pd.DataFrame({"value": [1.25, 2.5]})]
    )
    assert len(out1) == 1
    r1 = out1[0].iloc[0]
    assert (r1.n_events, r1.sum_value_micro, r1.max_value_micro) == (
        2,
        3_750_000,
        2_500_000,
    )

    out2 = _run_batch(
        proc,
        (7,),
        [pd.DataFrame({"value": [0.5]}), pd.DataFrame({"value": [9.0]})],
    )
    r2 = out2[0].iloc[0]
    assert (r2.n_events, r2.sum_value_micro, r2.max_value_micro) == (
        3 + 1,
        13_250_000,
        9_000_000,
    )
    proc.close()


def test_micro_rounding_matches_batch_convention():
    """Exact .5-micro ties round half-AWAY-FROM-ZERO (the Spark
    F.round / DuckDB convention every batch-side micro conversion uses),
    not pandas banker's rounding — 0.0000005 → 1 micro, -0.0000005 → -1
    micro; and non-finite input fails loudly instead of casting NaN to a
    garbage int64 (ADVICE r6)."""
    import numpy as np

    proc = RunningUserStats()
    proc.init(_FakeHandle())
    # 2.5 / 4.5 / -2.5 micro: banker's → 2 + 4 - 2 = 4; half-away → 3 + 5 - 3 = 5
    out = _run_batch(
        proc,
        (3,),
        [pd.DataFrame({"value": [0.0000025, 0.0000045, -0.0000025]})],
    )
    r = out[0].iloc[0]
    assert r.max_value_micro == 5
    assert r.sum_value_micro == 5

    proc2 = RunningUserStats()
    proc2.init(_FakeHandle())
    with pytest.raises(ValueError, match="non-finite"):
        _run_batch(proc2, (4,), [pd.DataFrame({"value": [1.0, np.nan]})])


def test_empty_batch_emits_current_state():
    proc = RunningUserStats()
    proc.init(_FakeHandle())
    _run_batch(proc, (1,), [pd.DataFrame({"value": [4.0]})])
    out = _run_batch(proc, (1,), [pd.DataFrame({"value": []})])
    r = out[0].iloc[0]
    assert (r.n_events, r.sum_value_micro, r.max_value_micro) == (
        1,
        4_000_000,
        4_000_000,
    )


def test_running_stats_survive_restart_end_to_end(spark):
    """Full streaming run over the synthetic Python source with RocksDB
    state + checkpoint restart. Requires protobuf (v2 state-server wire
    protocol) — skipped where it is not installed."""
    pytest.importorskip("google.protobuf")

    from telecom_competitor_analysis_spark.sources.pyds_stream import (
        SyntheticEventsDataSource,
    )
    from telecom_competitor_analysis_spark.streaming.stateful import (
        running_user_stats,
    )

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, ROCKSDB_PROVIDER)
    spark.dataSource.register(SyntheticEventsDataSource)
    root = tempfile.mkdtemp(prefix="tws_")
    ckpt, out = f"{root}/ckpt", f"{root}/out"
    try:
        def run_once():
            events = (
                spark.readStream.format("synthetic_events")
                .option("rowsPerBatch", "120")
                .load()
            )
            q = (
                running_user_stats(events)
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(once=True)
                .start()
            )
            q.awaitTermination(180)

        run_once()
        run_once()
        rows = spark.read.parquet(out).collect()
        latest = {}
        for r in rows:
            if (
                r.user_id not in latest
                or r.n_events > latest[r.user_id].n_events
            ):
                latest[r.user_id] = r
        expect = {}
        for i in range(240):
            u = i % 5
            n, s, m = expect.get(u, (0, 0, None))
            v = (i % 100) * 1_000_000
            expect[u] = (n + 1, s + v, v if m is None else max(m, v))
        got = {
            u: (r.n_events, r.sum_value_micro, r.max_value_micro)
            for u, r in latest.items()
        }
        assert got == expect
    finally:
        shutil.rmtree(root, ignore_errors=True)
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
