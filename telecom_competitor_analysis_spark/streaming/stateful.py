"""Custom stateful streaming operator on the Spark 4
``transformWithStateInPandas`` API (SPARK-46815 "arbitrary stateful
processing v2") — the successor extension point to
``applyInPandasWithState`` (streaming/sessionize.py keeps the v1 demo):
typed named state (ValueState/ListState/MapState), optional TTL, and
timers, backed by the RocksDB state store.

``RunningUserStats`` keeps one ValueState per user — (n_events,
sum_micro, max_micro) with values in integer MICRO-units so the running
sum is exact and replay-stable — and emits the updated running totals
for every user seen in a micro-batch. This is the streaming form of the
cumulative per-user aggregate a batch job would recompute from scratch
each day; state size is O(1) per user (three longs), NOT the event
history, so a year of events costs the same state as a day.

Requires ``spark.sql.streaming.stateStore.providerClass =
...RocksDBStateStoreProvider`` (the v2 API refuses the default
HDFS-backed store) AND the ``protobuf`` package (the v2 state-server
protocol is protobuf-framed; absent here, so the end-to-end test
skips — the same honest boundary as the Airflow DagBag test — while
the processor's aggregation semantics stay unit-tested against a
stubbed ValueState, and the v1 ``applyInPandasWithState`` sessionizer
remains the fully-integration-tested stateful path in this container).
"""

from __future__ import annotations

from typing import Any, Iterator

import numpy as np
import pandas as pd
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)

OUTPUT_SCHEMA = (
    "user_id bigint, n_events bigint, sum_value_micro bigint,"
    " max_value_micro bigint"
)


class RunningUserStats(StatefulProcessor):
    """Per-user running (count, exact micro-unit sum, max) over an
    unbounded event stream."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._agg = handle.getValueState(
            "agg", "n bigint, sum_micro bigint, max_micro bigint"
        )

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: Any
    ) -> Iterator[pd.DataFrame]:
        if self._agg.exists():
            n, sum_micro, max_micro = self._agg.get()
        else:
            n, sum_micro, max_micro = 0, 0, None
        for pdf in rows:
            # half-AWAY-FROM-ZERO, matching every batch-side micro
            # conversion (Spark F.round / DuckDB round) — pandas
            # Series.round is banker's half-to-even and would diverge on
            # exact .5 micro ties (ADVICE r6). Non-finite values are a
            # poisoned-input bug, not data: fail loudly before the int64
            # cast would produce a platform-dependent garbage value.
            v = pdf["value"].astype("float64")
            if not np.isfinite(v).all():
                raise ValueError(
                    "running_user_stats: non-finite value in stream batch"
                )
            micro = (
                np.floor(np.abs(v) * 1_000_000 + 0.5) * np.sign(v)
            ).astype("int64")
            n += len(pdf)
            sum_micro += int(micro.sum())
            if len(micro):
                m = int(micro.max())
                max_micro = m if max_micro is None else max(max_micro, m)
        self._agg.update((n, sum_micro, max_micro))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "sum_value_micro": [sum_micro],
                "max_value_micro": [max_micro],
            }
        )

    def close(self) -> None:
        pass


def running_user_stats(events):
    """Wire the processor: update-mode output, processing-time semantics
    (no event-time timers needed for a pure running aggregate)."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningUserStats(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
