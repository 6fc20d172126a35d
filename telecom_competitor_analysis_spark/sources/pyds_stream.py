"""Spark 4 STREAMING Python DataSource: a deterministic synthetic event
feed with real offset tracking — the streaming counterpart of
``pyds.WrappedJsonDataSource`` and the §2.9 extension-point demo for
sources Structured Streaming has no native reader for (an internal
message bus, a paginated API, a vendor webhook drain).

What it demonstrates, and what the test pins:

- offset lifecycle: ``initialOffset`` → ``read(start)`` returns (rows,
  next offset); the engine persists offsets in the CHECKPOINT, so a
  restarted query resumes exactly where the previous one stopped
  (exactly-once-per-offset, no rows skipped or duplicated),
- deterministic replay: ``readBetweenOffsets(start, end)`` regenerates
  the identical rows for recovery after a failure between commit and
  checkpoint — the contract that makes the source replayable,
- rows are derived purely from the offset counter (event_id = offset
  index), so every batch is reproducible: this is the property a REAL
  implementation must emulate with its upstream's own offsets (Kafka
  offsets, API page cursors, file sequence numbers).

Registration:
``spark.dataSource.register(SyntheticEventsDataSource)`` then
``spark.readStream.format("synthetic_events").load()``.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql.datasource import (
    DataSource,
    SimpleDataSourceStreamReader,
)

_BASE_EPOCH = 1_700_000_000  # fixed: rows are a pure function of offset


class SyntheticEventsDataSource(DataSource):
    """Options: ``rowsPerBatch`` (default 10), ``nUsers`` (default 5)."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return (
            "event_id bigint, ts timestamp, user_id bigint, value double"
        )

    def simpleStreamReader(
        self, schema
    ) -> "SyntheticEventsStreamReader":
        return SyntheticEventsStreamReader(self.options)


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options) -> None:
        self.rows_per_batch = int(options.get("rowsPerBatch", 10))
        self.n_users = int(options.get("nUsers", 5))

    def initialOffset(self) -> dict:
        return {"offset": 0}

    def _rows(self, start: int, end: int) -> list[tuple]:
        # a LIST, not a generator: the engine's prefetch cache
        # copy.copy()s the returned iterable to serve replay, and
        # generators are neither copyable nor re-iterable
        return [
            (
                i,
                datetime.fromtimestamp(_BASE_EPOCH + i, tz=timezone.utc),
                i % self.n_users,
                float(i % 100),
            )
            for i in range(start, end)
        ]

    def read(self, start: dict):
        s = int(start["offset"])
        e = s + self.rows_per_batch
        return (self._rows(s, e), {"offset": e})

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows(int(start["offset"]), int(end["offset"]))
