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

from datetime import date, datetime, timedelta, timezone

from pyspark.sql.datasource import (
    DataSource,
    SimpleDataSourceStreamReader,
)

_BASE_EPOCH = 1_700_000_000  # fixed: rows are a pure function of offset
_BASE_DATE = date(2023, 11, 1)  # products feed day-0 scrape date


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


class SyntheticDocumentsDataSource(DataSource):
    """Streaming RAW-document feed (a crawl drain): each micro-batch is
    ``docsPerBatch`` documents, rows a pure function of the offset.
    Every third document is a NEAR-DUPLICATE of the fixed boilerplate
    ``KEEP_TEXT`` (same 3-gram core + a per-doc suffix word); the rest
    are all-novel vocabulary. Drives the streaming-curation loop —
    foreachBatch probing each arriving batch against a FROZEN shingle
    index (tests/test_stream_curate.py): the per-batch cost of
    ``near_dups_against_index`` is ∝ batch, never corpus, which is the
    property that makes curation keep up with a crawl at 100 TB."""

    KEEP_TEXT = (
        "the quick brown fox jumps over the lazy dog near the old river"
    )

    @classmethod
    def name(cls) -> str:
        return "synthetic_documents"

    @classmethod
    def text_for(cls, i: int, scramble: bool = False) -> str:
        """The feed's row content as a pure function of the offset —
        exposed so tests can recompute any batch's documents exactly
        (the exactly-once assertions and batch-side expectation
        recomputes all go through this single definition).

        ``scramble=True`` (reader option ``scrambleDups``) emits the
        planted duplicates with their words SORTED: the bag of words —
        hence any bag-of-words embedding — is unchanged, but the 3-gram
        shingles are destroyed, so a shingle screen misses them while
        an embedding screen still catches them (the SemDedup case the
        5th admission screen exists for)."""
        if i % 3 == 0:
            core = (
                " ".join(sorted(cls.KEEP_TEXT.split()))
                if scramble
                else cls.KEEP_TEXT
            )
            return f"{core} tail{i}"
        return " ".join(f"w{i}x{j}" for j in range(12))

    def schema(self) -> str:
        return "doc_id bigint, text string"

    def simpleStreamReader(self, schema) -> "SyntheticDocumentsStreamReader":
        return SyntheticDocumentsStreamReader(self.options)


class SyntheticDocumentsStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options) -> None:
        self.per_batch = int(options.get("docsPerBatch", 6))
        self.scramble = (
            str(options.get("scrambleDups", "false")).lower() == "true"
        )

    def initialOffset(self) -> dict:
        return {"offset": 0}

    def _rows(self, start: int, end: int) -> list[tuple]:
        return [
            (i, SyntheticDocumentsDataSource.text_for(i, self.scramble))
            for i in range(start, end)
        ]

    def read(self, start: dict):
        s = int(start["offset"])
        e = s + self.per_batch
        return (self._rows(s, e), {"offset": e})

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows(int(start["offset"]), int(end["offset"]))


class SyntheticProductsDataSource(DataSource):
    """Streaming RAW-product feed: each micro-batch is one day's scrape
    of a fixed catalog (``productsPerDay``, default 4), rows a pure
    function of the offset (product p on day d: price bumps for p == 0
    from day 1 on, everything else stable). The bronze-arrival twin of
    ``SyntheticEventsDataSource`` — drives the foreachBatch star merge
    end-to-end over the Python-source extension point
    (tests/test_stream_merge.py), pinning the reference's load semantics
    (J2/J5, reference dags/bigquery.py:223-333) under restart: day-2
    must append only the price delta, never re-insert day-1."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_products"

    def schema(self) -> str:
        return (
            "product_name string, competitor_name string,"
            " product_category string, product_url string, price double,"
            " scraped_at string, data double, minutes double, sms bigint,"
            " upload_speed string, download_speed string"
        )

    def simpleStreamReader(self, schema) -> "SyntheticProductsStreamReader":
        return SyntheticProductsStreamReader(self.options)


class SyntheticProductsStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options) -> None:
        self.per_day = int(options.get("productsPerDay", 4))

    def initialOffset(self) -> dict:
        return {"offset": 0}

    def _rows(self, start: int, end: int) -> list[tuple]:
        out = []
        for i in range(start, end):
            day, p = divmod(i, self.per_day)
            price = 10.0 + p + (2.0 if (p == 0 and day >= 1) else 0.0)
            out.append(
                (
                    f"plan_{p}",
                    f"comp_{p % 2}",
                    "mobile" if p % 2 == 0 else "internet",
                    f"https://example.test/plan_{p}",
                    price,
                    # real date arithmetic — day 30+ must roll into
                    # December, not fabricate '2023-11-31'
                    (_BASE_DATE + timedelta(days=day)).isoformat(),
                    float(10 * (p + 1)),
                    -1.0 if p == 0 else float(100 * (p + 1)),
                    500 + 10 * p,
                    f"{p + 1}0mbps",
                    "1gbps",
                )
            )
        return out

    def read(self, start: dict):
        s = int(start["offset"])
        e = s + self.per_day  # one day per micro-batch
        return (self._rows(s, e), {"offset": e})

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows(int(start["offset"]), int(end["offset"]))
