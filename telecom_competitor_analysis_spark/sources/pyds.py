"""Spark 4 Python DataSource implementation of the wrapped-JSON source
(SURVEY.md §2.1 S2) — the same ``{"<header>": [...]}`` documents
``readers.read_wrapped_json`` handles with multiLine JSON + explode
(reference dags/transform.py:32-49), re-expressed through the
``pyspark.sql.datasource`` extension API.

Why both paths exist: the explode formulation is pure Catalyst (JVM,
whole-stage codegen) and is the production default; this DataSource is
the extension-point demo for formats Spark has NO native reader for —
the shape to copy when the next source is a proprietary binary layout or
an API pager rather than JSON. What it demonstrates:

- file-per-partition parallelism: ``partitions()`` enumerates the glob,
  ``read()`` parses one file per task — scan parallelism scales with the
  file count exactly like the built-in FileScan,
- schema-on-read: the user-declared schema dictates field order and
  types; unknown JSON keys are ignored, missing keys become null —
  PERMISSIVE-style tolerance without a row loop on the driver,
- zero driver-side data movement: the driver only globs paths; all
  parsing happens in executor Python workers.

Registration: ``spark.dataSource.register(WrappedJsonDataSource)`` then
``spark.read.format("wrapped_json").schema(s).option("header", h)
.load(path_or_glob)``.
"""

from __future__ import annotations

import glob as _glob
import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)


class WrappedJsonDataSource(DataSource):
    """``{"<header>": [...]}`` document source; options: ``path``
    (file, directory, or glob), ``header`` (wrapper key, default
    "products")."""

    @classmethod
    def name(cls) -> str:
        return "wrapped_json"

    def schema(self) -> str:
        raise NotImplementedError(
            "wrapped_json requires an explicit .schema(...) — "
            "schema-on-read is the validation contract (readers.py), "
            "inference would re-scan and drift"
        )

    def reader(self, schema) -> "WrappedJsonReader":
        return WrappedJsonReader(schema, self.options)


class _FilePartition(InputPartition):
    def __init__(self, path: str) -> None:
        self.path = path


class WrappedJsonReader(DataSourceReader):
    def __init__(self, schema, options) -> None:
        self.schema = schema
        self.header = options.get("header", "products")
        self.path = options.get("path")
        if not self.path:
            raise ValueError("wrapped_json needs a load(path)")

    def partitions(self) -> list[_FilePartition]:
        p = self.path
        if os.path.isdir(p):
            files = sorted(
                os.path.join(p, f)
                for f in os.listdir(p)
                if f.endswith(".json")
            )
        else:
            files = sorted(_glob.glob(p))
        if not files:
            raise FileNotFoundError(f"wrapped_json: no files match {p}")
        return [_FilePartition(f) for f in files]

    def read(self, partition: _FilePartition):
        with open(partition.path) as f:
            doc = json.load(f)
        fields = [fld.name for fld in self.schema.fields]
        for rec in doc.get(self.header, []):
            yield tuple(rec.get(name) for name in fields)
