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
import shutil
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
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

    def writer(self, schema, overwrite: bool) -> "WrappedJsonWriter":
        return WrappedJsonWriter(schema, self.options, overwrite)


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


@dataclass
class _PartCommit(WriterCommitMessage):
    """Per-task commit message: where the task staged its shard and how
    many records it holds (must stay a picklable dataclass — it rides
    the executor → driver commit channel)."""

    staged: str
    rows: int


class WrappedJsonWriter(DataSourceWriter):
    """Writer twin of the reader — emits ``{"<header>": [...]}``
    documents, one shard per non-empty task (the reference's raw JSON
    sink shape, reference dags/extract.py's payload files), with the
    standard two-phase sink protocol the built-in FileFormatWriter
    uses: each task writes to a job-scoped STAGING directory and
    returns a commit message; only the driver's ``commit`` renames
    shards into place (atomic on a POSIX filesystem), and ``abort``
    removes the staging dir — a failed/speculated task can never leave
    a half-written shard visible. Extension-point demo like the
    reader: the production JSON sink remains writers.write_json
    (JVM-side); at cluster scale the rename step would become an
    object-store multipart commit."""

    def __init__(self, schema, options, overwrite: bool) -> None:
        self.header = options.get("header", "products")
        self.path = options.get("path")
        if not self.path:
            raise ValueError("wrapped_json needs a save(path)")
        self.overwrite = overwrite
        # job-scoped id: one uuid per WRITE JOB (the writer object is
        # constructed on the driver and shipped to tasks, so every task
        # of this job shares it; a concurrent job gets its own). The id
        # also prefixes the FINAL shard names, so append-mode jobs can
        # never clobber a previous job's part files (r8 review: a fixed
        # part-{i} name silently destroyed earlier appends).
        self.job_id = uuid.uuid4().hex
        self.staging = os.path.join(self.path, f"_staging-{self.job_id}")
        self.fields = [fld.name for fld in schema.fields]

    def write(self, iterator) -> _PartCommit:
        recs = [
            {name: row[name] for name in self.fields} for row in iterator
        ]
        if not recs:
            # empty partition → no shard (the runtime rejects a bare
            # None return, so an empty sentinel message carries it)
            return _PartCommit(staged="", rows=0)
        os.makedirs(self.staging, exist_ok=True)
        staged = os.path.join(self.staging, f"part-{uuid.uuid4().hex}.json")
        with open(staged, "w") as f:
            json.dump({self.header: recs}, f, default=str)
        return _PartCommit(staged=staged, rows=len(recs))

    def commit(self, messages) -> None:
        os.makedirs(self.path, exist_ok=True)
        if self.overwrite:
            for old in _glob.glob(os.path.join(self.path, "part-*.json")):
                os.remove(old)
        for i, m in enumerate(messages):
            if m is None or not m.staged:
                continue  # failed-slot placeholder / empty partition
            os.replace(
                m.staged,
                os.path.join(
                    self.path, f"part-{self.job_id}-{i:05d}.json"
                ),
            )
        shutil.rmtree(self.staging, ignore_errors=True)

    def abort(self, messages) -> None:
        shutil.rmtree(self.staging, ignore_errors=True)
