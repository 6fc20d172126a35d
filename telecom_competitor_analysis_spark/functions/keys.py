"""F12 — deterministic surrogate keys.

The reference generates ``str(uuid.uuid4())`` per row (reference
dags/bigquery.py:186-188,241), which is nondeterministic and makes runs
non-reproducible. The engine derives keys as
``sha2(concat_ws('|', business_keys), 256)`` so the same business row
always maps to the same key — reproducible golden outputs, oracle-checkable
(DuckDB ``sha256``), and safely parallel (no key coordination across
executors, unlike sequence-based ids — critical at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def surrogate_key(*business_keys: Column | str) -> Column:
    """sha2-256 hex of the pipe-joined business keys.

    Cast every part to string explicitly; nulls become empty string under
    concat_ws (document: key columns should be non-null business keys).
    """
    parts = [
        (F.col(c) if isinstance(c, str) else c).cast("string")
        for c in business_keys
    ]
    return F.sha2(F.concat_ws("|", *parts), 256)
