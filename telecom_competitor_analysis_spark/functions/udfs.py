"""The UDF escape hatch (SURVEY.md §2.10).

Everything in the reference's scalar layer is expressible as native column
expressions (functions/cleaning.py — the fast path: JVM-side, codegen'd).
This module demonstrates the sanctioned slow path for when that stops
being true: an Arrow-vectorized pandas_udf mirror of ``convert_speed``
(reference dags/transform.py:8-29). Pandas UDFs move data via Arrow in
columnar batches (~10-100× faster than row-at-a-time Python UDFs); use
them only when no builtin composition works.
"""

from __future__ import annotations

import functools
import re

import pandas as pd

from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

_SPEED_RE = re.compile(r"(\d+)\s*(mbps|gbps)")
_NUM_RE = re.compile(r"^\d+(\.\d+)?$")


@functools.cache
def convert_speed_pandas():
    """Arrow-batched twin of functions.cleaning.convert_speed — same
    semantics, Python execution. Built lazily (the decorator resolves the
    return type against the active session) and cached. Kept for parity
    testing and as the template for genuinely non-expressible scalar
    logic."""

    def batch(s: pd.Series) -> pd.Series:
        def one(v: object) -> float | None:
            if v is None:
                return None
            text = str(v).strip().lower()
            m = _SPEED_RE.search(text)
            if m:
                n = float(m.group(1))
                return n * 1000.0 if m.group(2) == "gbps" else n
            if _NUM_RE.match(text):
                return float(text)
            return None

        return s.map(one)

    return pandas_udf(batch, T.DoubleType())


@functools.cache
def weighted_mean_pandas():
    """Grouped-aggregate pandas_udf: weighted mean of (value, weight)
    pairs — the UDAF escape hatch for aggregations the builtin algebra
    can't express. Arrow ships each group's columns as pandas Series; the
    aggregate must be a scalar. Note partial aggregation does NOT apply to
    grouped-agg UDFs (each whole group transfers to Python) — keep real
    pipelines on builtin aggregates unless the math truly needs Python."""

    def wmean(v: pd.Series, w: pd.Series) -> float:
        denom = w.sum()
        return float((v * w).sum() / denom) if denom else float("nan")

    return pandas_udf(wmean, T.DoubleType())


@functools.cache
def tokenize_udtf():
    """Python UDTF (table-valued function) — the row-generating escape
    hatch (one input row → many output rows with computed columns). The
    declarative twin is posexplode(split(...)); this exists to cover the
    UDTF API surface and as the template for generators that genuinely
    need Python (e.g. a real tokenizer library). Register with
    ``spark.udtf.register`` for SQL ``LATERAL`` use."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="word: string, pos: int")
    class Tokenize:
        def eval(self, text: str | None):
            if text:
                for i, w in enumerate(text.split(" ")):
                    yield (w, i)

    return Tokenize
