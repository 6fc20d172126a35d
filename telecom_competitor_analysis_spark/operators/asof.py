"""As-of (point-in-time) join — absent from the reference (SURVEY.md
§2.12), exposed because price time series (the reference's whole point,
reference README.md:28) are exactly what as-of joins are for.

Scalable formulation: the naive ``left join right ON key AND r.ts <= l.ts``
+ ``max`` explodes quadratically per key. Instead: UNION the two sides with
a source tag, ONE shuffle on the key, one ordered window pass carrying the
most recent right-side row forward (``last(..., ignorenulls=True)``) — the
classic streaming-merge formulation, linear in rows, skew-safe under AQE.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts_col: str,
    right_value_cols: Sequence[str],
    right_prefix: str = "asof_",
) -> DataFrame:
    """Backward as-of: for each left row, attach the right row with the
    greatest ``ts_col`` <= left's ``ts_col`` (inclusive), per ``on`` key.

    ``right`` should be unique per (on, ts_col) — pre-dedupe with
    ``latest_per_key`` if needed; with duplicates the row carried forward
    is the last in (ts, input-order) which is not guaranteed stable.

    Returns left's columns plus ``{right_prefix}{col}`` for each right
    value column (null when no earlier right row exists).

    All attached values come from ONE matched right row: the right value
    columns travel as a single struct and ``last(struct, ignorenulls)``
    carries the whole row forward. Filling each column independently
    would back-fill a NULL in the matched row from an *older* row and
    could mix columns from different right rows — true ASOF semantics
    (and DuckDB's ASOF JOIN oracle) keep the matched row's nulls.
    """
    on = list(on)
    rv = F.struct(*[F.col(c).alias(c) for c in right_value_cols])
    tagged_right = right.select(
        *on,
        F.col(ts_col).alias("__ts"),
        F.lit(0).alias("__src"),  # rights sort before lefts at equal ts
        rv.alias("__rv"),
    )
    rv_type = tagged_right.schema["__rv"].dataType
    left_cols = left.columns
    tagged_left = left.select(
        *on,
        F.col(ts_col).alias("__ts"),
        F.lit(1).alias("__src"),
        F.lit(None).cast(rv_type).alias("__rv"),
        *[F.col(c).alias(f"__l_{c}") for c in left_cols],
    )
    tagged_right = tagged_right.select(
        *on, "__ts", "__src", "__rv",
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(f"__l_{c}") for c in left_cols],
    )
    unioned = tagged_right.unionByName(tagged_left)

    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__src").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "__src",
        *[F.col(f"__l_{c}").alias(c) for c in left_cols],
        F.last("__rv", ignorenulls=True).over(w).alias("__rv"),
    )
    return (
        filled.filter(F.col("__src") == 1)
        .select(
            *left_cols,
            *[
                F.col("__rv").getField(c).alias(f"{right_prefix}{c}")
                for c in right_value_cols
            ],
        )
    )
