"""Interval-overlap join (interval × interval) via bin replication with
exactly-once pair assignment.

The engine's `q_range_join` covers the point-in-interval case (each
point probes the bin its value falls in). The interval×interval overlap
join — "which promo windows overlapped which availability windows" in
the reference's competitor-tracking domain, "which sessions overlapped
which incidents" in telemetry — needs one more move: BOTH sides
replicate to every fixed-width bin they touch, the join is a plain
equi-join on the bin key, and each qualifying pair is emitted EXACTLY
ONCE by the canonical-bin rule (keep the pair only in the bin containing
``max(start_a, start_b)``) — no `distinct` pass over the join output,
which at scale would be a second full shuffle of the pair stream.

This is the classic spatial-join grid trick (binning = 1-D grid cells;
the exactly-once rule is the "report at the reference point" convention
from grid-based spatial joins). Replication factor per row is
``len/bin_width + 1`` — bounded by construction when interval lengths
are bounded, and the bin key is the shuffle key, so skew only arises
from genuinely hot time windows (AQE skew-join handles those).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _with_bins(df: DataFrame, start: str, end: str, width: int) -> DataFrame:
    """Replicate each interval row to every width-sized bin it touches
    (integer day/unit coordinates, inclusive ends)."""
    return df.withColumn(
        "bin",
        F.explode(
            F.sequence(
                F.floor(F.col(start) / width), F.floor(F.col(end) / width)
            )
        ),
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    keys: tuple[str, str] = ("a_key", "b_key"),
    span: tuple[str, str] = ("s", "e"),
    bin_width: int = 7,
) -> DataFrame:
    """All pairs whose [s, e] integer intervals overlap (inclusive).
    ``left``/``right`` carry (key, s, e); returns (a_key, b_key,
    overlap_len) with overlap_len = min(e) - max(s) + 1 >= 1.

    Exactly-once: the pair is kept only in the bin containing
    max(s_a, s_b); overlap implies that bin is touched by BOTH
    intervals, so every overlapping pair appears in exactly one
    joined bin — no dedup shuffle."""
    if bin_width < 1:
        # bin_width=0 would divide by zero in the bin computation; under
        # non-ANSI Spark that yields NULL bins, the explode drops every
        # row, and the join silently returns empty instead of erroring.
        raise ValueError(f"bin_width must be >= 1, got {bin_width}")
    ka, kb = keys
    s, e = span
    a = _with_bins(
        left.select(
            F.col(ka), F.col(s).alias("sa"), F.col(e).alias("ea")
        ),
        "sa",
        "ea",
        bin_width,
    )
    b = _with_bins(
        right.select(
            F.col(kb), F.col(s).alias("sb"), F.col(e).alias("eb")
        ),
        "sb",
        "eb",
        bin_width,
    )
    return (
        a.join(b, "bin")
        .where(
            (F.col("sa") <= F.col("eb"))
            & (F.col("sb") <= F.col("ea"))
            & (
                F.col("bin")
                == F.floor(F.greatest(F.col("sa"), F.col("sb")) / bin_width)
            )
        )
        .select(
            ka,
            kb,
            (
                F.least(F.col("ea"), F.col("eb"))
                - F.greatest(F.col("sa"), F.col("sb"))
                + 1
            )
            .cast("long")
            .alias("overlap_len"),
        )
    )
