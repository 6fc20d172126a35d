"""Skew-handling join helpers (100 TB design surface).

AQE's skew-join splitting (on by default in session.py) handles most skew
at runtime by subdividing oversized shuffle partitions. ``salted_join`` is
the explicit fallback for the case AQE can't fix: a single hot key whose
*build side* row group must be replicated — e.g. joining a clickstream
against a dimension where one key is 30% of the fact table.

Mechanics: the skewed (large) side gets a random salt in [0, salt); the
small side is exploded ×salt so every salted key finds its match. The hot
key's rows then spread over ``salt`` reducers instead of one.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with salting: ``large`` is salted randomly, ``small`` is
    replicated ×``salt``. Result columns = large's ∪ small's non-key
    columns (like a plain ``join(on=...)``).

    The salt column derives from a hash of the full row plus
    monotonically_increasing_id — effectively uniform, and never touching
    the data's own distribution.

    Only join types where the *small* side never emits unmatched rows are
    supported: the ×salt replication would otherwise emit each unmatched
    small-side row ``salt`` times (duplicate null-padded rows under
    right/full outer). inner/left/semi/anti are replication-safe — an
    unmatched small row is simply absent from those outputs.
    """
    on = list(on)
    normalized = how.lower().replace("_", "")
    if normalized not in {
        "inner", "left", "leftouter", "leftsemi", "leftanti", "semi", "anti",
    }:
        raise ValueError(
            f"salted_join does not support how={how!r}: the small side is "
            "replicated ×salt, so right/full outer joins would duplicate "
            "unmatched small-side rows. Use inner/left/left_semi/left_anti."
        )
    # pmod, NOT abs(hash) % salt: hash() can return Integer.MIN_VALUE,
    # whose abs is still negative — a negative salt value would silently
    # drop those rows from the inner join (~1 in 2^32 rows; a real loss at
    # 100 TB scale). pmod is non-negative by definition.
    salted_large = large.withColumn(
        "__salt",
        F.pmod(
            F.hash(
                *[F.col(c) for c in large.columns],
                F.monotonically_increasing_id(),
            ),
            F.lit(salt),
        ).cast("int"),
    )
    salted_small = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return salted_large.join(salted_small, on=on + ["__salt"], how=how).drop(
        "__salt"
    )
