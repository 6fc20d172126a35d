"""Merge layer (SURVEY.md §2.4, §2.5, §2.7).

The reference's load loop issues one existence/ordered-first SQL query per
record against the warehouse — an N+1 round-trip pattern (reference
dags/bigquery.py:243,281,295,315) — and compares records field-by-field in
Python (``is_different_record``, reference dags/bigquery.py:53-68). Here
each pattern is ONE distributed plan:

- anti-join dedup (J2): one shuffle replaces N point probes,
- broadcast lookup join (J3): dims are tiny → no shuffle at all,
- change detection (J5 + C1): window latest-per-key on the warehouse side,
  one equi-join, a null-safe inequality disjunction — three narrow steps
  instead of per-row SQL.

At 100 TB: the joins shuffle on business keys (hash-partitioned); the
warehouse side is pre-filtered to latest-per-key *before* the join so the
shuffle carries one row per key, not the full history.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def anti_join_new(
    new_df: DataFrame, existing_df: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """J2 — keep rows of ``new_df`` whose key is absent from
    ``existing_df`` (reference dags/bigquery.py:125-157 probes each pack by
    (competitor_name, pack_name); here one ``left_anti``)."""
    return new_df.join(
        existing_df.select(*keys).dropDuplicates(list(keys)),
        on=list(keys),
        how="left_anti",
    )


def lookup_join(
    new_df: DataFrame,
    dim_df: DataFrame,
    keys: Sequence[str],
    lookup_cols: Sequence[str],
    fallback: dict[str, Column] | None = None,
) -> DataFrame:
    """J3 — resolve dimension attributes by business key (reference
    dags/bigquery.py:243-244,281-292 resolves competitor_uuid /
    product_uuid with point queries). Broadcast the dim — dims are small by
    construction; at scale this is a map-side join, zero shuffle.

    ``fallback`` supplies per-column expressions used when the dim has no
    match (the reference generates a fresh uuid in that case)."""
    dim = F.broadcast(dim_df.select(*keys, *lookup_cols).dropDuplicates(list(keys)))
    out = new_df.join(dim, on=list(keys), how="left")
    for col_name, expr in (fallback or {}).items():
        out = out.withColumn(col_name, F.coalesce(F.col(col_name), expr))
    return out


def _ranked(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    descending: bool,
    tie_breakers: Sequence[str],
) -> DataFrame:
    order = [
        F.col(order_col).desc() if descending else F.col(order_col).asc()
    ] + [
        F.col(c).desc() if descending else F.col(c).asc() for c in tie_breakers
    ]
    w = Window.partitionBy(*keys).orderBy(*order)
    return df.withColumn("__rn", F.row_number().over(w))


def first_per_key(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    tie_breakers: Sequence[str] = (),
) -> DataFrame:
    """O1 — earliest row per key (the reference's actual behavior:
    ascending ``ORDER BY scraped_at LIMIT 1``, reference
    dags/bigquery.py:295,315 — despite comments claiming "last record";
    see SURVEY.md §2.5 quirk)."""
    return (
        _ranked(df, keys, order_col, False, tie_breakers)
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def latest_per_key(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    tie_breakers: Sequence[str] = (),
) -> DataFrame:
    """O1 — latest row per key (the reference's *intended* semantics; the
    engine's default for change detection)."""
    return (
        _ranked(df, keys, order_col, True, tie_breakers)
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def null_safe_diff(
    compare_cols: Sequence[str], left_prefix: str = "new", right_prefix: str = "old"
) -> Column:
    """C1 — 'records differ' predicate matching ``is_different_record``
    (reference dags/bigquery.py:53-68): any non-ignored field differs, with
    null-vs-value counting as different and a missing key counting as
    different (reference dags/bigquery.py:66 ``.get(key)`` → None).

    Null-safe equality (``eqNullSafe`` ⇔ SQL ``IS NOT DISTINCT FROM``)
    makes null==null → unchanged, null vs value → changed."""
    diffs = [
        ~F.col(f"{left_prefix}.{c}").eqNullSafe(F.col(f"{right_prefix}.{c}"))
        for c in compare_cols
    ]
    out = F.lit(False)
    for d in diffs:
        out = out | d
    return out


def changed_records(
    new_df: DataFrame,
    warehouse_df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    compare_cols: Sequence[str],
    use_latest: bool = True,
    tie_breakers: Sequence[str] = (),
) -> DataFrame:
    """J5 — SCD-2-style change detection (reference
    dags/bigquery.py:294-326): emit the new rows that are either brand-new
    keys or differ (C1) from the stored baseline row for that key.

    ``use_latest=True`` compares against the latest stored row per key (the
    intended semantics); ``use_latest=False`` reproduces the reference's
    first-per-key bug for compatibility tests (SURVEY.md §2.5 quirk:
    ascending ORDER BY ... LIMIT 1 means a value that changes and later
    reverts is silently dropped).

    Returns ``new_df``'s columns for the rows to append.
    """
    pick = latest_per_key if use_latest else first_per_key
    baseline = pick(warehouse_df, keys, order_col, tie_breakers)
    joined = new_df.alias("new").join(
        baseline.alias("old"), on=list(keys), how="left"
    )
    is_new_key = F.col(f"old.{order_col}").isNull()
    return joined.filter(is_new_key | null_safe_diff(compare_cols)).select("new.*")
