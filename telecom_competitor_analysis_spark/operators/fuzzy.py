"""Fuzzy (edit-distance) equi-joinable matching via deletion
neighborhoods.

The record-linkage step the reference performs implicitly when it
re-scrapes competitor catalogs and product names drift by a typo
(reference matches only on exact surrogate keys —
/root/reference/dags/bigquery.py:100-122; this operator is the fuzzy
generalization).

Why deletion neighborhoods: two strings within Levenshtein distance 1
ALWAYS share a key in {s} ∪ del1(s) (delete one char at each position):
 - equal strings share s itself,
 - a substitution at position i → both sides' deletion-at-i variants
   are equal,
 - an insertion/deletion → the longer side's deletion variant equals
   the shorter string.
So candidate generation is a plain EQUI-JOIN on the variant key — no
cross join, no theta join — with the exact ``levenshtein`` check run
only on candidates. This is the Ed-Join / FastSS family of blocking
(Bocek et al. 2007, "Fast Similarity Search in Large Dictionaries").

Scale shape: each side explodes to len(s)+1 short keys (bounded by
string length — names/titles, not documents), the join shuffles md5-size
keys, and the verify stage is O(candidates). Completeness is a theorem,
not a heuristic, so the oracle can be the brute-force quadratic
levenshtein filter: blocking changes the plan, never the answer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _deletion_keys(col: Column) -> Column:
    """Array of {s} ∪ del1(s), de-duplicated (e.g. 'aab' → deleting
    position 1 or 2 both yield 'ab')."""
    del1 = F.transform(
        F.sequence(F.lit(1), F.length(col)),
        lambda i: F.concat(
            col.substr(F.lit(1), i - F.lit(1)),
            col.substr(i + F.lit(1), F.length(col)),
        ),
    )
    return F.array_distinct(F.array_append(del1, col))


def edit_distance_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_str: str,
    right_id: str,
    right_str: str,
    max_distance: int = 1,
) -> DataFrame:
    """All (left, right) pairs with levenshtein(left_str, right_str) <=
    ``max_distance`` (currently only 1 is supported — the deletion-
    neighborhood guarantee is specific to distance 1). Returns
    (left_id, right_id, left_str, right_str, distance)."""
    if max_distance != 1:
        raise ValueError(
            "edit_distance_join blocks with 1-deletion neighborhoods,"
            " which are complete only for max_distance=1; use wider"
            " neighborhoods (FastSS k-deletions) for larger distances"
        )
    a = left.select(
        F.col(left_id).alias("__lid"),
        F.col(left_str).alias("__lstr"),
        F.explode(_deletion_keys(F.col(left_str))).alias("__key"),
    )
    b = right.select(
        F.col(right_id).alias("__rid"),
        F.col(right_str).alias("__rstr"),
        F.explode(_deletion_keys(F.col(right_str))).alias("__key"),
    )
    return (
        a.join(b, on="__key")
        .select("__lid", "__lstr", "__rid", "__rstr")
        .distinct()
        .withColumn(
            "distance",
            F.levenshtein(F.col("__lstr"), F.col("__rstr")).cast("int"),
        )
        .filter(F.col("distance") <= max_distance)
        .select(
            F.col("__lid").alias(left_id),
            F.col("__rid").alias(right_id),
            F.col("__lstr").alias(left_str),
            F.col("__rstr").alias(right_str),
            "distance",
        )
    )
