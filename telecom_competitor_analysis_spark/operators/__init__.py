"""Relational operators (SURVEY.md §2.4–§2.8) plus the large-scale
training-data extension operators (dedup, similarity, text, multimodal)."""

from telecom_competitor_analysis_spark.operators.merge import (  # noqa: F401
    anti_join_new,
    changed_records,
    first_per_key,
    latest_per_key,
    lookup_join,
    null_safe_diff,
)
from telecom_competitor_analysis_spark.operators.star import (  # noqa: F401
    pack_cross_join,
    star_split,
)
