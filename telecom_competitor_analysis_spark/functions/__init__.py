"""Scalar Column-expression builders (the reference's row-at-a-time Python
functions, SURVEY.md §2.3, re-expressed as Catalyst-optimizable native
column expressions), plus text-analysis functions for the extension
surface."""

from telecom_competitor_analysis_spark.functions.cleaning import (  # noqa: F401
    ascii_strip,
    concat_key,
    convert_speed,
    digits_only,
    first_number,
    regex_extract_default,
    status_derive,
    string_clean,
    unlimited_to_float,
)
from telecom_competitor_analysis_spark.functions.keys import surrogate_key  # noqa: F401
