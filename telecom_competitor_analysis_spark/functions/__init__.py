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
from telecom_competitor_analysis_spark.functions.text import (  # noqa: F401
    bpe_ish_token_count,
    doc_fingerprint,
    exact_fingerprint,
    lang_id_heuristic,
    n_distinct_words,
    n_words,
    stopword_count,
    sum_word_len,
    words,
)
from telecom_competitor_analysis_spark.functions.udfs import (  # noqa: F401
    convert_speed_pandas,
    tokenize_udtf,
    weighted_mean_pandas,
)
