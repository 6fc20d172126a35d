"""Sources & sinks (SURVEY.md §2.1): schema-enforced JSON/NDJSON/parquet
readers, partitioned writers, idempotent DDL, warehouse connector glue."""

from telecom_competitor_analysis_spark.sources.readers import (  # noqa: F401
    load_table,
    load_testdata,
    read_ndjson,
    read_wrapped_json,
)
