"""Sink + DDL + ingest-validation coverage (SURVEY.md §2.1 S5/S9, §2.2 P6)."""

from __future__ import annotations

import shutil
import tempfile

import pytest

pytestmark = pytest.mark.slow  # end-to-end job/pipeline tier; fast tier is -m 'not slow'

from telecom_competitor_analysis_spark.schemas import RAW_LOG, RAW_PRODUCT
from telecom_competitor_analysis_spark.sources.ingest import (
    ValidationError,
    ingest_rows,
    validate_required,
)
from telecom_competitor_analysis_spark.sources.readers import read_ndjson
from telecom_competitor_analysis_spark.sources.writers import (
    create_table_if_not_exists,
    write_bigquery,
    write_json,
)
from tests.test_sources import ROWS


def test_json_sink_roundtrip(spark):
    tmp = tempfile.mkdtemp(prefix="sink_")
    try:
        df = spark.createDataFrame([tuple(r.values()) for r in ROWS], RAW_PRODUCT)
        write_json(df, f"{tmp}/products", single_file=True)
        back = read_ndjson(spark, f"{tmp}/products", RAW_PRODUCT)
        assert back.count() == 2
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_compaction_preserves_rows(spark):
    import glob

    from telecom_competitor_analysis_spark.sources.writers import compact_gold

    tmp = tempfile.mkdtemp(prefix="compact_")
    try:
        df = spark.range(0, 10_000)
        # simulate many small appends
        for _ in range(5):
            df.repartition(16).write.mode("append").parquet(f"{tmp}/t")
        before = len(glob.glob(f"{tmp}/t/*.parquet"))
        compact_gold(spark, f"{tmp}/t", target_files=4)
        after = len(glob.glob(f"{tmp}/t/*.parquet"))
        assert after <= 4 < before
        assert spark.read.parquet(f"{tmp}/t").count() == 50_000
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_compaction_recovers_from_crash_between_renames(spark):
    """Crash injection: kill the swap after `path` → `path__old` but before
    `path__compacting` → `path` (the reader-visible window). The next
    compact_gold call must restore the table from `path__old` and complete."""
    import os

    from telecom_competitor_analysis_spark.sources.writers import compact_gold

    tmp = tempfile.mkdtemp(prefix="compact_crash_")
    try:
        spark.range(0, 1_000).repartition(8).write.parquet(f"{tmp}/t")
        # simulate the crash state: staging written, first rename done,
        # second rename never happened
        spark.read.parquet(f"{tmp}/t").repartition(2).write.parquet(
            f"{tmp}/t__compacting"
        )
        os.rename(f"{tmp}/t", f"{tmp}/t__old")
        assert not os.path.exists(f"{tmp}/t")
        compact_gold(spark, f"{tmp}/t", target_files=2)
        assert spark.read.parquet(f"{tmp}/t").count() == 1_000
        assert not os.path.exists(f"{tmp}/t__old")
        assert not os.path.exists(f"{tmp}/t__compacting")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_idempotent_ddl(spark):
    create_table_if_not_exists(spark, "logs_t", "competitor_name STRING, status STRING")
    create_table_if_not_exists(spark, "logs_t", "competitor_name STRING, status STRING")
    assert spark.catalog.tableExists("logs_t")
    spark.sql("DROP TABLE logs_t")


def test_bigquery_sink_gated(spark):
    df = spark.createDataFrame([("x", "ok")], "a string, b string")
    with pytest.raises(RuntimeError, match="disabled"):
        write_bigquery(df, "proj.ds.t")


def test_ingest_validation(spark):
    good = ingest_rows(spark, [
        {"competitor_name": "mobileviking", "scraped_at": "2023-11-01",
         "error_details": "no error", "status": "success"},
    ], RAW_LOG)
    assert validate_required(good, RAW_LOG).count() == 1

    # typed ingest already rejects nulls in non-nullable fields at the edge
    with pytest.raises(Exception, match="(?i)null"):
        ingest_rows(spark, [
            {"competitor_name": None, "scraped_at": "2023-11-01",
             "error_details": None, "status": None},
        ], RAW_LOG)

    # validate_required catches violations arriving via permissive readers
    bad = spark.createDataFrame(
        [(None, "2023-11-01", None, None)],
        "competitor_name string, scraped_at string, error_details string, status string",
    )
    with pytest.raises(ValidationError, match="competitor_name"):
        validate_required(bad, RAW_LOG)


def test_catalog_append_idempotent(spark):
    """The catalog path of the warehouse sink (stand-in for the BigQuery
    leg): idempotent creation, insert-only-new appends — re-running the
    same load appends nothing; genuinely new keys append exactly once."""
    from telecom_competitor_analysis_spark.sources.writers import (
        append_to_catalog_table,
        create_table_if_not_exists,
    )

    spark.sql("DROP TABLE IF EXISTS wh_products")
    try:
        # S9 idempotent DDL: second call is a no-op, not an error
        create_table_if_not_exists(
            spark, "wh_ddl_probe", "pk BIGINT, name STRING"
        )
        create_table_if_not_exists(
            spark, "wh_ddl_probe", "pk BIGINT, name STRING"
        )

        day1 = spark.createDataFrame(
            [(1, "alpha", "2023-11-01"), (2, "beta", "2023-11-01")],
            "pk long, name string, scraped_at string",
        )
        assert append_to_catalog_table(spark, day1, "wh_products", ("pk",)) == 2
        # re-run of the same load: zero rows appended
        assert append_to_catalog_table(spark, day1, "wh_products", ("pk",)) == 0
        assert spark.table("wh_products").count() == 2

        day2 = spark.createDataFrame(
            [(2, "beta", "2023-11-02"), (3, "gamma", "2023-11-02")],
            "pk long, name string, scraped_at string",
        )
        assert append_to_catalog_table(spark, day2, "wh_products", ("pk",)) == 1
        got = {r.pk: r.name for r in spark.table("wh_products").collect()}
        assert got == {1: "alpha", 2: "beta", 3: "gamma"}
    finally:
        spark.sql("DROP TABLE IF EXISTS wh_products")
        spark.sql("DROP TABLE IF EXISTS wh_ddl_probe")


def test_catalog_append_realigns_reordered_columns(spark):
    """insertInto resolves by position: a caller with reordered columns
    must still land values in the right target columns."""
    from telecom_competitor_analysis_spark.sources.writers import (
        append_to_catalog_table,
    )

    spark.sql("DROP TABLE IF EXISTS wh_reorder")
    try:
        day1 = spark.createDataFrame(
            [(1, "alpha", "2023-11-01")],
            "pk long, name string, scraped_at string",
        )
        append_to_catalog_table(spark, day1, "wh_reorder", ("pk",))
        # same schema, different column order
        day2 = spark.createDataFrame(
            [("beta", "2023-11-02", 2)],
            "name string, scraped_at string, pk long",
        )
        assert append_to_catalog_table(spark, day2, "wh_reorder", ("pk",)) == 1
        got = {r.pk: r.name for r in spark.table("wh_reorder").collect()}
        assert got == {1: "alpha", 2: "beta"}
    finally:
        spark.sql("DROP TABLE IF EXISTS wh_reorder")


def test_star_schema_catalog_contract_roundtrip(spark):
    """The full BigQuery-leg contract, one level below the (untested,
    no-GCP-creds) connector glue: STAR_SCHEMA DDL → catalog tables →
    plan_star_appends deltas appended via append_to_catalog_table —
    asserting at the TABLE level that re-running the same load appends
    nothing and a day-2 load appends exactly the true deltas (the
    behavior of reference dags/bigquery.py:223-333, minus its N+1
    point-query loop)."""
    from telecom_competitor_analysis_spark.jobs.clean import clean_products
    from telecom_competitor_analysis_spark.jobs.load import plan_star_appends
    from telecom_competitor_analysis_spark.schemas import (
        RAW_PRODUCT,
        STAR_SCHEMA,
    )
    from telecom_competitor_analysis_spark.sources.writers import (
        append_to_catalog_table,
        create_table_if_not_exists,
    )
    from tests.test_pipeline import DAY1, DAY2

    tables = ("competitors", "products", "features", "product_prices")
    keys = {
        "competitors": ("competitor_name",),
        "products": ("competitor_uuid", "product_name"),
        "features": ("feature_uuid",),
        "product_prices": ("price_uuid",),
    }
    names = {t: f"wh_star_{t}" for t in tables}
    for t in tables:
        spark.sql(f"DROP TABLE IF EXISTS {names[t]}")
    try:
        # DDL round-trip: catalog tables created FROM the star schema,
        # idempotently (second call is a no-op)
        for t in tables:
            ddl = ", ".join(
                f"{f.name} {f.dataType.simpleString()}"
                for f in STAR_SCHEMA[t].fields
            )
            create_table_if_not_exists(spark, names[t], ddl)
            create_table_if_not_exists(spark, names[t], ddl)

        def existing():
            return {t: spark.table(names[t]) for t in tables}

        def load(rows):
            clean = clean_products(spark.createDataFrame(rows, RAW_PRODUCT))
            appends = plan_star_appends(clean, existing())
            return {
                t: append_to_catalog_table(
                    spark, appends[t], names[t], keys[t]
                )
                for t in tables
            }

        day1 = load(DAY1)
        assert day1["competitors"] == 2
        assert day1["product_prices"] == 3
        counts1 = {t: spark.table(names[t]).count() for t in tables}

        # re-run of the SAME load: zero rows appended to every table
        rerun = load(DAY1)
        assert rerun == {t: 0 for t in tables}
        assert {t: spark.table(names[t]).count() for t in tables} == counts1

        # day-2 load: exactly the true deltas (accounting per
        # tests/test_pipeline.py: 1 new product, 2 changed features,
        # 3 price rows)
        day2 = load(DAY2)
        assert day2["competitors"] == 0
        assert day2["products"] == 1
        assert day2["features"] == 2
        assert day2["product_prices"] == 3
        # and day-2 re-run is again a table-level no-op
        assert load(DAY2) == {t: 0 for t in tables}
    finally:
        for t in tables:
            spark.sql(f"DROP TABLE IF EXISTS {names[t]}")
