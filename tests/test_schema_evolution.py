"""Schema evolution + bad-row side channel: gold tables must absorb added
columns (mergeSchema reads), and malformed bronze rows must be quarantined
without failing the batch (the PERMISSIVE complement to FAILFAST)."""

from __future__ import annotations

import json
import shutil
import tempfile

from pyspark.sql import functions as F
from pyspark.sql import types as T


def test_gold_absorbs_added_column(spark):
    tmp = tempfile.mkdtemp(prefix="evo_")
    try:
        v1 = spark.createDataFrame(
            [(1, 10.0, "2023-11-01")], "id long, price double, day string"
        )
        v1.write.mode("append").parquet(f"{tmp}/t")
        v2 = v1.withColumn("currency", F.lit("EUR")).withColumn(
            "id", F.col("id") + 1
        )
        v2.write.mode("append").parquet(f"{tmp}/t")
        merged = spark.read.option("mergeSchema", True).parquet(f"{tmp}/t")
        assert set(merged.columns) == {"id", "price", "day", "currency"}
        rows = {r.id: r.currency for r in merged.collect()}
        assert rows == {1: None, 2: "EUR"}  # old rows null-fill new columns
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_corrupt_record_side_channel(spark):
    tmp = tempfile.mkdtemp(prefix="corrupt_")
    try:
        path = f"{tmp}/rows.ndjson"
        with open(path, "w") as f:
            f.write(json.dumps({"id": 1, "name": "ok"}) + "\n")
            f.write("{definitely not json\n")
            f.write(json.dumps({"id": 2, "name": "also ok"}) + "\n")
        schema = T.StructType(
            [
                T.StructField("id", T.LongType(), True),
                T.StructField("name", T.StringType(), True),
                T.StructField("_corrupt_record", T.StringType(), True),
            ]
        )
        df = (
            spark.read.schema(schema)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt_record")
            .json(path)
            .cache()
        )
        good = df.filter(F.col("_corrupt_record").isNull())
        bad = df.filter(F.col("_corrupt_record").isNotNull())
        assert good.count() == 2 and bad.count() == 1
        assert "not json" in bad.first()._corrupt_record
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
