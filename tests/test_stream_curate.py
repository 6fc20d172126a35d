"""Streaming curation end-to-end: a crawl feed arrives as a stream
(Python DataSource) and every micro-batch is probed against a FROZEN
shingle index via foreachBatch — per-batch work ∝ batch, never corpus,
which is what lets curation keep up with a 100 TB crawl. Checkpointed
Trigger.Once restarts pin exactly-once-per-offset: batch 2 probes only
batch-2 documents."""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

import pytest

from pyspark.sql import functions as F

from telecom_competitor_analysis_spark.operators.dedup import (
    build_shingle_index,
    near_dups_against_index,
)
from telecom_competitor_analysis_spark.sources.pyds_stream import (
    SyntheticDocumentsDataSource,
)


@pytest.fixture()
def dirs():
    root = tempfile.mkdtemp(prefix="stream_curate_")
    paths = {n: f"{root}/{n}" for n in ("index", "out", "ckpt")}
    for p in paths.values():
        Path(p).mkdir()
    yield paths
    shutil.rmtree(root, ignore_errors=True)


def test_streaming_dedup_against_frozen_index(spark, dirs):
    # nightly side: freeze the keep-list index once (one boilerplate doc
    # the stream will keep near-duplicating, one unrelated doc)
    keep = spark.createDataFrame(
        [
            (1000, SyntheticDocumentsDataSource.KEEP_TEXT),
            (1001, " ".join(f"other{j}" for j in range(12))),
        ],
        "doc_id long, text string",
    )
    build_shingle_index(keep, "doc_id", "text", dirs["index"], w=3)

    spark.dataSource.register(SyntheticDocumentsDataSource)

    def probe_batch(batch_df, batch_id: int) -> None:
        flagged = near_dups_against_index(
            batch_df, spark, dirs["index"], "doc_id", "text",
            w=3, threshold=0.2,
        ).withColumn("batch_id", F.lit(batch_id))
        flagged.write.mode("append").parquet(dirs["out"])

    def run_once():
        q = (
            spark.readStream.format("synthetic_documents")
            .option("docsPerBatch", "6")
            .load()
            .writeStream.foreachBatch(probe_batch)
            .option("checkpointLocation", dirs["ckpt"])
            .trigger(once=True)
            .start()
        )
        q.awaitTermination(180)

    run_once()  # docs 0-5
    run_once()  # restart: docs 6-11 only (offset resumed from ckpt)

    rows = spark.read.parquet(dirs["out"]).collect()
    flagged = {(r.id_a, r.id_b) for r in rows}
    # every third doc is a planted near-dup of the boilerplate keep doc;
    # novel-vocabulary docs never pair, and nothing pairs with 1001
    assert flagged == {(i, 1000) for i in (0, 3, 6, 9)}
    for r in rows:
        assert r.jaccard >= 0.2
        # exactly-once across the restart: batch 1 processed docs 0-5,
        # batch 2 docs 6-11 — never re-probed, never skipped
        assert (r.id_a < 6) == (r.batch_id == 0)
