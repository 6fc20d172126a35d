"""Contract tests for jobs/curate.py — the batch curation funnel
(URL dedup → C4 line filter → Gopher → classifier → exact dedup →
near-dup → decontaminate → shard) with its dataset-card lineage table.
Mirrors the jobs/load.py contract-test style: planted rows prove each
screen fires, the lineage table must partition the corpus exactly, and
the shard assignment must be deterministic."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from telecom_competitor_analysis_spark.jobs.curate import (
    curate_batch,
    training_shards,
)

# 40 distinct words -> passes line filter (4 chunks of 10), gopher
# (mean word len in band, stopwords present, distinct fraction 1.0)
def _good_text(tag: str) -> str:
    words = []
    for i in range(40):
        words.append(
            ("the", "is", "of", "and")[i % 4] if i % 10 == 0
            else f"{tag}word{i}"
        )
    return " ".join(words)


@pytest.fixture()
def corpus(spark):
    good = [(i, f"https://ex.com/p{i}", _good_text(f"t{i}")) for i in range(8)]
    planted = [
        # 100: URL dup of doc 0 (tracking-noise variant of the same page)
        (100, "HTTPS://ex.com/p0?utm_source=x#frag", _good_text("t100")),
        # 101: exact content dup of doc 1
        (101, "https://ex.com/p101", _good_text("t1")),
        # 102: near dup of doc 2 (one word changed mid-document)
        (102, "https://ex.com/p102",
         _good_text("t2").replace("t2word25", "CHANGED")),
        # 103: too short for the line filter (one chunk only)
        (103, "https://ex.com/p103", "just five small words here"),
    ]
    return spark.createDataFrame(
        good + planted, "doc_id long, url string, text string"
    )


def test_curate_batch_lineage_partitions_and_screens_fire(spark, corpus):
    eval_docs = spark.createDataFrame(
        # shares every 3-gram with doc 3's text -> decontaminate drops 3
        [(9000, _good_text("t3"))], "doc_id long, text string"
    )
    shards, lineage = curate_batch(
        corpus, eval_docs=eval_docs, n_shards=4
    )
    stages = [r["stage"] for r in lineage]
    assert stages == [
        "url_dedup",
        "line_filter",
        "gopher",
        "classifier",
        "exact_dedup",
        "near_dup",
        "decontaminate",
        "shard",
    ]
    # the card partitions the corpus exactly: in - dropped = out, and
    # each stage's input is the previous stage's output
    assert lineage[0]["rows_in"] == corpus.count()
    for row in lineage:
        assert row["rows_in"] - row["rows_dropped"] == row["rows_out"]
    for a, b in zip(lineage, lineage[1:]):
        assert a["rows_out"] == b["rows_in"]

    by_stage = {r["stage"]: r for r in lineage}
    survivors = {r.doc_id for r in shards.select("doc_id").collect()}
    # each planted row died at its intended screen
    assert by_stage["url_dedup"]["rows_dropped"] >= 1 and 100 not in survivors
    assert by_stage["line_filter"]["rows_dropped"] >= 1 and 103 not in survivors
    assert by_stage["exact_dedup"]["rows_dropped"] >= 1 and 101 not in survivors
    assert by_stage["near_dup"]["rows_dropped"] >= 1 and 102 not in survivors
    assert by_stage["decontaminate"]["rows_dropped"] >= 1 and 3 not in survivors
    # the keepers of each planted dup survived their screens
    for keeper in (0, 1, 2):
        assert keeper in survivors
    assert by_stage["shard"]["rows_dropped"] == 0

    # shard assignment: deterministic, within-shard positions dense
    rows = shards.select("doc_id", "shard", "pos").collect()
    assert {r.shard for r in rows} <= set(range(4))
    per_shard: dict[int, list[int]] = {}
    for r in rows:
        per_shard.setdefault(r.shard, []).append(r.pos)
    for ps in per_shard.values():
        assert sorted(ps) == list(range(1, len(ps) + 1))
    again = {
        (r.doc_id, r.shard, r.pos)
        for r in training_shards(
            shards.select("doc_id", "text"), "doc_id", 4
        ).select("doc_id", "shard", "pos").collect()
    }
    assert again == {(r.doc_id, r.shard, r.pos) for r in rows}


def test_curate_batch_skips_absent_inputs(spark, corpus):
    """No url column + no eval set: the card still lists the full
    funnel, with the two stages recorded as zero-drop passthroughs."""
    shards, lineage = curate_batch(
        corpus.drop("url"), eval_docs=None, url_col=None, n_shards=2
    )
    by_stage = {r["stage"]: r for r in lineage}
    assert by_stage["url_dedup"]["rows_dropped"] == 0
    assert by_stage["decontaminate"]["rows_dropped"] == 0
    # doc 100 (the URL dup) now survives url_dedup; its CONTENT is
    # distinct, so it flows to the end
    assert 100 in {r.doc_id for r in shards.select("doc_id").collect()}


@pytest.mark.slow
def test_curate_main_end_to_end(spark, sf_dir, tmp_path, capsys):
    """The job main over real testdata: shards + lineage land on disk,
    the dataset card prints as JSON, and the counts agree."""
    from telecom_competitor_analysis_spark.jobs import curate

    out = str(tmp_path / "curated")
    curate.main(["--input", sf_dir, "--out", out, "--shards", "4"])
    card = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    lineage = card["dataset_card"]
    shards = spark.read.parquet(f"{out}/shards")
    stored = spark.read.parquet(f"{out}/lineage")
    assert stored.count() == len(lineage)
    final = [r for r in lineage if r["stage"] == "shard"][0]
    assert shards.count() == final["rows_out"] > 0
    # partitioned by shard on disk
    assert shards.select("shard").distinct().count() <= 4
    for row in lineage:
        assert row["rows_in"] - row["rows_dropped"] == row["rows_out"]
