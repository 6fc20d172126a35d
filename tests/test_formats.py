"""Source/sink format breadth: schema-enforced CSV and ORC round-trips
(parquet and JSON/NDJSON are covered everywhere else), plus the public
operator API import surface."""

from __future__ import annotations

import shutil
import tempfile


def test_csv_roundtrip_with_schema(spark, sf_dir):
    from telecom_competitor_analysis_spark.sources.readers import load_table

    tmp = tempfile.mkdtemp(prefix="csv_")
    try:
        nation = load_table(spark, sf_dir, "nation")
        nation.write.mode("overwrite").option("header", True).csv(f"{tmp}/n")
        back = (
            spark.read.schema(nation.schema)
            .option("header", True)
            .csv(f"{tmp}/n")
        )
        assert sorted(map(tuple, back.collect())) == sorted(
            map(tuple, nation.collect())
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_orc_roundtrip(spark, sf_dir):
    from telecom_competitor_analysis_spark.sources.readers import load_table

    tmp = tempfile.mkdtemp(prefix="orc_")
    try:
        region = load_table(spark, sf_dir, "region")
        region.write.mode("overwrite").orc(f"{tmp}/r")
        back = spark.read.orc(f"{tmp}/r")
        assert sorted(map(tuple, back.collect())) == sorted(
            map(tuple, region.collect())
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_operator_api_surface():
    """The package exports the full operator API (guards the __init__
    re-exports against drift)."""
    import telecom_competitor_analysis_spark.operators as ops

    for name in (
        "asof_join", "curate_corpus", "curate_incremental", "hash_split",
        "dedup_clusters", "exact_dedup_groups", "lsh_candidate_pairs",
        "minhash_signature", "shingle_jaccard_pairs", "simhash16",
        "anti_join_new", "changed_records", "first_per_key",
        "latest_per_key", "lookup_join", "null_safe_diff",
        "as_media_table", "decode_media", "frame_sample",
        "cosine_topk", "incremental_topk", "ivf_topk", "lsh_bucketed_topk",
        "salted_join", "pack_cross_join", "star_split",
    ):
        assert callable(getattr(ops, name)), name
