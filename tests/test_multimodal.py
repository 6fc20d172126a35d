"""Multimodal plumbing tests: the stubbed decoder must be deterministic
and the Arrow-batched pipeline shape real (schema, batch iteration,
column pruning of the binary payload)."""

from __future__ import annotations

from telecom_competitor_analysis_spark.operators.multimodal import (
    as_media_table,
    decode_media,
    frame_sample,
)
from telecom_competitor_analysis_spark.sources.readers import load_table


def test_decode_is_deterministic_and_typed(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    media = as_media_table(docs, "doc_id", "text")
    a = {r.media_id: (r.width, r.height, r.n_frames, r.checksum)
         for r in decode_media(media).collect()}
    b = {r.media_id: (r.width, r.height, r.n_frames, r.checksum)
         for r in decode_media(media).collect()}
    assert a == b and len(a) == 50
    assert all(v[0] is not None and 16 <= v[0] < 80 for v in a.values())


def test_frame_sample_counts(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(20)
    decoded = decode_media(as_media_table(docs, "doc_id", "text"))
    frames = frame_sample(decoded, every_nth=2)
    n_frames = {r.media_id: r.n_frames for r in decoded.collect()}
    got = frames.groupBy("media_id").count().collect()
    for r in got:
        expect = (n_frames[r.media_id] + 1) // 2  # every 2nd frame from 0
        assert r["count"] == expect


def test_metadata_query_prunes_payload(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    media = as_media_table(docs, "doc_id", "text")
    meta_only = media.select("media_id", "media_type")
    plan = meta_only._jdf.queryExecution().optimizedPlan().toString()
    assert "payload" not in plan, "binary payload must be pruned from metadata plans"


def test_frame_sample_metadata_matches_decode(spark, sf_dir):
    """The metadata path (with_frame_count — header-derived frame count,
    SQL-expressible) must agree row-for-row with the decode path on the
    deterministic fixtures."""
    from telecom_competitor_analysis_spark.operators.multimodal import (
        with_frame_count,
    )
    from telecom_competitor_analysis_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").limit(50)
    media = as_media_table(docs, "doc_id", "text")
    via_meta = frame_sample(with_frame_count(media), every_nth=2)
    via_decode = frame_sample(decode_media(media), every_nth=2)
    a = sorted(map(tuple, via_meta.collect()))
    b = sorted(map(tuple, via_decode.collect()))
    assert a == b and len(a) > 0
