"""Planted-data unit tests for operators/features.py — TF-IDF weights and
centroid-outlier ranking verified against hand-computed values (the
oracle-parity sweep in test_oracle_parity.py covers the full-table
queries; these pin the math on inputs small enough to check by hand)."""

from __future__ import annotations

import math

from telecom_competitor_analysis_spark.operators.features import (
    embedding_centroid_outliers,
    tfidf_topk,
)


def test_tfidf_hand_computed(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "durian"),
            (4, None),  # null text contributes no rows and no N
        ],
        "doc_id int, text string",
    )
    out = {
        (r.doc_id, r.word): r
        for r in tfidf_topk(docs, "doc_id", "text", k=3).collect()
    }
    # N=3 (null-text doc excluded); df: apple 1, banana 2, cherry 1, durian 1
    assert out[(1, "apple")].tf == 2 and out[(1, "apple")].df == 1
    assert out[(1, "apple")].tfidf_r == round(2 * math.log(3 / 1), 6)
    assert out[(1, "apple")].rank == 1
    assert out[(1, "banana")].tfidf_r == round(1 * math.log(3 / 2), 6)
    assert out[(1, "banana")].rank == 2
    # doc2: cherry (ln 3) outranks banana (ln 1.5)
    assert out[(2, "cherry")].rank == 1 and out[(2, "banana")].rank == 2
    assert out[(3, "durian")].tfidf_r == round(math.log(3), 6)
    assert (4, None) not in out and all(k[0] != 4 for k in out)


def test_tfidf_topk_caps_terms_per_doc(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b")], "doc_id int, text string"
    )
    rows = tfidf_topk(docs, "doc_id", "text", k=3).collect()
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r.rank)
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in per_doc.values())
    assert len(per_doc[1]) == 3  # capped at k
    assert len(per_doc[2]) == 2  # fewer terms than k


def test_centroid_outlier_flags_the_planted_outlier(spark):
    emb = spark.createDataFrame(
        [
            (1, 0, [1.0, 0.0]),
            (2, 0, [0.9, 0.1]),
            (3, 0, [-1.0, 0.0]),  # planted outlier: opposes the centroid
            (4, 1, [0.0, 1.0]),
            (5, 1, [0.0, 0.8]),
        ],
        "vec_id long, label int, embedding array<double>",
    )
    rows = {
        r.vec_id: r
        for r in embedding_centroid_outliers(emb, dim=2).collect()
    }
    assert rows[3].outlier_rank == 1 and rows[3].cos_centroid < 0
    # label 1: both vectors are colinear with the centroid → cos 1.0,
    # tie broken by vec_id
    assert rows[4].cos_centroid == 1.0 == rows[5].cos_centroid
    assert rows[4].outlier_rank == 1 and rows[5].outlier_rank == 2
    assert rows[1].cos_centroid > rows[3].cos_centroid
