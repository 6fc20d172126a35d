"""Knob-sizing laws (jobs/sizing.py): a 10× corpus must get ~10× the
clusters and ~√10× the IVF anchors, so the scale laws written in the
operator docstrings (probe cost ≈ 2√n, SemDedup pairs ≈ n·target/2)
keep holding as the corpus grows — the r7 VERDICT's "who picks the
knob at 100 TB" closure. Pure driver-side arithmetic, no Spark."""

from __future__ import annotations

import math

import pytest

from telecom_competitor_analysis_spark.jobs.sizing import (
    sized_kmeans_k,
    sized_knobs,
    sized_max_bucket_size,
    sized_n_anchors,
)


def test_ten_x_corpus_scales_anchors_by_sqrt10_and_k_by_10():
    for n in (10_000, 500_000, 80_000_000):
        a1, a10 = sized_n_anchors(n), sized_n_anchors(10 * n)
        assert a10 / a1 == pytest.approx(math.sqrt(10), rel=0.01)
        k1, k10 = sized_kmeans_k(n), sized_kmeans_k(10 * n)
        assert k10 / k1 == pytest.approx(10, rel=0.01)


def test_anchor_rule_is_ceil_sqrt():
    assert sized_n_anchors(0) == 1
    assert sized_n_anchors(1) == 1
    assert sized_n_anchors(100) == 10
    assert sized_n_anchors(101) == 11  # ceil, not round
    assert sized_n_anchors(10**10) == 10**5  # 100 TB-ish corpus: fine


def test_bucket_cap_tracks_mean_occupancy():
    # cap = 8 × mean occupancy: balanced buckets never engage the split
    n = 1_000_000
    a = sized_n_anchors(n)
    cap = sized_max_bucket_size(n, a)
    assert cap == 8 * math.ceil(n / a)
    # and the bundle is self-consistent
    knobs = sized_knobs(n)
    assert knobs["max_bucket_size"] == cap
    assert knobs["n_anchors"] == a
    assert knobs["kmeans_k"] == math.ceil(n / 64)


def test_sizing_guards():
    with pytest.raises(ValueError, match="n_rows"):
        sized_n_anchors(-1)
    with pytest.raises(ValueError, match="n_anchors"):
        sized_max_bucket_size(10, 0)
    with pytest.raises(ValueError, match="target_cluster_size"):
        sized_kmeans_k(10, 0)
