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


def test_ceil_sqrt_matches_isqrt_exhaustively_near_squares():
    # the SQL form (double sqrt ± 1 adjustment, q_sizing_report) must
    # equal the exact integer rule for every n near a perfect square,
    # where double rounding is most dangerous
    def sql_form(n: int) -> int:
        a0 = math.ceil(math.sqrt(float(n))) if n else 0
        if (a0 - 1) * (a0 - 1) >= n:
            a0 -= 1
        elif a0 * a0 < n:
            a0 += 1
        return max(1, a0)

    for base in (0, 1, 2, 10, 999, 10**6, 10**9, 10**10):
        for n in range(max(0, base - 3), base + 4):
            assert sql_form(n) == sized_n_anchors(n), n


def test_sized_knobs_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(st.integers(min_value=0, max_value=10**12))
    def check(n):
        k = sized_knobs(n)
        a = k["n_anchors"]
        assert a >= 1 and (a - 1) * (a - 1) < max(n, 1) <= a * a
        # cap >= mean occupancy, and floor 8 on empty corpora
        assert k["max_bucket_size"] >= max(8, -(-n // a) if n else 8)
        assert k["kmeans_k"] == max(1, -(-n // 64))

    check()
