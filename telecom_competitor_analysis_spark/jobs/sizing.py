"""Corpus-statistic knob sizing — who picks n_anchors/k/max_bucket_size
at 100 TB.

Every blocked/bucketed operator in the engine has a scale law written in
its docstring (IVF probe cost ≈ n/nlist + nlist; SemDedup pairs ≈ n²/k;
skew caps bound the worst bucket), but the laws only hold if the knobs
GROW with the corpus: a fixed n_anchors=8 that is perfect at 10⁴ vectors
leaves 10⁹-row buckets at 10¹⁰. This module is the one place that turns
a corpus row count into the knob values, so the nightly
``jobs.build_indexes`` job stays correctly sized as the corpus grows and
nobody hand-tunes per-scale constants.

The rules (classical IVF/clustering practice, not tuned magic):

- ``n_anchors = ceil(sqrt(n))`` — with nlist ≈ √n the probe cost
  n/nlist + nlist ≈ 2√n is minimized and mean bucket occupancy is √n.
- ``max_bucket_size = skew_factor · ceil(n / n_anchors)`` — the
  hot-bucket hash-split cap engages only on buckets ``skew_factor``×
  above the mean, so a balanced index is untouched and a skewed one is
  re-split without changing answers (similarity.py::build_ivf_index).
- ``kmeans_k = ceil(n / target_cluster_size)`` — fixing EXPECTED cluster
  size (not cluster count) keeps SemDedup's within-cluster pair volume
  ≈ n · target_cluster_size / 2: linear in n, never quadratic.
- ``max_df`` (shingle postings) stays CONSTANT by design: it bounds
  per-token candidate volume at max_df²/2 independent of corpus size —
  growing it with n would reintroduce the Θ(N²) blowup the cap exists
  to prevent (operators/setsim.py's measured 1.3 s → 477 s lesson).

Declared queries keep their pinned constants (the DuckDB oracles inline
them); these functions size the MATERIALIZED artifacts that the nightly
job owns, where the corpus count is already being paid.
"""

from __future__ import annotations

import math


def sized_n_anchors(n_rows: int) -> int:
    """IVF anchor count for an ``n_rows``-vector corpus: ceil(sqrt(n)),
    floor 1. A 10× corpus gets ~√10× ≈ 3.16× anchors, so mean bucket
    occupancy (n/nlist = √n) and probe fan-out grow at the SAME √n rate
    instead of occupancy absorbing all the growth."""
    if n_rows < 0:
        raise ValueError(f"n_rows must be >= 0, got {n_rows}")
    return max(1, math.isqrt(max(0, n_rows - 1)) + 1)  # ceil(sqrt(n))


def sized_max_bucket_size(
    n_rows: int, n_anchors: int, skew_factor: int = 8
) -> int:
    """Hot-bucket split threshold: ``skew_factor`` × the mean bucket
    occupancy ceil(n/n_anchors). Balanced buckets never hit it; a
    pathological anchor (all vectors near one centroid) is hash-split
    into ~skew_factor-bounded sub-buckets, keeping the worst probe
    O(mean) instead of O(n)."""
    if n_anchors < 1:
        raise ValueError(f"n_anchors must be >= 1, got {n_anchors}")
    if skew_factor < 1:
        raise ValueError(f"skew_factor must be >= 1, got {skew_factor}")
    return skew_factor * -(-n_rows // n_anchors) if n_rows else skew_factor


def sized_kmeans_k(n_rows: int, target_cluster_size: int = 64) -> int:
    """SemDedup / cluster-blocking k: fix the EXPECTED cluster size so
    within-cluster pair work stays ≈ n·target/2 (linear in n). k grows
    ~10× for a 10× corpus; at n=10¹⁰ and target=1024 that is k≈10⁷
    clusters — a parquet table, not a driver structure."""
    if target_cluster_size < 1:
        raise ValueError(
            f"target_cluster_size must be >= 1, got {target_cluster_size}"
        )
    return max(1, -(-n_rows // target_cluster_size))


def sized_knobs(
    n_vectors: int,
    target_cluster_size: int = 64,
    skew_factor: int = 8,
) -> dict[str, int]:
    """The build_indexes default bundle for an ``n_vectors`` embedding
    corpus: {n_anchors, max_bucket_size, kmeans_k}. One count() on the
    corpus (already paid by the nightly job) fully determines the index
    geometry — no per-scale hand tuning."""
    n_anchors = sized_n_anchors(n_vectors)
    return {
        "n_anchors": n_anchors,
        "max_bucket_size": sized_max_bucket_size(
            n_vectors, n_anchors, skew_factor
        ),
        "kmeans_k": sized_kmeans_k(n_vectors, target_cluster_size),
    }
