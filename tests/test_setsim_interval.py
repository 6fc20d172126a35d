"""Behavior tests for the round-7 continuation operators: prefix-filter
set-similarity join (operators/setsim.py) and the interval-overlap join
(operators/interval.py). The declared queries' oracles prove end-to-end
parity; these pin the operator-level edge cases on crafted rows."""

from __future__ import annotations

from pyspark.sql import functions as F

from telecom_competitor_analysis_spark.operators.interval import (
    interval_overlap_join,
)
from telecom_competitor_analysis_spark.operators.setsim import (
    prefix_filter_pairs,
    pruned_token_sets,
)


def _intervals(spark, rows, key):
    return spark.createDataFrame(rows, f"{key} long, s long, e long")


def test_interval_overlap_edge_cases(spark):
    """Touching endpoints count (inclusive ends), disjoint don't,
    nesting counts, and bin-boundary-crossing pairs appear exactly
    once despite being joinable in several bins."""
    a = _intervals(spark, [(1, 0, 13), (2, 20, 21), (3, 40, 45)], "a_key")
    b = _intervals(
        spark,
        [
            (10, 13, 15),   # touches a1 at 13 → overlap_len 1
            (11, 5, 6),     # nested in a1 → 2
            (12, 22, 30),   # overlaps a2 at [22,21]? no: s=22 > e=21 → none
            (13, 46, 50),   # disjoint from a3
        ],
        "b_key",
    )
    got = {
        (r.a_key, r.b_key): r.overlap_len
        for r in interval_overlap_join(a, b, bin_width=7).collect()
    }
    assert got == {(1, 10): 1, (1, 11): 2}


def test_interval_overlap_exactly_once_across_bins(spark):
    """A pair of long intervals sharing MANY bins must be emitted once,
    with the full overlap length."""
    a = _intervals(spark, [(1, 0, 100)], "a_key")
    b = _intervals(spark, [(2, 50, 200)], "b_key")
    rows = interval_overlap_join(a, b, bin_width=7).collect()
    assert len(rows) == 1
    assert rows[0].overlap_len == 51  # [50, 100] inclusive


def test_setsim_df_caps_and_threshold(spark):
    """The ubiquitous token is pruned by the relative cap, the
    absolute cap prunes independently, and the Jaccard threshold is
    integer-exact over the PRUNED sets."""
    docs = spark.createDataFrame(
        [
            (0, "common rare1 rare2"),
            (1, "common rare1 rare2"),
            (2, "common rare1 zzz"),
            (3, "common aaa bbb"),
            (4, "common ccc ddd"),
            (5, "common eee fff"),
            (6, "common ggg hhh"),
            (7, "common iii jjj"),
            (8, "common kkk lll"),
            (9, "common mmm nnn"),
        ],
        "doc_id long, text string",
    )
    sets = pruned_token_sets(
        docs, "doc_id", F.split(F.trim(F.col("text")), " "),
        max_df_frac=0.2, max_df_abs=1000,
    )
    # relative cap with N=10, frac 0.2 → df <= 2: 'common' (df=10) and
    # 'rare1' (df=3) are pruned; 'rare2' (df=2) survives
    kept = {r.word for r in sets.select("word").distinct().collect()}
    assert "common" not in kept and "rare1" not in kept and "rare2" in kept
    pairs = {
        (r.id_a, r.id_b): (r.inter_size, r.union_size)
        for r in prefix_filter_pairs(sets, threshold_pct=50).collect()
    }
    # only docs 0/1 share their (pruned) singleton set {rare2} → J=1
    assert pairs == {(0, 1): (1, 1)}

    # absolute cap binds even when the relative cap would admit:
    sets_abs = pruned_token_sets(
        docs, "doc_id", F.split(F.trim(F.col("text")), " "),
        max_df_frac=1.0, max_df_abs=2,
    )
    kept_abs = {r.word for r in sets_abs.select("word").distinct().collect()}
    assert "common" not in kept_abs          # df=10 > 2
    assert "rare1" not in kept_abs           # df=3 > 2
    assert "rare2" in kept_abs               # df=2 <= 2


def test_containment_prefix_candidates_lossless_and_smaller(spark):
    """The containment prefix filter (Xiao et al. WWW'08 §5) must be
    (a) LOSSLESS — every true containment pair survives, including the
    asymmetric short-inside-long case where Jaccard is tiny — and
    (b) a STRICT REDUCTION vs the ungated any-shared-token join."""
    from telecom_competitor_analysis_spark.operators.setsim import (
        containment_prefix_candidates,
        rank_token_sets,
    )

    # doc 0 is a 2-token set fully contained in doc 1's 10-token set
    # (containment 1.0, Jaccard 0.2); docs 2/3 share one rare token
    # (containment 0.5 — below t=0.6); doc 4 is disjoint filler that
    # shares a common token with everyone (candidate noise the prefix
    # should prune).
    rows = [
        (0, ["q", "r"]),
        (1, ["q", "r"] + [f"w{i}" for i in range(8)]),
        (2, ["s", "x0", "x1", "x2"]),
        (3, ["s", "y0", "y1", "y2"]),
        (4, ["w0", "z0", "z1", "z2", "z3", "z4"]),
    ]
    docs = spark.createDataFrame(rows, "id long, toks array<string>")
    tok = docs.select(
        "id", F.explode(F.array_distinct("toks")).alias("word")
    )
    dfc = tok.groupBy("word").agg(F.count("*").alias("df"))
    sets = tok.join(dfc, "word").select("id", "word", "df")

    cand = {
        (r.id_a, r.id_b)
        for r in containment_prefix_candidates(rank_token_sets(sets), 60).collect()
    }
    # lossless: the true pair (0,1) is a candidate
    assert (0, 1) in cand
    # strict reduction: the ungated join pairs everything sharing any
    # token — (1,4) via w0, (2,3) via s, (0,1) via q/r
    ungated = {
        (r.id_a, r.id_b)
        for r in (
            tok.alias("a")
            .join(tok.alias("b"), "word")
            .where(F.col("a.id") < F.col("b.id"))
            .select(
                F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")
            )
            .distinct()
        ).collect()
    }
    assert cand.issubset(ungated)
    assert len(cand) < len(ungated)
    # (1,4): 'w0' ranks LAST in doc 4's rare-first order (df=2 vs the
    # df=1 z-tokens) and outside doc 4's prefix (len 6-4+1=3), and doc 4
    # is the smaller side — so the noise pair is pruned
    assert (1, 4) not in cand


def test_containment_prefix_lossless_on_corpus(spark, sf_dir):
    """Corpus-scale losslessness: over the sf0.001 documents' df-capped
    distinct 3-shingle universe, the prefix-filtered candidate set must
    contain EVERY pair whose exact containment >= 0.6 (recomputed here
    by brute force), and be smaller than the ungated candidate set."""
    from telecom_competitor_analysis_spark.operators.dedup import (
        shingle_rows,
    )
    from telecom_competitor_analysis_spark.operators.setsim import (
        containment_prefix_candidates,
        rank_token_sets,
    )
    from telecom_competitor_analysis_spark.sources.readers import load_table
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = (
        shingle_rows(docs, "doc_id", "text", 3)
        .select(F.col("doc_id").alias("id"), "word")
        .distinct()
    )
    toks = toks.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("word"))
    ).filter(F.col("df") <= 1000)

    ungated = (
        toks.alias("a")
        .join(toks.alias("b"), "word")
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    sizes = toks.groupBy("id").agg(F.count("*").alias("n"))
    true_pairs = {
        (r.id_a, r.id_b)
        for r in (
            toks.alias("a")
            .join(toks.alias("b"), "word")
            .where(F.col("a.id") < F.col("b.id"))
            .groupBy(
                F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")
            )
            .agg(F.count("*").alias("o"))
            .join(sizes.withColumnRenamed("id", "id_a"), "id_a")
            .withColumnRenamed("n", "n_a")
            .join(sizes.withColumnRenamed("id", "id_b"), "id_b")
            .withColumnRenamed("n", "n_b")
            .where(F.col("o") * 100 >= 60 * F.least("n_a", "n_b"))
        ).collect()
    }
    cand = {
        (r.id_a, r.id_b)
        for r in containment_prefix_candidates(rank_token_sets(toks), 60).collect()
    }
    assert true_pairs <= cand  # zero false negatives
    n_ungated = ungated.count()
    assert len(cand) < n_ungated  # the filter actually filters
    print(f"candidates {len(cand)} vs ungated {n_ungated}")


def test_interval_overlap_rejects_nonpositive_bin_width(spark):
    # bin_width=0 would NULL every bin under non-ANSI division and the
    # join would silently return empty — the API rejects it instead
    import pytest

    a = _intervals(spark, [(1, 0, 5)], "a_key")
    b = _intervals(spark, [(2, 3, 9)], "b_key")
    with pytest.raises(ValueError, match="bin_width must be >= 1"):
        interval_overlap_join(a, b, bin_width=0)
    with pytest.raises(ValueError, match="bin_width must be >= 1"):
        interval_overlap_join(a, b, bin_width=-7)


def test_pruned_token_sets_rejects_non_reciprocal_frac(spark):
    # 0.15 -> round(1/0.15)=7 would silently enforce df/n <= 1/7, not
    # the requested 0.15 — rejected at the API boundary
    import pytest

    docs = spark.createDataFrame(
        [(1, ["a", "b"]), (2, ["b", "c"])], "id long, toks array<string>"
    )
    with pytest.raises(ValueError, match="reciprocal of a positive integer"):
        pruned_token_sets(docs, "id", F.col("toks"), max_df_frac=0.15)
    # zero/negative never reach the 1/x division (r8 review)
    with pytest.raises(ValueError, match="reciprocal of a positive integer"):
        pruned_token_sets(docs, "id", F.col("toks"), max_df_frac=0.0)
    with pytest.raises(ValueError, match="reciprocal of a positive integer"):
        pruned_token_sets(docs, "id", F.col("toks"), max_df_frac=-0.5)
    # exact reciprocals still pass (1/4)
    assert (
        pruned_token_sets(docs, "id", F.col("toks"), max_df_frac=0.25).columns
        == ["id", "word", "df"]
    )
