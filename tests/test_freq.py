"""Heavy-hitter operator behavior (operators/freq.py): the declared
query's oracle proves losslessness on the corpus; these tests pin the
Misra-Gries mechanics on PLANTED skew where the summary bound actually
binds (vocab >> k), which the near-uniform synthetic corpus cannot
exercise."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from telecom_competitor_analysis_spark.operators.freq import (
    heavy_hitters,
    misra_gries_candidates,
)


def _zipf_tokens(spark, n_vocab=2000, parts=4):
    # token i gets ceil(4000 / (i + 1)) occurrences: a heavy head over a
    # long uniform-ish tail; total ~= 4000 * H(2000) ~= 32k tokens
    rows = spark.range(n_vocab).select(
        F.concat(F.lit("tok"), F.col("id")).alias("token"),
        (F.lit(4000) / (F.col("id") + 1)).cast("long").alias("w"),
    )
    return (
        rows.select(
            F.explode(F.expr("array_repeat(token, cast(w + 1 as int))")).alias(
                "token"
            )
        )
        .repartition(parts)  # spread the head across partitions
    )


def test_heavy_hitters_exact_on_planted_skew(spark):
    toks = _zipf_tokens(spark).cache()
    try:
        got = heavy_hitters(toks, "token", inv_frac=100, k=100).toPandas()
        exact = toks.groupBy("token").count().toPandas()
        n = int(exact["count"].sum())
        want = exact[exact["count"] * 100 > n]
        assert sorted(got["token"]) == sorted(want["token"])
        merged = got.merge(
            want.rename(columns={"count": "cnt_true"}), on="token"
        )
        assert (merged["cnt"] == merged["cnt_true"]).all()
        assert 0 < len(got) < 100  # the threshold genuinely selects
    finally:
        toks.unpersist()


def test_mg_candidates_bounded_and_superset(spark):
    toks = _zipf_tokens(spark, parts=4).cache()
    try:
        k = 100
        cand = misra_gries_candidates(toks, "token", k).toPandas()
        # bounded state: each of the 4 partitions yields < k survivors
        assert len(cand) < 4 * k
        # and the summary genuinely decremented: far fewer survivors
        # than the 2000-token vocabulary
        assert cand["token"].nunique() < 800
        exact = toks.groupBy("token").count().toPandas()
        n = int(exact["count"].sum())
        heavies = set(exact[exact["count"] * k > n]["token"])
        assert heavies <= set(cand["token"])  # the MG guarantee
    finally:
        toks.unpersist()


def test_single_partition_mg_survives_boundary_token(spark):
    # one partition, k=10, a token holding just over n/k of the stream:
    # the guarantee is strict-inequality — it must survive the summary
    head = ["hot"] * 120  # 120 of 1100 total > 1100/10
    tail = [f"t{i}" for i in range(98)] * 10  # 980 tail tokens
    pdf = pd.DataFrame({"token": head + tail})
    toks = spark.createDataFrame(pdf).coalesce(1)
    cand = misra_gries_candidates(toks, "token", 10).toPandas()
    assert "hot" in set(cand["token"])
    assert len(cand) < 10


def test_heavy_hitters_guards_invalid_k(spark):
    toks = _zipf_tokens(spark, n_vocab=50)
    with pytest.raises(ValueError, match="voids the MG superset"):
        heavy_hitters(toks, "token", inv_frac=100, k=50)
    with pytest.raises(ValueError, match="k must be >= 2"):
        misra_gries_candidates(toks, "token", 1)


def test_heavy_hitters_excludes_nulls_consistently(spark):
    # NULL occupies well over 1/4 of rows; the contract excludes it
    # from counts AND from N (value_counts drops NaN and equi-joins
    # never match NULL — any other treatment is silently lossy)
    pdf = pd.DataFrame({"token": ["a"] * 40 + [None] * 50 + ["b"] * 10})
    toks = spark.createDataFrame(pdf)
    got = {
        r["token"]: r["cnt"]
        for r in heavy_hitters(toks, "token", inv_frac=4).collect()
    }
    # non-null universe is 50 tokens: a (40) > 50/4, b (10) < 50/4
    assert got == {"a": 40}


def test_mg_candidates_preserve_non_string_token_type(spark):
    # the mapInPandas output schema is derived from the input column's
    # type — a bigint token column comes back bigint, not coerced to
    # string (r7 ADVICE: reject/derive instead of silent coercion)
    toks = spark.range(100).select(
        (F.col("id") % 5).cast("long").alias("token")
    )
    out = misra_gries_candidates(toks, "token", k=10)
    assert dict(out.dtypes)["token"] == "bigint"
    got = {r["token"] for r in out.distinct().collect()}
    assert got == {0, 1, 2, 3, 4}
