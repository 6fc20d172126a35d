"""Count-based bigram language-model scoring — the perplexity-style
quality filter of LLM data pipelines (CCNet trains a 5-gram KenLM and
drops high-perplexity documents; this is the same shape with an exact,
engine-portable add-one-smoothed bigram model so the result is
deterministic and oracle-checkable).

Model: P(w2 | w1) = (C(w1 w2) + 1) / (C(w1 ·) + V), trained on the
corpus being scored (self-scoring, the CCNet setup); V = corpus distinct
token count; C(w1 ·) = bigram-context count (occurrences of w1 excluding
document-final positions).

Scale shape: bigram extraction is a map-only zip of each token array
with its tail (no positional self-join); C(w1 w2), C(w1 ·) and V are
partial-aggregable counts; scoring joins doc bigrams to the count tables
on their own group keys (the shuffles ARE the model application — at
100 TB the count tables are the "trained model", written once and
re-joined per batch). Per-bigram log-probs are rounded to integer
micro-units BEFORE the per-doc sum (integer-cents rule: raw double sums
are ordering-dependent), so both engines emit identical values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from telecom_competitor_analysis_spark.functions.text import words


def bigram_rows(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, w1, w2) — one row per adjacent token pair, multiplicity
    kept. Map-only: zip(arr, arr[2:]) then explode."""
    arr = words(F.trim(F.col(text_col)))
    zipped = F.arrays_zip(
        F.slice(arr, 1, F.greatest(F.size(arr) - 1, F.lit(0))).alias("w1"),
        F.slice(arr, 2, F.greatest(F.size(arr) - 1, F.lit(0))).alias("w2"),
    )
    return docs.select(
        F.col(id_col).alias("id"), F.explode(zipped).alias("bg")
    ).select("id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))


def bigram_lm_scores(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Per-document average bigram log-probability under the add-one-
    smoothed corpus bigram model. Returns
    (id, n_bigrams BIGINT, avg_logp DOUBLE rounded to 6) — higher
    (closer to 0) = more typical text; the quality gate thresholds on
    this exactly like a perplexity filter. Docs with < 2 tokens have no
    bigrams and are absent from the output (nothing to score)."""
    bg = bigram_rows(docs, id_col, text_col)
    # c_bg is vocab²-bounded (small); c_ctx derives from it —
    # C(w1 ·) = Σ_w2 C(w1 w2) — so the corpus-wide bigram explode feeds
    # only TWO consumers (this agg + the scoring join), not three.
    # Not persisted: caching pins the exchange's partition count and
    # blocks AQE coalescing under default confs (NOTES r5); at scale
    # the count tables are the trained model you WRITE once.
    c_bg = bg.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("double").alias("c_bg")
    )
    c_ctx = c_bg.groupBy("w1").agg(
        F.sum("c_bg").alias("c_ctx")
    )
    vocab = F.broadcast(
        docs.select(
            F.explode(words(F.trim(F.col(text_col)))).alias("w")
        )
        .agg(F.count_distinct(F.col("w")).cast("double").alias("v"))
    )
    logp = F.log((F.col("c_bg") + 1.0) / (F.col("c_ctx") + F.col("v")))
    logp_micro = F.round(logp * 1e6, 0).cast("bigint")
    return (
        bg.join(c_bg, on=["w1", "w2"])
        .join(c_ctx, on="w1")
        .crossJoin(vocab)
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(logp_micro).alias("sum_micro"),
        )
        .select(
            "id",
            "n_bigrams",
            F.round(
                F.col("sum_micro")
                / (F.col("n_bigrams").cast("double") * 1e6),
                6,
            ).alias("avg_logp"),
        )
    )
