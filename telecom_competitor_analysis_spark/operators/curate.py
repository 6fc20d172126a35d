"""Corpus curation — the composite training-data pipeline operator
(BASELINE.json north star): language filter → quality gate → exact dedup →
near-dup removal, plus deterministic hash-split assignment.

Every stage is a declarative plan over the stages before it, so Catalyst
fuses the narrow filters into one scan pass and the only shuffles are the
two dedup keys (content digest; shingle inverted index). Every decision is
deterministic (digest keepers = min id; near-dup drops = the higher id of
each surviving pair), so curation is reproducible run-over-run — the
property that makes 100 TB incremental re-curation (anti-join against the
previous keep-list) possible at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from telecom_competitor_analysis_spark.functions.text import (
    lang_id_heuristic,
    n_words,
    stopword_count,
)
from telecom_competitor_analysis_spark.operators.dedup import (
    shingle_jaccard_pairs,
)


def curate_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_lang: str = "en",
    min_words: int = 5,
    max_words: int = 10_000,
    min_stopword_ratio: float = 0.0,
    near_dup_threshold: float = 0.5,
) -> DataFrame:
    """Surviving documents after the four curation stages. Returns
    (id, pred_lang, n_words) for every keeper.

    Near-dup policy: among candidate pairs with shingle-Jaccard ≥
    threshold, the lower id survives — applied as one anti-join against
    the set of higher-ids (a doc similar to several keepers is dropped
    once; chains collapse toward the lowest id, the standard greedy
    approximation of clustering-based dedup).
    """
    t = F.col(text_col)
    scored = df.select(
        F.col(id_col),
        t.alias("__text"),
        lang_id_heuristic(t).alias("pred_lang"),
        n_words(t).alias("n_words"),
        (stopword_count(t).cast("double") / n_words(t)).alias("stop_ratio"),
    )
    kept = scored.filter(
        (F.col("pred_lang") == keep_lang)
        & (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words)
        & (F.col("stop_ratio") >= min_stopword_ratio)
    )

    # exact dedup: keeper = min id per content digest
    keepers = (
        kept.withColumn("__digest", F.md5(F.trim(F.col("__text"))))
        .withColumn(
            "__keeper",
            F.min(F.col(id_col)).over(Window.partitionBy("__digest")),
        )
        .filter(F.col(id_col) == F.col("__keeper"))
        .drop("__digest", "__keeper")
    )

    # near-dup removal among survivors: drop the higher id of each pair
    pairs = shingle_jaccard_pairs(
        keepers.select(F.col(id_col), F.col("__text").alias(text_col)),
        id_col,
        text_col,
        w=3,
        threshold=near_dup_threshold,
    )
    drops = pairs.select(F.col("id_b").alias(id_col)).distinct()
    survivors = keepers.join(drops, on=id_col, how="left_anti")
    return survivors.select(id_col, "pred_lang", "n_words")


def hash_split(
    id_col: Column, salt: str = "split", train_hex_bound: str = "cd"
) -> Column:
    """Deterministic train/test assignment: first md5 byte of
    (id || '|' || salt) under the bound → 'train' (default 'cd'/0x100 ≈
    80%). Portable (same md5 everywhere), stable under reshuffling and
    re-runs, and independent per salt — multiple named splits coexist
    without coordination."""
    h = F.substring(F.md5(F.concat(id_col.cast("string"), F.lit(f"|{salt}"))), 1, 2)
    return F.when(h < F.lit(train_hex_bound), F.lit("train")).otherwise(
        F.lit("test")
    )
