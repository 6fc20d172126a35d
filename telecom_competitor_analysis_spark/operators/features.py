"""Corpus-level feature extraction for the training-data pipeline surface:
TF-IDF term weighting and embedding-centroid outlier scoring.

These extend the reference's per-row cleaning functions
(dags/transform.py:8-29 — all scalar, row-at-a-time) with the two
corpus-statistics shapes a pretraining pipeline actually needs: term
weighting against global document frequency, and distributional outlier
detection against per-class embedding centroids. Both are pure DataFrame
plans — the corpus statistics are partial-aggregated map-side, and the
per-row scoring stage joins against a tiny broadcastable stats table.

Scale notes (100 TB):
- ``tfidf_topk``: tokens shuffle once on (doc, word) for TF and once on
  word for DF. DF output is |vocab| rows — small relative to the corpus
  but unbounded, so the TF⋈DF join is left to AQE (broadcast when the
  vocab fits, shuffle-hash otherwise). The global doc count joins as a
  one-row broadcast. Top-k per doc is a bounded WindowGroupLimit — no
  full sort.
- ``embedding_centroid_outliers``: centroids are one partial-agg pass
  (64 avg columns → |labels| rows), then a broadcast join back; the
  scoring stage is map-only. No stage materializes pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from telecom_competitor_analysis_spark.functions.text import words
from telecom_competitor_analysis_spark.operators.similarity import cosine


def tfidf_topk(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Top-``k`` terms per document by TF-IDF (tf × ln(N/df)).

    Exact integer tf/df; the only doubles are one division and one ln,
    rounded to 6 decimals for the exposed weight. Ranking orders by the
    UNROUNDED weight (identical (tf, df) pairs produce identical weights
    in either engine, so ties resolve on the word itself).
    """
    tok = (
        docs.where(F.col(text_col).isNotNull())
        .select(
            F.col(id_col), F.explode(words(F.col(text_col))).alias("word")
        )
        .where(F.col("word") != "")
    )
    tf = tok.groupBy(id_col, "word").agg(F.count(F.lit(1)).alias("tf"))
    # tf is already distinct per (doc, word): counting its rows per word
    # IS the document frequency — no second distinct pass over tokens.
    df = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    n_docs = (
        docs.where(F.col(text_col).isNotNull())
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    weight = F.col("tf") * F.log(
        F.col("n_docs").cast("double") / F.col("df").cast("double")
    )
    w = Window.partitionBy(id_col).orderBy(
        weight.desc(), F.col("word").asc()
    )
    return (
        tf.join(df, "word")
        .join(F.broadcast(n_docs))
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select(
            id_col,
            "word",
            "tf",
            "df",
            F.round(weight, 6).alias("tfidf_r"),
            "rank",
        )
    )


def random_projection(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    in_dim: int = 64,
    out_dim: int = 16,
    seed: int = 0,
) -> DataFrame:
    """Johnson–Lindenstrauss random projection to ``out_dim`` dimensions
    with a deterministic ±1 matrix (sign of the high bit of
    md5('rp|{seed}|{j}|{i}')) scaled by 1/√out_dim — the standard cheap
    dimensionality reduction in front of ANN indexing / clustering.

    No fitted model to store or broadcast: the matrix is a pure function
    of (seed, j, i), computed driver-side and shipped as ``out_dim``
    literal weight arrays (same trick as
    similarity.hyperplane_sign_bucket — per-dimension Column objects
    would cost thousands of py4j round-trips). Map-only: zero shuffles
    at any scale. Output columns d0..d{out_dim-1}, rounded to 6 so the
    values are engine-portable (sequential fold == DuckDB
    list_dot_product order)."""
    import hashlib
    import math

    v = F.col(vec_col)
    scale = 1.0 / math.sqrt(out_dim)
    out_cols = []
    for j in range(out_dim):
        w = [
            1.0
            if hashlib.md5(f"rp|{seed}|{j}|{i}".encode()).hexdigest()[0]
            in "89abcdef"
            else -1.0
            for i in range(in_dim)
        ]
        proj = F.aggregate(
            F.zip_with(v, F.lit(w), lambda x, wgt: x.cast("double") * wgt),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        out_cols.append(F.round(proj * F.lit(scale), 6).alias(f"d{j}"))
    return emb.select(F.col(id_col), *out_cols)


def embedding_centroid_outliers(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    dim: int = 64,
) -> DataFrame:
    """Cosine of every vector to its label centroid, plus the per-label
    outlier rank (rank 1 = farthest from the centroid).

    The standard embedding-space cleaning pass: vectors far from their
    class centroid are mislabeled/noise candidates. Centroid = per-label
    elementwise mean, computed as ``dim`` avg() agg columns in ONE
    partial-aggregated shuffle (no posexplode — the shuffle carries
    |labels| × dim doubles, not rows × dim).
    """
    e = emb.select(
        id_col, label_col, F.col(vec_col).cast("array<double>").alias("v")
    )
    cent = e.groupBy(label_col).agg(
        *[F.avg(F.col("v")[i]).alias(f"c{i}") for i in range(dim)]
    )
    cent = cent.select(
        label_col, F.array(*[F.col(f"c{i}") for i in range(dim)]).alias("cvec")
    )
    # materialize the cosine ONCE before the window — ordering by the
    # column (not the expression) keeps the O(dim) fold from being
    # evaluated twice per row (sort key + output). Rank over the ROUNDED
    # cosine (the emitted value) with an id tie-break: the raw avg()-derived
    # cosine depends on float accumulation order, so near-ties could flip
    # ranks across partition layouts; rounding first makes the rank a pure
    # function of the emitted columns.
    scored = e.join(F.broadcast(cent), label_col).select(
        id_col,
        label_col,
        F.round(cosine(F.col("v"), F.col("cvec")), 6).alias("_cos"),
    )
    w = Window.partitionBy(label_col).orderBy(
        F.col("_cos").asc(), F.col(id_col).asc()
    )
    return scored.select(
        id_col,
        label_col,
        F.col("_cos").alias("cos_centroid"),
        F.row_number().over(w).cast("int").alias("outlier_rank"),
    )
