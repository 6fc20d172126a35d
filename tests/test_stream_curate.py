"""Streaming curation end-to-end: a crawl feed arrives as a stream
(Python DataSource) and every micro-batch is probed against a FROZEN
shingle index via foreachBatch — per-batch work ∝ batch, never corpus,
which is what lets curation keep up with a 100 TB crawl. Checkpointed
Trigger.Once restarts pin exactly-once-per-offset: batch 2 probes only
batch-2 documents."""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow  # full-run default; excluded by the -m 'not slow' fast tier

from pyspark.sql import functions as F

from telecom_competitor_analysis_spark.operators.dedup import (
    build_shingle_index,
    near_dups_against_index,
)
from telecom_competitor_analysis_spark.sources.pyds_stream import (
    SyntheticDocumentsDataSource,
)


@pytest.fixture()
def dirs():
    root = tempfile.mkdtemp(prefix="stream_curate_")
    paths = {n: f"{root}/{n}" for n in ("index", "out", "ckpt")}
    for p in paths.values():
        Path(p).mkdir()
    yield paths
    shutil.rmtree(root, ignore_errors=True)


def test_streaming_dedup_against_frozen_index(spark, dirs):
    # nightly side: freeze the keep-list index once (one boilerplate doc
    # the stream will keep near-duplicating, one unrelated doc)
    keep = spark.createDataFrame(
        [
            (1000, SyntheticDocumentsDataSource.KEEP_TEXT),
            (1001, " ".join(f"other{j}" for j in range(12))),
        ],
        "doc_id long, text string",
    )
    build_shingle_index(keep, "doc_id", "text", dirs["index"], w=3)

    spark.dataSource.register(SyntheticDocumentsDataSource)

    def probe_batch(batch_df, batch_id: int) -> None:
        flagged = near_dups_against_index(
            batch_df, spark, dirs["index"], "doc_id", "text",
            w=3, threshold=0.2,
        ).withColumn("batch_id", F.lit(batch_id))
        flagged.write.mode("append").parquet(dirs["out"])

    def run_once():
        q = (
            spark.readStream.format("synthetic_documents")
            .option("docsPerBatch", "6")
            .load()
            .writeStream.foreachBatch(probe_batch)
            .option("checkpointLocation", dirs["ckpt"])
            .trigger(once=True)
            .start()
        )
        q.awaitTermination(180)

    run_once()  # docs 0-5
    run_once()  # restart: docs 6-11 only (offset resumed from ckpt)

    rows = spark.read.parquet(dirs["out"]).collect()
    flagged = {(r.id_a, r.id_b) for r in rows}
    # every third doc is a planted near-dup of the boilerplate keep doc;
    # novel-vocabulary docs never pair, and nothing pairs with 1001
    assert flagged == {(i, 1000) for i in (0, 3, 6, 9)}
    for r in rows:
        assert r.jaccard >= 0.2
        # exactly-once across the restart: batch 1 processed docs 0-5,
        # batch 2 docs 6-11 — never re-probed, never skipped
        assert (r.id_a < 6) == (r.batch_id == 0)


def test_streaming_admission_screen_plus_dedup(spark, dirs):
    """The full ingestion-curation composite per micro-batch: Gopher
    screen (stateless, thresholds tuned to the 12-word synthetic docs)
    + near-dup probe against the frozen index → admitted/rejected with
    a reason column. Per-batch work ∝ batch; exactly-once across a
    checkpointed restart."""
    keep = spark.createDataFrame(
        [(1000, SyntheticDocumentsDataSource.KEEP_TEXT)],
        "doc_id long, text string",
    )
    build_shingle_index(keep, "doc_id", "text", dirs["index"], w=3)
    spark.dataSource.register(SyntheticDocumentsDataSource)

    from telecom_competitor_analysis_spark.operators.quality import (
        gopher_rules,
    )

    def curate_batch(batch_df, batch_id: int) -> None:
        screened = gopher_rules(
            batch_df, "doc_id", "text",
            min_words=5, min_mean_word_len=1.0, max_mean_word_len=20.0,
            min_stopwords=0, max_top_word_fraction=0.9,
            min_distinct_fraction=0.2, max_dup_bigram_fraction=0.9,
        ).select("doc_id", "passes")
        dups = (
            near_dups_against_index(
                batch_df, spark, dirs["index"], "doc_id", "text",
                w=3, threshold=0.2,
            )
            .select(F.col("id_a").alias("doc_id"))
            .distinct()
            .withColumn("__dup", F.lit(True))
        )
        out = (
            batch_df.join(screened, on="doc_id")
            .join(dups, on="doc_id", how="left")
            .select(
                "doc_id",
                F.lit(batch_id).alias("batch_id"),
                (F.col("passes") & F.col("__dup").isNull()).alias(
                    "admitted"
                ),
                F.when(F.col("__dup").isNotNull(), "dup")
                .when(~F.col("passes"), "screen")
                .alias("reason"),
            )
        )
        out.write.mode("append").parquet(dirs["out"])

    def run_once():
        q = (
            spark.readStream.format("synthetic_documents")
            .option("docsPerBatch", "6")
            .load()
            .writeStream.foreachBatch(curate_batch)
            .option("checkpointLocation", dirs["ckpt"])
            .trigger(once=True)
            .start()
        )
        q.awaitTermination(180)

    run_once()
    run_once()

    rows = {r.doc_id: r for r in spark.read.parquet(dirs["out"]).collect()}
    assert set(rows) == set(range(12))  # exactly-once, no gaps/dupes
    for i in range(12):
        r = rows[i]
        assert r.batch_id == (0 if i < 6 else 1)
        if i % 3 == 0:  # planted near-dups of the frozen boilerplate
            assert not r.admitted and r.reason == "dup"
        else:
            assert r.admitted and r.reason is None


def test_streaming_admission_with_model_screen(spark, dirs):
    """The admission composite grown to three screens per micro-batch:
    near-dup probe (frozen index) > Gopher rules > model-based quality
    score (hashed_linear_score — map-only, so it adds ZERO shuffles to
    the per-batch plan), with reason precedence dup > screen > model.
    The model verdicts must equal an independent batch-side scoring of
    the same docs (the scorer itself is oracle-checked elsewhere);
    exactly-once across the checkpointed restart."""
    from telecom_competitor_analysis_spark.operators.quality import (
        gopher_rules,
        hashed_linear_score,
    )

    keep = spark.createDataFrame(
        [(1000, SyntheticDocumentsDataSource.KEEP_TEXT)],
        "doc_id long, text string",
    )
    build_shingle_index(keep, "doc_id", "text", dirs["index"], w=3)
    spark.dataSource.register(SyntheticDocumentsDataSource)

    def curate_batch(batch_df, batch_id: int) -> None:
        screened = gopher_rules(
            batch_df, "doc_id", "text",
            min_words=5, min_mean_word_len=1.0, max_mean_word_len=20.0,
            min_stopwords=0, max_top_word_fraction=0.9,
            min_distinct_fraction=0.2, max_dup_bigram_fraction=0.9,
        ).select("doc_id", "passes")
        model = hashed_linear_score(batch_df, "doc_id", "text").select(
            "doc_id", F.col("keep").alias("model_keep")
        )
        dups = (
            near_dups_against_index(
                batch_df, spark, dirs["index"], "doc_id", "text",
                w=3, threshold=0.2,
            )
            .select(F.col("id_a").alias("doc_id"))
            .distinct()
            .withColumn("__dup", F.lit(True))
        )
        out = (
            batch_df.join(screened, on="doc_id")
            .join(model, on="doc_id")
            .join(dups, on="doc_id", how="left")
            .select(
                "doc_id",
                F.lit(batch_id).alias("batch_id"),
                (
                    F.col("passes")
                    & F.col("model_keep")
                    & F.col("__dup").isNull()
                ).alias("admitted"),
                F.when(F.col("__dup").isNotNull(), "dup")
                .when(~F.col("passes"), "screen")
                .when(~F.col("model_keep"), "model")
                .alias("reason"),
            )
        )
        out.write.mode("append").parquet(dirs["out"])

    def run_once():
        q = (
            spark.readStream.format("synthetic_documents")
            .option("docsPerBatch", "6")
            .load()
            .writeStream.foreachBatch(curate_batch)
            .option("checkpointLocation", dirs["ckpt"])
            .trigger(once=True)
            .start()
        )
        q.awaitTermination(180)

    run_once()
    run_once()

    rows = {r.doc_id: r for r in spark.read.parquet(dirs["out"]).collect()}
    assert set(rows) == set(range(12))  # exactly-once, no gaps/dupes

    # independent batch-side expectation for the model screen
    stream_docs = spark.createDataFrame(
        [
            (i, SyntheticDocumentsDataSource.text_for(i))
            for i in range(12)
        ],
        "doc_id long, text string",
    )
    expected_keep = {
        r.doc_id: r.keep
        for r in hashed_linear_score(
            stream_docs, "doc_id", "text"
        ).collect()
    }
    for i in range(12):
        r = rows[i]
        assert r.batch_id == (0 if i < 6 else 1)
        if i % 3 == 0:  # planted near-dups always lose to the dup screen
            assert not r.admitted and r.reason == "dup"
        elif not expected_keep[i]:
            assert not r.admitted and r.reason == "model"
        else:
            assert r.admitted and r.reason is None


def test_streaming_admission_with_boilerplate_screen(spark, dirs):
    """Fourth admission signal: BATCH-LEVEL boilerplate detection via
    the exact heavy-hitter operator (operators/freq.py) — bigrams
    holding > 1/40 of the micro-batch's bigram mass are batch
    boilerplate, and a doc whose bigrams are majority-heavy is flagged
    (the CCNet-style 'shared template' screen, computed per batch with
    bounded state, no corpus-wide counts). In this feed the planted
    near-dups all share KEEP_TEXT, so exactly the i%3==0 docs must
    flag; novel-vocab docs never do. The flag is emitted alongside the
    dup/screen/model verdicts (reason precedence unchanged) and must
    survive the checkpointed restart exactly-once."""
    from telecom_competitor_analysis_spark.operators.freq import (
        heavy_hitters,
    )
    from telecom_competitor_analysis_spark.operators.quality import (
        gopher_rules,
    )

    keep = spark.createDataFrame(
        [(1000, SyntheticDocumentsDataSource.KEEP_TEXT)],
        "doc_id long, text string",
    )
    build_shingle_index(keep, "doc_id", "text", dirs["index"], w=3)
    spark.dataSource.register(SyntheticDocumentsDataSource)

    def curate_batch(batch_df, batch_id: int) -> None:
        bigrams = batch_df.select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(split(trim(text), ' ')) - 2),"
                    " i -> concat(split(trim(text), ' ')[i], ' ',"
                    " split(trim(text), ' ')[i + 1]))"
                )
            ).alias("token"),
        )
        heavy = heavy_hitters(
            bigrams.select("token"), "token", inv_frac=40
        ).select("token")
        n_bg = bigrams.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("__n")
        )
        n_heavy = (
            bigrams.join(F.broadcast(heavy), on="token")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("__nh"))
        )
        boiler = (
            n_bg.join(n_heavy, on="doc_id", how="left")
            .select(
                "doc_id",
                (
                    F.coalesce(F.col("__nh"), F.lit(0)) * 2 > F.col("__n")
                ).alias("boilerplate"),
            )
        )
        screened = gopher_rules(
            batch_df, "doc_id", "text",
            min_words=5, min_mean_word_len=1.0, max_mean_word_len=20.0,
            min_stopwords=0, max_top_word_fraction=0.9,
            min_distinct_fraction=0.2, max_dup_bigram_fraction=0.9,
        ).select("doc_id", "passes")
        dups = (
            near_dups_against_index(
                batch_df, spark, dirs["index"], "doc_id", "text",
                w=3, threshold=0.2,
            )
            .select(F.col("id_a").alias("doc_id"))
            .distinct()
            .withColumn("__dup", F.lit(True))
        )
        out = (
            batch_df.join(screened, on="doc_id")
            .join(boiler, on="doc_id")
            .join(dups, on="doc_id", how="left")
            .select(
                "doc_id",
                F.lit(batch_id).alias("batch_id"),
                "boilerplate",
                (
                    F.col("passes")
                    & ~F.col("boilerplate")
                    & F.col("__dup").isNull()
                ).alias("admitted"),
                F.when(F.col("__dup").isNotNull(), "dup")
                .when(F.col("boilerplate"), "boilerplate")
                .when(~F.col("passes"), "screen")
                .alias("reason"),
            )
        )
        out.write.mode("append").parquet(dirs["out"])

    def run_once():
        q = (
            spark.readStream.format("synthetic_documents")
            .option("docsPerBatch", "6")
            .load()
            .writeStream.foreachBatch(curate_batch)
            .option("checkpointLocation", dirs["ckpt"])
            .trigger(once=True)
            .start()
        )
        q.awaitTermination(180)

    run_once()
    run_once()

    rows = {r.doc_id: r for r in spark.read.parquet(dirs["out"]).collect()}
    assert set(rows) == set(range(12))  # exactly-once across restart
    for i in range(12):
        r = rows[i]
        assert r.batch_id == (0 if i < 6 else 1)
        # exactly the planted template docs are batch-boilerplate
        assert r.boilerplate == (i % 3 == 0), i
        if i % 3 == 0:
            assert not r.admitted and r.reason == "dup"  # dup outranks
        else:
            assert r.admitted and r.reason is None


def test_streaming_admission_with_ann_screen(spark, dirs):
    """Fifth admission signal (r7 VERDICT item 6): EMBEDDING near-dup
    probe of each micro-batch against a FROZEN IVF index — the screen
    that catches what shingle dedup structurally cannot. The feed's
    planted duplicates arrive word-SCRAMBLED (``scrambleDups``): their
    bag of words — hence their hashed-BoW embedding — is unchanged, but
    their 3-gram shingles are destroyed, so the shingle probe misses
    every one of them (asserted) while the IVF probe (top-1 neighbor +
    cosine >= 0.8, measured planted cos >= 0.977 vs novel <= 0.49)
    flags exactly the planted set. Per-batch cost ∝ batch (the index
    read is bucket-pruned via ann_against_index's read path, the same
    one append_to_ivf_index serves); full five-screen precedence
    dup > ann_dup > boilerplate > screen > model; exactly-once across
    the checkpointed restart."""
    from telecom_competitor_analysis_spark.operators.freq import (
        heavy_hitters,
    )
    from telecom_competitor_analysis_spark.operators.quality import (
        gopher_rules,
        hashed_linear_score,
    )
    from telecom_competitor_analysis_spark.operators.similarity import (
        ann_against_index,
        build_ivf_index,
        cosine,
        hashed_bow_embedding,
    )

    keep = spark.createDataFrame(
        [
            (1000, SyntheticDocumentsDataSource.KEEP_TEXT),
            (1001, " ".join(f"other{j}" for j in range(12))),
        ],
        "doc_id long, text string",
    )
    build_shingle_index(keep, "doc_id", "text", dirs["index"], w=3)
    ivf_path = f"{dirs['index']}_ivf"
    build_ivf_index(
        hashed_bow_embedding(keep),
        ivf_path,
        id_col="doc_id",
        vec_col="embedding",
        n_anchors=2,
    )
    spark.dataSource.register(SyntheticDocumentsDataSource)

    def curate_batch(batch_df, batch_id: int) -> None:
        emb = hashed_bow_embedding(batch_df)
        nbrs = ann_against_index(
            emb, spark, ivf_path,
            id_col="doc_id", vec_col="embedding", k=1, nprobe=2,
        )
        idx_vecs = spark.read.parquet(f"{ivf_path}/assignments").select(
            "neighbor_id", "c_vec"
        )
        ann = (
            nbrs.join(idx_vecs, on="neighbor_id")
            .join(
                emb.withColumnRenamed("doc_id", "query_id"), on="query_id"
            )
            .where(cosine(F.col("embedding"), F.col("c_vec")) >= 0.8)
            .select(F.col("query_id").alias("doc_id"))
            .distinct()
            .withColumn("__ann", F.lit(True))
        )
        bigrams = batch_df.select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(split(trim(text), ' ')) - 2),"
                    " i -> concat(split(trim(text), ' ')[i], ' ',"
                    " split(trim(text), ' ')[i + 1]))"
                )
            ).alias("token"),
        )
        heavy = heavy_hitters(
            bigrams.select("token"), "token", inv_frac=40
        ).select("token")
        n_bg = bigrams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("__n"))
        n_heavy = (
            bigrams.join(F.broadcast(heavy), on="token")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("__nh"))
        )
        boiler = n_bg.join(n_heavy, on="doc_id", how="left").select(
            "doc_id",
            (F.coalesce(F.col("__nh"), F.lit(0)) * 2 > F.col("__n")).alias(
                "boilerplate"
            ),
        )
        screened = gopher_rules(
            batch_df, "doc_id", "text",
            min_words=5, min_mean_word_len=1.0, max_mean_word_len=20.0,
            min_stopwords=0, max_top_word_fraction=0.9,
            min_distinct_fraction=0.2, max_dup_bigram_fraction=0.9,
        ).select("doc_id", "passes")
        model = hashed_linear_score(batch_df, "doc_id", "text").select(
            "doc_id", F.col("keep").alias("model_keep")
        )
        dups = (
            near_dups_against_index(
                batch_df, spark, dirs["index"], "doc_id", "text",
                w=3, threshold=0.2,
            )
            .select(F.col("id_a").alias("doc_id"))
            .distinct()
            .withColumn("__dup", F.lit(True))
        )
        out = (
            batch_df.join(screened, on="doc_id")
            .join(boiler, on="doc_id")
            .join(model, on="doc_id")
            .join(ann, on="doc_id", how="left")
            .join(dups, on="doc_id", how="left")
            .select(
                "doc_id",
                F.lit(batch_id).alias("batch_id"),
                F.col("__ann").isNotNull().alias("ann_dup"),
                "boilerplate",
                (
                    F.col("passes")
                    & F.col("model_keep")
                    & ~F.col("boilerplate")
                    & F.col("__ann").isNull()
                    & F.col("__dup").isNull()
                ).alias("admitted"),
                F.when(F.col("__dup").isNotNull(), "dup")
                .when(F.col("__ann").isNotNull(), "ann_dup")
                .when(F.col("boilerplate"), "boilerplate")
                .when(~F.col("passes"), "screen")
                .when(~F.col("model_keep"), "model")
                .alias("reason"),
            )
        )
        out.write.mode("append").parquet(dirs["out"])

    def run_once():
        q = (
            spark.readStream.format("synthetic_documents")
            .option("docsPerBatch", "6")
            .option("scrambleDups", "true")
            .load()
            .writeStream.foreachBatch(curate_batch)
            .option("checkpointLocation", dirs["ckpt"])
            .trigger(once=True)
            .start()
        )
        q.awaitTermination(180)

    run_once()
    run_once()

    rows = {r.doc_id: r for r in spark.read.parquet(dirs["out"]).collect()}
    assert set(rows) == set(range(12))  # exactly-once across restart

    # batch-side expectation for the model screen on the novel docs
    stream_docs = spark.createDataFrame(
        [
            (i, SyntheticDocumentsDataSource.text_for(i, scramble=True))
            for i in range(12)
        ],
        "doc_id long, text string",
    )
    expected_keep = {
        r.doc_id: r.keep
        for r in hashed_linear_score(stream_docs, "doc_id", "text").collect()
    }
    for i in range(12):
        r = rows[i]
        assert r.batch_id == (0 if i < 6 else 1)
        # the shingle screen MISSED every scrambled dup (reason is never
        # "dup"); only the embedding screen catches them
        assert r.reason != "dup"
        assert r.ann_dup == (i % 3 == 0), i
        if i % 3 == 0:
            assert not r.admitted and r.reason == "ann_dup"
        elif not expected_keep[i]:
            assert not r.admitted and r.reason == "model"
        else:
            assert r.admitted and r.reason is None


def test_streaming_admission_with_line_filter_screen(spark, dirs):
    """SEVENTH admission signal: the C4 LINE filter joins the composite
    (the batch funnel jobs/curate.py runs has it; the streaming path
    must too). Screen order / reason precedence:
    dup > ann_dup > line_filter > boilerplate > screen > model.
    With the scrambled feed the planted dups ALSO fail the line filter
    (the badword 'lazy' cuts one of their 4 chunks and the tail chunk
    is short), but ann_dup outranks it; doc 4 is the novel doc whose
    own chunk carries the second badword — its reason IS line_filter.
    Verdicts are pinned against an independent batch-side recompute of
    c4_line_filter; exactly-once across the checkpointed restart."""
    from telecom_competitor_analysis_spark.operators.quality import (
        c4_line_filter,
        gopher_rules,
        hashed_linear_score,
    )
    from telecom_competitor_analysis_spark.operators.similarity import (
        ann_against_index,
        build_ivf_index,
        cosine,
        hashed_bow_embedding,
    )

    keep = spark.createDataFrame(
        [(1000, SyntheticDocumentsDataSource.KEEP_TEXT)],
        "doc_id long, text string",
    )
    build_shingle_index(keep, "doc_id", "text", dirs["index"], w=3)
    ivf_path = f"{dirs['index']}_ivf"
    build_ivf_index(
        hashed_bow_embedding(keep),
        ivf_path,
        id_col="doc_id",
        vec_col="embedding",
        n_anchors=1,
    )
    spark.dataSource.register(SyntheticDocumentsDataSource)
    LF_KW = dict(w=4, min_line_words=4, badwords=("lazy", "w4x7"),
                 min_kept_lines=3)

    def curate_batch(batch_df, batch_id: int) -> None:
        emb = hashed_bow_embedding(batch_df)
        nbrs = ann_against_index(
            emb, spark, ivf_path,
            id_col="doc_id", vec_col="embedding", k=1, nprobe=1,
        )
        idx_vecs = spark.read.parquet(f"{ivf_path}/assignments").select(
            "neighbor_id", "c_vec"
        )
        ann = (
            nbrs.join(idx_vecs, on="neighbor_id")
            .join(
                emb.withColumnRenamed("doc_id", "query_id"), on="query_id"
            )
            .where(cosine(F.col("embedding"), F.col("c_vec")) >= 0.8)
            .select(F.col("query_id").alias("doc_id"))
            .distinct()
            .withColumn("__ann", F.lit(True))
        )
        lf = (
            c4_line_filter(batch_df, "doc_id", "text", **LF_KW)
            .select("doc_id")
            .withColumn("__lf_ok", F.lit(True))
        )
        screened = gopher_rules(
            batch_df, "doc_id", "text",
            min_words=5, min_mean_word_len=1.0, max_mean_word_len=20.0,
            min_stopwords=0, max_top_word_fraction=0.9,
            min_distinct_fraction=0.2, max_dup_bigram_fraction=0.9,
        ).select("doc_id", "passes")
        model = hashed_linear_score(batch_df, "doc_id", "text").select(
            "doc_id", F.col("keep").alias("model_keep")
        )
        dups = (
            near_dups_against_index(
                batch_df, spark, dirs["index"], "doc_id", "text",
                w=3, threshold=0.2,
            )
            .select(F.col("id_a").alias("doc_id"))
            .distinct()
            .withColumn("__dup", F.lit(True))
        )
        out = (
            batch_df.join(screened, on="doc_id")
            .join(model, on="doc_id")
            .join(lf, on="doc_id", how="left")
            .join(ann, on="doc_id", how="left")
            .join(dups, on="doc_id", how="left")
            .select(
                "doc_id",
                F.lit(batch_id).alias("batch_id"),
                F.col("__lf_ok").isNotNull().alias("lf_ok"),
                (
                    F.col("passes")
                    & F.col("model_keep")
                    & F.col("__lf_ok").isNotNull()
                    & F.col("__ann").isNull()
                    & F.col("__dup").isNull()
                ).alias("admitted"),
                F.when(F.col("__dup").isNotNull(), "dup")
                .when(F.col("__ann").isNotNull(), "ann_dup")
                .when(F.col("__lf_ok").isNull(), "line_filter")
                .when(~F.col("passes"), "screen")
                .when(~F.col("model_keep"), "model")
                .alias("reason"),
            )
        )
        out.write.mode("append").parquet(dirs["out"])

    def run_once():
        q = (
            spark.readStream.format("synthetic_documents")
            .option("docsPerBatch", "6")
            .option("scrambleDups", "true")
            .load()
            .writeStream.foreachBatch(curate_batch)
            .option("checkpointLocation", dirs["ckpt"])
            .trigger(once=True)
            .start()
        )
        q.awaitTermination(180)

    run_once()
    run_once()

    rows = {r.doc_id: r for r in spark.read.parquet(dirs["out"]).collect()}
    assert set(rows) == set(range(12))  # exactly-once across restart

    # batch-side recompute is the verdict authority
    stream_docs = spark.createDataFrame(
        [
            (i, SyntheticDocumentsDataSource.text_for(i, scramble=True))
            for i in range(12)
        ],
        "doc_id long, text string",
    )
    lf_expected = {
        r.doc_id
        for r in c4_line_filter(
            stream_docs, "doc_id", "text", **LF_KW
        ).collect()
    }
    model_expected = {
        r.doc_id: r.keep
        for r in hashed_linear_score(stream_docs, "doc_id", "text").collect()
    }
    for i in range(12):
        r = rows[i]
        assert r.lf_ok == (i in lf_expected), i
        if i % 3 == 0:
            # planted dup: ALSO fails the line filter, but the
            # embedding screen outranks it
            assert not r.lf_ok and r.reason == "ann_dup", i
        elif i == 4:
            assert r.reason == "line_filter" and not r.admitted
        elif not model_expected[i]:
            assert r.reason == "model" and not r.admitted
        else:
            assert r.admitted and r.reason is None


def test_streaming_url_frontier_screen(spark, dirs):
    """SCREEN-ZERO of the admission pipeline: cross-batch URL dedup
    against a persistent seen set — the cheapest duplicate cut (no
    content read). Each doc carries a synthetic crawl URL whose
    canonical key is doc_id % 4 under case/port/slash/tracking noise:
    batch 1 (docs 0-5) first-sees canonicals 0-3 (keepers 0-3, docs
    4-5 are in-batch dups), batch 2 (docs 6-11) is ALL dups of the now
    frozen seen set. Replaying a crashed batch is a no-op by
    construction (deterministic keepers + anti-join append): decisions
    identical, seen set unchanged."""
    from telecom_competitor_analysis_spark.operators.dedup import (
        url_frontier_screen,
    )

    seen_dir = f"{dirs['index']}_url_seen"

    def with_url(batch_df):
        did = F.col("doc_id")
        return batch_df.withColumn(
            "url",
            F.concat(
                F.when(did % 2 == 0, F.lit("https://")).otherwise(
                    F.lit("HTTPS://")
                ),
                F.lit("www.crawl.Example.COM"),
                F.when(did % 2 == 0, F.lit(":443")).otherwise(F.lit("")),
                F.lit("/page-"),
                (did % 4).cast("string"),
                F.when(did % 2 == 1, F.lit("/")).otherwise(F.lit("")),
                F.lit("?utm_source=feed&v="),
                (did % 4).cast("string"),
                F.lit("#frag"),
            ),
        )

    spark.dataSource.register(SyntheticDocumentsDataSource)

    def screen_batch(batch_df, batch_id: int) -> None:
        out = url_frontier_screen(
            with_url(batch_df), spark, seen_dir
        ).withColumn("batch_id", F.lit(batch_id))
        out.write.mode("append").parquet(dirs["out"])

    def run_once():
        q = (
            spark.readStream.format("synthetic_documents")
            .option("docsPerBatch", "6")
            .load()
            .writeStream.foreachBatch(screen_batch)
            .option("checkpointLocation", dirs["ckpt"])
            .trigger(once=True)
            .start()
        )
        q.awaitTermination(180)

    run_once()  # docs 0-5
    run_once()  # docs 6-11 (offset resumed)

    rows = {r.doc_id: r for r in spark.read.parquet(dirs["out"]).collect()}
    assert set(rows) == set(range(12))
    # batch 1: canonicals 0-3 keep their first doc; 4,5 dup onto 0,1
    for d in range(4):
        assert not rows[d].is_dup and rows[d].keeper_id == d
    assert rows[4].is_dup and rows[4].keeper_id == 0
    assert rows[5].is_dup and rows[5].keeper_id == 1
    # batch 2: every canonical already frozen — all dups, keepers 0-3
    for d in range(6, 12):
        assert rows[d].is_dup and rows[d].keeper_id == d % 4
        assert rows[d].batch_id == 1
    # canonicalization collapsed the noise: one canonical per d % 4
    canon = {r.canonical_url for r in rows.values()}
    assert canon == {
        f"https://crawl.example.com/page-{k}?v={k}" for k in range(4)
    }
    # seen set: exactly the 4 canonicals, first-batch keepers
    seen = {
        r.canonical_url: r.keeper_id
        for r in spark.read.parquet(seen_dir).collect()
    }
    assert sorted(seen.values()) == [0, 1, 2, 3] and len(seen) == 4

    # crash-replay idempotence: re-screen batch 2's exact docs directly
    replay_docs = spark.createDataFrame(
        [(i, f"w{i}") for i in range(6, 12)], "doc_id long, text string"
    )
    replay = {
        r.doc_id: r
        for r in url_frontier_screen(
            with_url(replay_docs), spark, seen_dir
        ).collect()
    }
    for d in range(6, 12):
        assert replay[d].is_dup == rows[d].is_dup
        assert replay[d].keeper_id == rows[d].keeper_id
    seen2 = spark.read.parquet(seen_dir).count()
    assert seen2 == 4  # anti-join append added nothing

    # a CORRUPT (readable-path, bad-content) seen set must RAISE, not
    # be silently treated as "first batch" — swallowing it would
    # re-admit every previously-seen URL and append duplicate
    # canonical_url rows, permanently breaking the one-row-per-canonical
    # invariant the exactly-once argument depends on
    corrupt_dir = Path(f"{dirs['index']}_url_seen_corrupt")
    corrupt_dir.mkdir(exist_ok=True)
    (corrupt_dir / "part-00000.parquet").write_bytes(b"not a parquet footer")
    with pytest.raises(Exception):
        url_frontier_screen(
            with_url(replay_docs), spark, str(corrupt_dir)
        ).collect()
    # and nothing was appended to the corrupt dir by the failed screen
    assert [p.name for p in corrupt_dir.iterdir()] == [
        "part-00000.parquet"
    ]
