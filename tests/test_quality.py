"""Behavioral tests for the corpus quality operators (repetition
signals, benchmark decontamination) on planted fixtures — the synthetic
testdata has no engineered boilerplate, so these prove the signals
actually fire where they should."""

from __future__ import annotations

from telecom_competitor_analysis_spark.operators.quality import (
    decontaminate,
    repetition_signals,
)

SPAM = "buy now buy now buy now buy now buy now"  # one bigram, looped
CLEAN = "a quick brown fox jumps over the lazy dog quietly"  # all distinct


def test_repetition_signals_flag_spam(spark):
    docs = spark.createDataFrame(
        [(1, SPAM), (2, CLEAN)], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in repetition_signals(docs, "doc_id", "text").collect()}
    spam, clean = out[1], out[2]
    # SPAM: 10 words, 2 distinct ("buy", "now"), top word appears 5 times
    assert spam.n_words == 10 and spam.n_distinct_words == 2
    assert spam.top_word_count == 5 and abs(spam.top_word_fraction - 0.5) < 1e-12
    # 9 bigrams but only 2 distinct ("buy now", "now buy") → 7/9 duplicated
    assert spam.n_bigrams == 9 and spam.n_distinct_bigrams == 2
    assert abs(spam.dup_bigram_fraction - 7 / 9) < 1e-12
    # CLEAN: every word and bigram unique
    assert clean.n_distinct_words == clean.n_words == 10
    assert clean.top_word_count == 1
    assert clean.dup_bigram_fraction == 0.0


def test_repetition_counts_match_between_paths(spark):
    # n_words from the explode path must equal the array length — the two
    # pipelines (groupBy vs shingle window) must agree on tokenization.
    docs = spark.createDataFrame(
        [(1, "x y z x y z"), (2, "solo")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in repetition_signals(docs, "doc_id", "text").collect()}
    assert out[1].n_words == 6 and out[1].n_bigrams == 5
    # a 1-word doc has no bigrams → it must still survive with 0, not drop
    assert out[2].n_words == 1


def test_repetition_null_text_scores_zero(spark):
    # NULL text must yield an explicit zero-signal row, not silently
    # bypass the signal table (and any downstream repetition filter).
    docs = spark.createDataFrame(
        [(1, "a b a"), (2, None)], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in repetition_signals(docs, "doc_id", "text").collect()}
    assert set(out) == {1, 2}
    assert out[2].n_words == 0 and out[2].n_bigrams == 0
    assert out[2].top_word_fraction == 0.0 and out[2].dup_bigram_fraction == 0.0


def test_decontaminate_finds_planted_overlap(spark):
    bench = spark.createDataFrame(
        [(100, "the secret eval answer is forty two exactly")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (1, "some training doc with the secret eval answer is forty two exactly inside"),
            (2, "a totally unrelated document about spark partitions and shuffles"),
        ],
        "doc_id long, text string",
    )
    hits = decontaminate(corpus, bench, "doc_id", "text", w=5).collect()
    assert {(r.corpus_id, r.bench_id) for r in hits} == {(1, 100)}
    # doc 1 contains the benchmark's full 8-word span → 4 shared 5-grams
    assert hits[0].n_shared_shingles == 4


def test_decontaminate_df_cap_drops_boilerplate(spark):
    # a 5-gram present in EVERY corpus doc is boilerplate; with max_df=2
    # it must not create contamination hits on its own.
    boiler = "click here to subscribe now"
    bench = spark.createDataFrame(
        [(100, f"header {boiler} footer")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [(i, f"doc number {i} says {boiler} thanks") for i in range(1, 6)],
        "doc_id long, text string",
    )
    capped = decontaminate(corpus, bench, "doc_id", "text", w=5, max_df=2)
    assert capped.count() == 0
    uncapped = decontaminate(corpus, bench, "doc_id", "text", w=5, max_df=1000)
    assert uncapped.count() == 5


def test_gopher_rules_planted_failures(spark):
    """Each rule trips on its own planted pathology and reports the
    OTHER rules independently (rule-level observability, not just a
    verdict)."""
    from telecom_competitor_analysis_spark.operators.quality import (
        gopher_rules,
    )

    good = "the quick brown fox jumps over a lazy dog and then the " \
        "fox runs far away into the deep green woods again today " \
        "with many more fine words in a long enough document here"
    docs = spark.createDataFrame(
        [
            (1, good),                                 # passes all
            (2, "short doc"),                          # word count
            (3, "the " + "spam " * 60 + "a end"),      # top-word share
            (4, " ".join(["the", "a"] * 30)),          # distinct floor
            (5, None),                                 # NULL text
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in gopher_rules(docs, "doc_id", "text").collect()}
    # NULL text: scored (not dropped), never crashes the ANSI divide,
    # and FAILS the screens (guarded rules coalesce to False)
    assert 5 in got and not got[5].passes and not got[5].r_word_count
    assert got[5].r_top_word and got[5].r_dup_bigrams  # 0.0 fractions hold
    assert got[1].passes
    assert not got[2].r_word_count and not got[2].passes
    # other rules still evaluated independently on the short doc
    assert got[2].r_mean_word_len and got[2].r_dup_bigrams
    assert not got[3].r_top_word and not got[3].passes
    assert not got[4].r_distinct and not got[4].passes
