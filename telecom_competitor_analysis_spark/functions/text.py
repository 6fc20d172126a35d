"""Text-analysis column builders for the training-data extension surface
(BASELINE.json north star): tokenization, quality stats, language-ID
heuristic, document fingerprints. All native column expressions — the text
hot path stays JVM-side/codegen'd; no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny deterministic stopword list for quality scoring / lang-id
EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")

# BPE-ish token pattern: runs of letters, runs of digits, or single
# punctuation — a deterministic stand-in for a real BPE vocab.
BPE_ISH_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def words(col: Column) -> Column:
    """Whitespace tokenization (single-space split, '' artifacts kept —
    identical semantics in Spark and DuckDB string_split)."""
    return F.split(col, " ")


def n_words(col: Column) -> Column:
    return F.size(words(col)).cast("long")


def n_distinct_words(col: Column) -> Column:
    return F.size(F.array_distinct(words(col))).cast("long")


def sum_word_len(col: Column) -> Column:
    """Total characters across words (exact integer aggregate over the
    array — order-independent)."""
    return F.aggregate(
        F.transform(words(col), lambda w: F.length(w)),
        F.lit(0),
        lambda acc, x: acc + x,
    ).cast("long")


def stopword_count(col: Column, stopwords: tuple[str, ...] = EN_STOPWORDS) -> Column:
    return F.size(
        F.filter(words(col), lambda w: F.lower(w).isin(*stopwords))
    ).cast("long")


def bpe_ish_token_count(col: Column) -> Column:
    """Token count under the BPE-ish regex (F.regexp_count — JVM-side)."""
    return F.regexp_count(col, F.lit(BPE_ISH_PATTERN)).cast("long")


def doc_fingerprint(col: Column) -> Column:
    """Content fingerprint: md5 of the sorted distinct word set — stable
    under word reordering / duplication (a cheap canonical-form hash; the
    rolling-hash shingle variant lives in operators/dedup.py)."""
    return F.md5(
        F.array_join(F.array_sort(F.array_distinct(words(F.trim(col)))), " ")
    )


def exact_fingerprint(col: Column) -> Column:
    """Byte-exact fingerprint: md5 of the trimmed text."""
    return F.md5(F.trim(col))


def lang_id_heuristic(col: Column) -> Column:
    """Marker-word language ID: score English / Spanish / German marker
    hits over the word set; argmax with fixed tie order (en > es > de >
    unknown). Deterministic by construction — a stand-in for an n-gram
    model, with identical SQL semantics for the oracle."""
    w = words(F.lower(col))
    en = F.size(F.filter(w, lambda x: x.isin("the", "and", "of", "is")))
    es = F.size(F.filter(w, lambda x: x.isin("el", "la", "de", "que")))
    de = F.size(F.filter(w, lambda x: x.isin("der", "die", "und", "das")))
    return (
        F.when((en >= es) & (en >= de) & (en > 0), F.lit("en"))
        .when((es >= de) & (es > 0), F.lit("es"))
        .when(de > 0, F.lit("de"))
        .otherwise(F.lit("unknown"))
    )
