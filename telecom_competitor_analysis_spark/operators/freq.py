"""Frequency operators: exact heavy hitters at corpus scale.

The 100 TB problem with the obvious ``groupBy(token).count()`` heavy
hitter: it shuffles the ENTIRE vocabulary — at web scale the token/
n-gram domain is billions of keys, nearly all of them tail keys that
can never clear a frequency threshold, yet every one of them pays the
exchange. The classical fix (Misra & Gries 1982; merged-summary form in
Berinde et al. PODS'09) is a bounded-state candidate pass + an exact
verify pass:

1. **Candidates** — each partition keeps at most ``k-1`` weighted
   Misra-Gries counters (constant memory per task, no shuffle). The
   union of per-partition survivors is a guaranteed SUPERSET of every
   token with global count > N/k: if count(w)·k > N = Σ n_p then by
   pigeonhole some partition has count_p(w)·k > n_p, and a single-
   partition MG summary never finishes with a zero counter for a token
   whose partition count exceeds n_p/k (total decrement mass per
   partition is ≤ n_p/k).
2. **Verify** — one exact count restricted to the (tiny, broadcast)
   candidate set. Map-side partial aggregation collapses candidate
   occurrences before the only exchange, whose width is bounded by
   |candidates| per task — never the vocabulary.

The final answer is EXACT (the oracle is the plain threshold count —
a green oracle run proves the candidate pass lossless), and no stage's
state or shuffle grows with the vocabulary. This is the third member of
the repo's candidate+verify family (MinHash-LSH bands, PPJoin prefix
filter), applied to frequency instead of similarity.

Python boundary note: the MG summary is one of the few genuinely
imperative per-partition algorithms in the engine (bounded mutable
state across rows), so it runs as an Arrow-batched ``mapInPandas``
stage — each batch is pre-aggregated with ``value_counts`` first, so
the Python-level loop touches ~|batch vocabulary| entries, not every
token occurrence. Reference parity: the reference engine has no
streaming-summary operator; this is part of the engine-added
training-data surface (SURVEY.md §2.12).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType


def misra_gries_candidates(tokens: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition weighted Misra-Gries summaries, unioned.

    Returns the surviving tokens of each partition's ``k-1``-counter
    summary (with possible cross-partition duplicates — callers
    ``distinct()`` the result, which is bounded by partitions·(k-1)
    rows, never data-sized). Guaranteed superset of all tokens with
    global count > N/k; NOT exact — always follow with a verify pass.

    The output schema is derived from the input column's type, so a
    non-string token column round-trips Arrow with its own type instead
    of being silently coerced to string.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    out_schema = StructType([StructField(col, tokens.schema[col].dataType)])

    def mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for pdf in batches:
            # batch pre-aggregation: the Python loop below runs per
            # DISTINCT batch token, not per occurrence
            for tok, cnt in pdf[col].value_counts().items():
                c = int(cnt)
                if tok in counters:
                    counters[tok] += c
                    continue
                counters[tok] = c
                if len(counters) < k:
                    continue
                # summary full (k entries): subtract the minimum
                # counter from every entry and drop the zeros — the
                # weighted-arrival MG decrement (removes ≥ 1 entry,
                # total decrement mass ≤ n_p/k over the partition)
                d = min(counters.values())
                counters = {
                    t: v - d for t, v in counters.items() if v > d
                }
        yield pd.DataFrame({col: list(counters.keys())})

    return tokens.mapInPandas(mg, schema=out_schema)


def heavy_hitters(
    tokens: DataFrame,
    col: str,
    inv_frac: int,
    k: int | None = None,
) -> DataFrame:
    """Exact tokens with count · inv_frac > N (frequency > 1/inv_frac
    of all tokens), without ever shuffling the full vocabulary.

    ``k`` (default ``inv_frac``) is the per-partition MG summary size;
    the candidate guarantee needs ``k >= inv_frac``. Three passes over
    ``tokens`` — candidates (map-only), total count (columnless
    map-side agg), exact verify (broadcast semi-restriction, then a
    candidate-bounded exchange) — each cheap at scale; what is NEVER
    paid is a vocabulary-wide shuffle. The threshold compare is exact
    integer arithmetic (count·inv_frac > N), mirrored verbatim in the
    DuckDB oracle. Returns (``col``, cnt).

    NULL tokens are excluded from the universe entirely (the counts,
    the candidates AND the total N) — the one consistent contract the
    pipeline can mirror: pandas ``value_counts`` drops NaN in the
    candidate pass and an equi-join never matches NULL, so any other
    treatment would silently omit a genuinely heavy NULL while still
    counting it in N.
    """
    if k is None:
        k = inv_frac
    if k < inv_frac:
        raise ValueError(
            f"k={k} < inv_frac={inv_frac} voids the MG superset "
            "guarantee (needs k >= inv_frac)"
        )
    tokens = tokens.filter(F.col(col).isNotNull())
    cand = misra_gries_candidates(tokens, col, k).distinct()
    total = tokens.agg(F.count(F.lit(1)).cast("long").alias("__total"))
    return (
        tokens.join(F.broadcast(cand), on=col)
        .groupBy(col)
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * F.lit(inv_frac) > F.col("__total"))
        .drop("__total")
    )
