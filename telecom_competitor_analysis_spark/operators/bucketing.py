"""Bucketed (pre-shuffled) table layout — co-located joins without a
shuffle.

At 100 TB the dominant cost of a fact-fact join (orders ⋈ lineitem
here; the reference's staged-table joins live in BigQuery, reference
dags/load_to_bigquery_dag.py:60-96, where the warehouse co-locates for
free) is the exchange of BOTH fact tables on the join key, every time
the join runs. Spark's answer is bucketing: write each table ONCE
hash-partitioned into N buckets on the join key, record the bucket spec
in the catalog, and every subsequent equi-join on that key reads the
matching bucket files pair-wise with NO exchange on either side — the
shuffle is paid once at layout time, amortized over every downstream
join (the same pay-once discipline as the materialized shingle/IVF
indexes).

Mechanics this module pins down (each is a real Spark sharp edge):

- **Write**: ``df.write.bucketBy(n, key)`` is only valid for catalog
  tables (``saveAsTable``), not path writes — so the writer creates a
  throwaway catalog entry with an explicit ``path`` option and drops
  the entry right after (the files keep the bucket-id encoding in
  their names; the catalog entry is session-local anyway). The frame
  is ``repartition(n, key)``-ed first: Spark's repartition hash and
  bucket hash are the same Murmur3-mod-n, so each task holds exactly
  one bucket's rows and writes exactly ONE file per bucket — without
  it, every task writes a sliver of every bucket (task× n small
  files).
- **Re-attach**: bucket membership is metadata, not file content. A
  fresh session re-attaches the layout with ``CREATE TABLE … USING
  PARQUET CLUSTERED BY (key) INTO n BUCKETS LOCATION path`` — the DDL's
  bucket count MUST match the files' (both are derived from the same
  artifact tag here; a mismatch silently mis-joins, which is why the
  count lives in the artifact fingerprint).
(``sources.writers.write_bucketed`` is the MANAGED-table sibling — same
bucket contract, but the entry lives in the session warehouse and dies
with the catalog; this module's path-based layout + re-attach is the
shared-artifact form the ``_materialized`` cache needs.)

- **Read**: with ``spark.sql.sources.bucketing.enabled`` (default on),
  a join of two tables bucketed into the same N on their join keys
  plans as a SortMergeJoin with ZERO Exchange below it (pinned in
  tests/test_scale_plans.py). Spark does NOT exploit ``SORTED BY`` at
  read time (SPARK-19256 — per-bucket sort only skips if each bucket
  is a single file AND the reader trusts it; local Sort nodes remain),
  so the win is the exchange, not the sort — the sort is local,
  spill-safe, and never a network cost.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed_layout(
    df: DataFrame, path: str, key: str, n_buckets: int
) -> None:
    """Write ``df`` as a bucketed parquet layout at ``path`` (one file
    per bucket), leaving no catalog entry behind."""
    spark = df.sparkSession
    # unique per build target: the staging dir basename is already
    # mkdtemp-unique, so concurrent builders never collide on the name
    tmp_name = "tcas_bkwrite_" + "".join(
        c if c.isalnum() else "_" for c in os.path.basename(path)
    )
    spark.sql(f"DROP TABLE IF EXISTS `{tmp_name}`")
    (
        df.repartition(n_buckets, F.col(key))
        .write.bucketBy(n_buckets, key)
        .sortBy(key)
        .option("path", path)
        .mode("overwrite")
        .saveAsTable(tmp_name)
    )
    spark.sql(f"DROP TABLE `{tmp_name}`")


def attach_bucketed_layout(
    spark: SparkSession,
    name: str,
    schema,
    key: str,
    n_buckets: int,
    location: str,
) -> DataFrame:
    """Re-attach a bucketed layout written by :func:`write_bucketed_layout` as
    a catalog table (idempotent — CREATE IF NOT EXISTS; the entry is
    session-local, the files are shared). ``schema`` must be the
    written frame's schema — bucketed scans trust the DDL."""
    cols = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields
    )
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS `{name}` ({cols}) USING PARQUET"
        f" CLUSTERED BY (`{key}`) SORTED BY (`{key}`)"
        f" INTO {n_buckets} BUCKETS LOCATION '{location}'"
    )
    return spark.table(name)


def append_bucketed_layout(
    df: DataFrame, path: str, key: str, n_buckets: int
) -> None:
    """Intra-day append to an existing bucketed layout (the operational
    complement of :func:`write_bucketed_layout`, mirroring
    ``append_to_ivf_index``): the batch is repartitioned on the SAME
    bucket hash and appended through a catalog entry with the SAME
    explicit bucket spec — Spark refuses a spec mismatch, so an append
    can never silently corrupt bucket membership. Joins over the
    appended layout stay exchange-free (pinned by test).

    Each append adds at most ``n_buckets`` files; compaction is the
    nightly rebuild (write_bucketed_layout into a fresh artifact), the
    same lifecycle as the IVF index."""
    spark = df.sparkSession
    tmp_name = "tcas_bkappend_" + "".join(
        c if c.isalnum() else "_" for c in os.path.basename(path)
    )
    spark.sql(f"DROP TABLE IF EXISTS `{tmp_name}`")
    attach_bucketed_layout(spark, tmp_name, df.schema, key, n_buckets, path)
    try:
        (
            df.repartition(n_buckets, F.col(key))
            .write.mode("append")
            .bucketBy(n_buckets, key)
            .sortBy(key)
            .saveAsTable(tmp_name)
        )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS `{tmp_name}`")
