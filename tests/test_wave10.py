"""Round-10 wave: SemDedup's scaled-blocker regime as a declared,
oracle-checked query (q_semdedup_scaled) — the production form whose
×N behavior tools/probe_semdedup_scaled.py measured at 1.5× wall on
100× vectors (bucket count ∝ corpus, constant expected bucket size)."""

from __future__ import annotations

from pyspark.sql import functions as F

from telecom_competitor_analysis_spark.plans.queries_ext import (
    EXT_QUERIES,
    SEMDEDUP_PLANES_EXPR,
    SEMDEDUP_TARGET_BUCKET,
)
from telecom_competitor_analysis_spark.sources.readers import load_table


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _planes(n: int) -> int:
    q = (n - 1) // SEMDEDUP_TARGET_BUCKET
    return 1 if q < 1 else q.bit_length()


def test_plane_rule_matches_bitlength_and_scales(spark):
    # the shared integer rule == smallest p with 2^p >= n/128, floor 1;
    # checked against the SQL text itself so the Spark expr, the oracle
    # spelling, and this Python mirror can never drift apart
    rows = spark.sql(
        "SELECT n, "
        + SEMDEDUP_PLANES_EXPR.format(n="n")
        + " AS p FROM VALUES (1), (100), (129), (500), (2000), (128000)"
        " AS t(n)"
    ).collect()
    for r in rows:
        assert r.p == _planes(r.n), r.n
    got = {r.n: r.p for r in rows}
    # bucket count demonstrably grows with the corpus
    assert got[500] == 2 and got[2000] == 4 and got[128000] == 10


def test_semdedup_scaled_buckets_and_keep_lowest(spark, sf_dir):
    res = EXT_QUERIES["q_semdedup_scaled"](spark, sf_dir)
    rows = res.collect()
    n = len(rows)
    assert n == load_table(spark, sf_dir, "embeddings").count()
    p = _planes(n)
    # every bucket is exactly the p-bit prefix pattern
    assert all(
        len(r.cluster_id) == p and set(r.cluster_id) <= {"0", "1"}
        for r in rows
    )
    # keep-lowest: the lowest id of every non-empty bucket survives
    lowest = {}
    for r in rows:
        if r.cluster_id not in lowest or r.vec_id < lowest[r.cluster_id]:
            lowest[r.cluster_id] = r.vec_id
    kept = {r.vec_id for r in rows if r.kept}
    assert set(lowest.values()) <= kept


def test_semdedup_scaled_pair_join_is_bucket_keyed(spark, sf_dir):
    # the pair stage must be an equi-join on the bucket — never a
    # cartesian / nested-loop corpus² stage (pair volume ~ 128·n)
    plan = _plan(EXT_QUERIES["q_semdedup_scaled"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "cluster_id" in plan


def test_semdedup_scaled_assign_is_materialized_artifact(spark, sf_dir):
    # the blocker assignment reads from the fingerprint-cached parquet
    # artifact (block once, prune repeatedly): the executed plan scans
    # the cache dir, and the in-query count aggregate of the BUILD is
    # absent (no Exchange SinglePartition from the 1-row count in the
    # consumer plan's scan of the artifact)
    plan = _plan(EXT_QUERIES["q_semdedup_scaled"](spark, sf_dir))
    assert "semdedup_blocker_p16t128" in plan
