"""ANN quality checks: the approximate methods must (a) return subsets of
plausible neighbors and (b) achieve non-trivial recall@10 against the
brute-force exact baseline — an approximation that recalls nothing is a
bug, not an approximation."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from telecom_competitor_analysis_spark.operators.similarity import (
    cosine_topk,
    ivf_topk,
    lsh_bucketed_topk,
)
from telecom_competitor_analysis_spark.sources.readers import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    # unpersist at module teardown: a cached bare-scan plan left in the
    # CacheManager substitutes an InMemoryTableScan into EVERY later
    # embeddings query in the session, silently changing other test
    # files' plan assertions under non-alphabetical orderings (found
    # in r12 while bisecting a test-order-dependent failure).
    df = load_table(spark, sf_dir, "embeddings").cache()
    yield df
    df.unpersist()


def _topk_sets(df):
    out: dict[int, set[int]] = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


def _recall(approx: dict[int, set[int]], exact: dict[int, set[int]]) -> float:
    hits = sum(len(approx.get(q, set()) & ns) for q, ns in exact.items())
    total = sum(len(ns) for ns in exact.values())
    return hits / total


def test_ann_recall_against_bruteforce(spark, emb):
    queries = emb.filter(F.col("vec_id") < 5)
    exact = _topk_sets(cosine_topk(emb, queries, k=10))
    assert all(len(v) == 10 for v in exact.values())

    lsh = _topk_sets(lsh_bucketed_topk(emb, queries, dim=64, k=10, n_planes=2))
    ivf = _topk_sets(ivf_topk(emb, queries, k=10, n_anchors=4))

    # coarse settings (4 buckets) scan ~1/4 of the corpus; true neighbors
    # concentrate in the query's bucket, so recall must beat the ~25%
    # random-scan floor
    assert _recall(lsh, exact) >= 0.3, f"LSH recall {_recall(lsh, exact)}"
    assert _recall(ivf, exact) >= 0.3, f"IVF recall {_recall(ivf, exact)}"


def test_incremental_topk_matches_full_recompute(spark, emb):
    """Maintaining top-k across two corpus batches must equal the one-shot
    top-k over the full corpus."""
    from telecom_competitor_analysis_spark.operators.similarity import (
        incremental_topk,
    )
    from pyspark.sql import functions as F

    queries = emb.filter(F.col("vec_id") < 3)
    batch1 = emb.filter("vec_id % 2 = 0")
    batch2 = emb.filter("vec_id % 2 = 1")
    state = incremental_topk(None, batch1, queries, k=10)
    state = incremental_topk(state, batch2, queries, k=10)
    got = {(r.query_id, r.neighbor_id) for r in state.collect()}
    want = {(r.query_id, r.neighbor_id)
            for r in cosine_topk(emb, queries, k=10).collect()}
    assert got == want


def test_ann_outputs_are_ranked_prefixes(spark, emb):
    queries = emb.filter(F.col("vec_id") < 3)
    out = ivf_topk(emb, queries, k=10, n_anchors=4).collect()
    by_q: dict[int, list[int]] = {}
    for r in sorted(out, key=lambda r: (r.query_id, r.rank)):
        by_q.setdefault(r.query_id, []).append(r.rank)
    for q, ranks in by_q.items():
        assert ranks == list(range(1, len(ranks) + 1))


def test_embedding_dup_lsh_blocking_recalls_planted_dups(spark):
    """The LSH-bucket blocking in q_embedding_dup must recall most planted
    near-duplicates (cos ≈ 0.99 pairs land in the same sign bucket with
    high probability) while scoring far fewer candidate pairs than the
    all-pairs brute force. Deterministic: seeded vectors, md5 planes."""
    import numpy as np

    from telecom_competitor_analysis_spark.operators.similarity import (
        cosine,
        hyperplane_sign_bucket,
    )

    rng = np.random.default_rng(7)
    dim, n_base = 64, 30
    base = rng.normal(size=(n_base, dim))
    rows = []
    for i, v in enumerate(base):
        dup = v + rng.normal(scale=0.02, size=dim)  # cos ≈ 0.999
        rows.append((2 * i, [float(x) for x in v]))
        rows.append((2 * i + 1, [float(x) for x in dup]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    bucketed = df.withColumn(
        "bucket", hyperplane_sign_bucket(F.col("embedding"), dim, n_planes=4)
    )
    a = bucketed.select(
        F.col("bucket"), F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("va"),
    )
    b = bucketed.select(
        F.col("bucket"), F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("vb"),
    )
    cand = a.join(b, on="bucket").filter(F.col("id_a") < F.col("id_b"))
    got = {
        (r.id_a, r.id_b)
        for r in cand.withColumn("cos", cosine(F.col("va"), F.col("vb")))
        .filter(F.col("cos") >= 0.9)
        .collect()
    }
    planted = {(2 * i, 2 * i + 1) for i in range(n_base)}
    recall = len(got & planted) / len(planted)
    assert recall >= 0.6, f"planted-dup recall {recall}"
    # blocking actually prunes: candidate volume ≪ all-pairs
    n_cand = cand.count()
    assert n_cand < (2 * n_base) * (2 * n_base - 1) // 2 / 3


def test_ivf_index_probe_recall_and_exact_degradation(spark, emb, tmp_path):
    """ann_against_index over a materialized IVF index: (a) nprobe=2
    candidates are a superset of nprobe=1 per query (monotone recall),
    (b) nprobe = n_anchors probes every bucket and must EQUAL the
    brute-force exact top-k, and (c) the probe join prunes the
    bucket-partitioned scan dynamically (DPP in the plan)."""
    from telecom_competitor_analysis_spark.operators.similarity import (
        ann_against_index,
        build_ivf_index,
    )

    idx = str(tmp_path / "ivf")
    build_ivf_index(emb, idx, n_anchors=8)
    queries = emb.filter(F.col("vec_id") < 5)

    p1 = _topk_sets(ann_against_index(queries, spark, idx, k=10, nprobe=1))
    p2 = _topk_sets(ann_against_index(queries, spark, idx, k=10, nprobe=2))
    exact = _topk_sets(cosine_topk(emb, queries, k=10))
    r1, r2 = _recall(p1, exact), _recall(p2, exact)
    assert r2 >= r1 > 0

    full = ann_against_index(queries, spark, idx, k=10, nprobe=8)
    assert sorted(map(tuple, full.collect())) == sorted(
        map(
            tuple,
            cosine_topk(emb, queries, k=10).collect(),
        )
    )

    plan = ann_against_index(
        queries, spark, idx, k=10, nprobe=2
    )._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()


def test_kmeans_assign_deterministic_and_sane(spark):
    """kmeans_assign on a planted 2-cluster layout: (a) every vector
    lands with its own cluster's seed after 2 Lloyd rounds, (b) the
    result is identical under different partitioning (the integer-micro
    centroid discipline), (c) cluster ids are seed ids."""
    import pandas as pd

    from telecom_competitor_analysis_spark.operators.similarity import (
        kmeans_assign,
    )

    # two tight, well-separated direction clusters in 4d; seeds (the 2
    # lowest ids) fall one in each cluster
    rows = []
    for i in range(40):
        base = [1.0, 0.0, 0.0, 0.0] if i % 2 == 0 else [0.0, 1.0, 0.0, 0.0]
        jit = 0.01 * (i % 5)
        rows.append(
            {"vec_id": i, "embedding": [base[0], base[1], jit, 0.02 * (i % 3)]}
        )
    emb = spark.createDataFrame(pd.DataFrame(rows))

    got = {
        r.vec_id: r.cluster_id
        for r in kmeans_assign(
            emb, "vec_id", "embedding", k=2, iters=2, dim=4
        ).collect()
    }
    assert set(got.values()) == {0, 1}
    for i, cid in got.items():
        assert cid == i % 2, f"vec {i} assigned {cid}"

    repart = {
        r.vec_id: r.cluster_id
        for r in kmeans_assign(
            emb.repartition(7), "vec_id", "embedding", k=2, iters=2, dim=4
        ).collect()
    }
    assert repart == got


def test_semdedup_prunes_planted_neardups_keep_lowest(spark):
    """semdedup_prune: planted near-identical vectors are deduped to the
    LOWEST id per semantic group; well-separated vectors survive."""
    import pandas as pd

    from telecom_competitor_analysis_spark.operators.similarity import (
        semdedup_prune,
    )

    rows = []
    # group A: ids 0,2,4 near-identical; group B: ids 1,3 near-identical;
    # id 5: orthogonal singleton (cos 0 to everything)
    for i, vec in [
        (0, [1.0, 0.0, 0.001, 0.0]),
        (2, [1.0, 0.0, 0.002, 0.0]),
        (4, [1.0, 0.0, 0.0, 0.003]),
        (1, [0.0, 1.0, 0.001, 0.0]),
        (3, [0.0, 1.0, 0.0, 0.002]),
        (5, [0.0, 0.0, 0.0, 1.0]),
    ]:
        rows.append({"vec_id": i, "embedding": vec})
    emb = spark.createDataFrame(pd.DataFrame(rows))
    got = {
        r.vec_id: r.kept
        for r in semdedup_prune(
            emb, "vec_id", "embedding", k=2, iters=2, dim=4, threshold=0.9
        ).collect()
    }
    assert len(got) == 6
    assert got[0] is True and got[2] is False and got[4] is False
    assert got[1] is True and got[3] is False
    assert got[5] is True  # cos 0 to every cluster-mate — never dropped


def test_ivf_index_append_equals_rebuild(spark, tmp_path):
    """append_to_ivf_index: build on the day-0 corpus, append the
    intra-day batch — probes over the appended index must EQUAL probes
    over a full rebuild (same anchor set: the day-0 corpus holds the
    lowest ids, so the rebuild picks identical anchors), and appended
    rows must respect the frozen per-bucket sub split."""
    import glob

    import pandas as pd

    from telecom_competitor_analysis_spark.operators.similarity import (
        ann_against_index,
        append_to_ivf_index,
        build_ivf_index,
    )

    n, dim = 120, 8
    rows = [
        {
            "vec_id": i,
            "embedding": [1.0 + 0.01 * ((i * 3 + d) % 7) for d in range(dim)],
        }
        for i in range(n)
    ]
    emb = spark.createDataFrame(pd.DataFrame(rows))
    day0 = emb.filter(F.col("vec_id") < 80)
    intraday = emb.filter(F.col("vec_id") >= 80)

    appended = str(tmp_path / "appended")
    rebuilt = str(tmp_path / "rebuilt")
    build_ivf_index(day0, appended, n_anchors=4, max_bucket_size=20)
    append_to_ivf_index(intraday, spark, appended)
    build_ivf_index(emb, rebuilt, n_anchors=4, max_bucket_size=20)

    queries = emb.filter(F.col("vec_id") % 37 == 0)
    for nprobe in (1, 2, 4):
        a = sorted(
            map(
                tuple,
                ann_against_index(
                    queries, spark, appended, k=8, nprobe=nprobe
                ).collect(),
            )
        )
        b = sorted(
            map(
                tuple,
                ann_against_index(
                    queries, spark, rebuilt, k=8, nprobe=nprobe
                ).collect(),
            )
        )
        assert a == b

    # appended rows landed inside the FROZEN sub layout: no new sub dir
    # exceeds the build-time sub count recorded in meta
    meta = {
        r.bucket: r.n_subs
        for r in spark.read.parquet(f"{appended}/meta").collect()
    }
    for d in glob.glob(f"{appended}/assignments/bucket=*/sub=*"):
        bucket = int(d.split("bucket=")[1].split("/")[0])
        sub = int(d.split("sub=")[1])
        assert sub < meta[bucket], f"{d} outside frozen sub split"


def test_ivf_index_bucket_cap_splits_hot_bucket(spark, tmp_path):
    """Skew guard (r6 VERDICT item 1): plant a hot cluster — every vector
    nearest the SAME anchor — and build with max_bucket_size. The hot
    bucket must be hash-split into ceil(count/cap) sub-partitions with no
    sub-partition holding the whole bucket, and probe answers must be
    IDENTICAL to the uncapped index (the split is physical layout only)."""
    import glob
    import os

    import pandas as pd

    from telecom_competitor_analysis_spark.operators.similarity import (
        ann_against_index,
        build_ivf_index,
    )

    # 200 near-identical vectors: anchor policy picks the 4 lowest ids as
    # anchors; the tiny monotone last-dim component makes EVERY vector's
    # max dot product land on anchor 3 (largest last-dim) → one hot
    # bucket holding the whole corpus
    n, dim = 200, 8
    rows = [
        {
            "vec_id": i,
            "embedding": [10.0] + [0.5] * (dim - 2) + [1e-4 * i],
        }
        for i in range(n)
    ]
    emb = spark.createDataFrame(pd.DataFrame(rows))

    capped = str(tmp_path / "capped")
    flat = str(tmp_path / "flat")
    build_ivf_index(emb, capped, n_anchors=4, max_bucket_size=50)
    build_ivf_index(emb, flat, n_anchors=4)

    # physical layout: the hot bucket spans ≥ count/cap sub-dirs, and no
    # (bucket, sub) partition holds more than ~cap rows (hash-uniform
    # split; allow 2× slack for hash imbalance at this size)
    sub_dirs = glob.glob(f"{capped}/assignments/bucket=*/sub=*")
    by_bucket: dict[str, list[str]] = {}
    for d in sub_dirs:
        by_bucket.setdefault(os.path.dirname(d), []).append(d)
    hot = max(by_bucket.values(), key=len)
    assert len(hot) >= 3  # ≥ ceil(hot_count/50) with hot_count ≈ 200
    for d in sub_dirs:
        cnt = pd.concat(
            pd.read_parquet(f) for f in glob.glob(f"{d}/*.parquet")
        ).shape[0]
        assert cnt <= 100, f"{d}: {cnt} rows > 2x cap"

    # answers: capped ≡ uncapped for every nprobe
    queries = emb.filter(F.col("vec_id") < 5)
    for nprobe in (1, 2, 4):
        a = sorted(
            map(
                tuple,
                ann_against_index(
                    queries, spark, capped, k=10, nprobe=nprobe
                ).collect(),
            )
        )
        b = sorted(
            map(
                tuple,
                ann_against_index(
                    queries, spark, flat, k=10, nprobe=nprobe
                ).collect(),
            )
        )
        assert a == b

    # DPP on the bucket level survives the two-level partitioning
    plan = ann_against_index(
        queries, spark, capped, k=10, nprobe=2
    )._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()


def test_ann_filtered_prefilter_semantics_and_pushdown(spark, emb, tmp_path):
    """Filtered search against the IVF index with the label carried
    inline: (a) nprobe = n_anchors (exhaustive probing) must EQUAL exact
    brute force over the label-filtered corpus — the pre-filter changes
    WHO is ranked, not the ranking; (b) pre-filtering beats
    post-filtering on this data: filtering the UNfiltered top-10 after
    the fact yields fewer than k survivors for every query; (c) the
    plan pushes the label predicate into the index parquet scan AND
    keeps the dynamic bucket pruning."""
    from telecom_competitor_analysis_spark.operators.similarity import (
        ann_against_index,
        build_ivf_index,
    )

    idx = str(tmp_path / "ivf_carry")
    build_ivf_index(
        emb, idx, n_anchors=8, max_bucket_size=50, carry_cols=("label",)
    )
    queries = emb.filter(F.col("vec_id") < 5)
    pred = F.col("label") == 3

    full = ann_against_index(
        queries, spark, idx, k=10, nprobe=8, pre_filter=pred
    )
    exact = cosine_topk(emb.filter(pred), queries, k=10)
    assert sorted(map(tuple, full.collect())) == sorted(
        map(tuple, exact.collect())
    )

    # post-filtering an unfiltered top-10 starves: every query keeps
    # fewer than k neighbors (labels are ~1/10th of the corpus each)
    unfiltered = ann_against_index(queries, spark, idx, k=10, nprobe=8)
    lab = emb.select(
        F.col("vec_id").alias("neighbor_id"), "label"
    )
    post = (
        unfiltered.join(lab, on="neighbor_id")
        .filter(pred)
        .groupBy("query_id")
        .count()
        .collect()
    )
    assert all(r["count"] < 10 for r in post)

    probe = ann_against_index(
        queries, spark, idx, k=10, nprobe=2, pre_filter=pred
    )
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()
    assert "PushedFilters: [" in plan and "EqualTo(label,3)" in plan


def test_kcenter_covers_planted_clusters_and_matches_bruteforce(spark):
    """kcenter_select on 4 planted well-separated clusters must pick
    exactly one point per cluster (the farthest-point guarantee), and
    the full selection sequence must equal a brute-force greedy
    reference."""
    import pandas as pd

    from telecom_competitor_analysis_spark.operators.similarity import (
        kcenter_select,
    )

    # clusters at the corners of a square, side >> intra-cluster spread
    centers = [(0, 0), (1000, 0), (0, 1000), (1000, 1000)]
    rows = []
    vid = 0
    for cx, cy in centers:
        for dx, dy in ((0, 0), (1, 2), (3, 1)):
            rows.append((vid, [cx + dx, cy + dy] + [0] * 62))
            vid += 1
    pdf = pd.DataFrame(rows, columns=["vec_id", "mv"])
    df = spark.createDataFrame(pdf).select(
        "vec_id", F.col("mv").cast("array<long>").alias("mv")
    )
    got = {
        r.sel_round: r.vec_id
        for r in kcenter_select(df, k=4).collect()
    }

    # brute-force greedy reference
    pts = {r[0]: r[1] for r in rows}

    def d2(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    sel = [min(pts)]
    for _ in range(3):
        best = max(
            ((vid, min(d2(v, pts[s]) for s in sel))
             for vid, v in pts.items()),
            key=lambda t: (t[1], -t[0]),
        )
        sel.append(best[0])
    assert [got[r] for r in range(4)] == sel
    # one selection per planted cluster
    assert sorted(got[r] // 3 for r in range(4)) == [0, 1, 2, 3]


def test_kcenter_degenerate_corpus_yields_distinct_ids(spark):
    """Fewer distinct vectors than k: the anti-join keeps the contract
    of k DISTINCT ids (ties at dmin=0 pick the lowest unselected id)
    instead of re-selecting round 0's point forever."""
    import pandas as pd

    from telecom_competitor_analysis_spark.operators.similarity import (
        kcenter_select,
    )

    rows = [(i, [i % 2 * 100, 0, 0, 0]) for i in range(5)]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "mv"])
    ).select("vec_id", F.col("mv").cast("array<long>").alias("mv"))
    got = kcenter_select(df, k=4).collect()
    ids = [r.vec_id for r in got]
    assert len(set(ids)) == 4
    # round 0 = lowest id, round 1 = the other pole, then zero-distance
    # fill-ins in id order
    by_round = {r.sel_round: r.vec_id for r in got}
    assert by_round[0] == 0 and by_round[1] == 1
    assert {by_round[2], by_round[3]} == {2, 3}


def test_append_to_ivf_index_carries_stored_metadata(spark, emb, tmp_path):
    """Appends to a carry_cols index must follow the STORED schema:
    appended rows keep the carried label, and a filtered probe over the
    appended index equals the same probe over a full rebuild."""
    from telecom_competitor_analysis_spark.operators.similarity import (
        ann_against_index,
        append_to_ivf_index,
        build_ivf_index,
    )

    # day0 keeps the lowest ids so the frozen anchors equal the
    # rebuild's anchor pick (append ≡ rebuild needs the same anchors —
    # the existing equivalence test's precondition)
    day0 = emb.filter(F.col("vec_id") < 400)
    batch = emb.filter(F.col("vec_id") >= 400)
    appended = str(tmp_path / "appended")
    rebuilt = str(tmp_path / "rebuilt")
    build_ivf_index(
        day0, appended, n_anchors=4, max_bucket_size=20,
        carry_cols=("label",),
    )
    append_to_ivf_index(batch, spark, appended)
    build_ivf_index(
        emb, rebuilt, n_anchors=4, max_bucket_size=20,
        carry_cols=("label",),
    )
    # appended rows kept their label (no NULL holes)
    stored = spark.read.parquet(f"{appended}/assignments")
    assert stored.filter(F.col("label").isNull()).count() == 0
    queries = emb.filter(F.col("vec_id") < 5)
    pred = F.col("label") == 3
    a = ann_against_index(
        queries, spark, appended, k=5, nprobe=2, pre_filter=pred
    )
    b = ann_against_index(
        queries, spark, rebuilt, k=5, nprobe=2, pre_filter=pred
    )
    assert sorted(map(tuple, a.collect())) == sorted(
        map(tuple, b.collect())
    )


def test_multiprobe_superset_and_recall_monotone(spark, emb):
    """Multi-probe candidates must be a strict SUPERSET of the
    single-bucket LSH run per query (the own-bucket probe is always
    included), so recall@10 vs brute force can only go up."""
    from telecom_competitor_analysis_spark.operators.similarity import (
        multiprobe_lsh_topk,
    )

    queries = emb.filter(F.col("vec_id") < 5)
    single = _topk_sets(
        lsh_bucketed_topk(emb, queries, dim=64, k=10, n_planes=4)
    )
    multi = _topk_sets(
        multiprobe_lsh_topk(emb, queries, dim=64, k=10, n_planes=4)
    )
    exact = _topk_sets(cosine_topk(emb, queries, k=10))
    assert _recall(multi, exact) >= _recall(single, exact)
    # every query's multiprobe list is drawn from a candidate superset:
    # any single-bucket hit missing from the multiprobe TOP-10 can only
    # have been displaced by a better candidate, so the multiprobe
    # worst-kept cosine >= the single-bucket worst-kept cosine — checked
    # transitively by recall; additionally the probe fan-out must
    # include the identity bucket (same neighbors when no flip helps)
    for qid, s in single.items():
        assert multi.get(qid), f"query {qid} lost all neighbors"
