"""SemDeDup vs an independent pure-Python re-derivation.

The oracle repeats the whole written spec (assign to nearest normalized
centroid by argmax, per-cluster greedy prune in (centroid_sim asc,
vec_id) order) directly with numpy over collected rows — no shared
per-cluster code path with the operator."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from deidcm_spark.operators.semdedup import semdedup
from deidcm_spark.operators.similarity import ivf_centroids

SF = "/root/testdata/sf0.001/embeddings.parquet"
THRESHOLD = 0.9


@pytest.fixture(scope="module")
def emb(spark):
    """The sf0.001 embeddings plus 30 DETERMINISTIC perturbed copies —
    the raw synthetic corpus has no pair above cosine 0.48, so the dup
    rows are what gives the threshold something to prune."""
    base = spark.read.parquet(SF).select("vec_id", "embedding")
    rows = base.orderBy("vec_id").limit(30).collect()
    dups = []
    for i, r in enumerate(rows):
        v = list(r["embedding"])
        v[i % len(v)] += 0.02 * (1 + i % 3)  # cosine vs source ~0.998
        dups.append((10_000 + r["vec_id"], v))
    extra = spark.createDataFrame(dups, "vec_id long, embedding array<float>")
    return base.unionByName(extra)


def _py_semdedup(rows, centroids, threshold):
    C = np.asarray(centroids, dtype=np.float64)
    C = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    ids = np.array([r["vec_id"] for r in rows])
    M = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
    clusters = np.argmax(M @ C.T, axis=1)
    out = {}
    for cl in np.unique(clusters):
        idx = np.where(clusters == cl)[0]
        sub, sid = M[idx], ids[idx]
        sim_c = sub @ C[cl]
        order = np.lexsort((sid, sim_c))
        S = sub @ sub.T
        kept = []
        for i in order:
            if kept and np.max(S[i, kept]) >= threshold:
                out[int(sid[i])] = (int(cl), round(float(sim_c[i]), 6), "DROP")
            else:
                out[int(sid[i])] = (int(cl), round(float(sim_c[i]), 6), "KEEP")
                kept.append(i)
    return out


def test_semdedup_matches_python_oracle(spark, emb):
    cents = ivf_centroids(emb, n_centroids=8)
    got = {
        r["vec_id"]: (r["cluster"], r["centroid_sim"], r["action"])
        for r in semdedup(emb, threshold=THRESHOLD, centroids=cents).collect()
    }
    want = _py_semdedup(emb.collect(), cents, THRESHOLD)
    assert got.keys() == want.keys() and len(got) == 530
    diff = {k: (got[k], want[k]) for k in want if got[k] != want[k]}
    assert not diff, f"{len(diff)} mismatches, e.g. {list(diff.items())[:3]}"
    acts = {v[2] for v in got.values()}
    assert acts == {"KEEP", "DROP"}  # the threshold actually bites


def test_semdedup_is_deterministic_and_repartition_stable(spark, emb):
    a = sorted(semdedup(emb, threshold=THRESHOLD, n_centroids=8).collect())
    b = sorted(
        semdedup(emb.repartition(7), threshold=THRESHOLD, n_centroids=8).collect()
    )
    assert a == b


def test_dropped_items_have_a_kept_witness(spark, emb):
    """Internal contract: every DROP is within threshold of some KEEP in
    its own cluster; KEEPs are mutually below threshold."""
    res = semdedup(emb, threshold=THRESHOLD, n_centroids=8).collect()
    vecs = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
            for r in emb.collect()}
    for vid in vecs:
        vecs[vid] = vecs[vid] / max(np.linalg.norm(vecs[vid]), 1e-12)
    by_cluster = {}
    for r in res:
        by_cluster.setdefault(r["cluster"], []).append(r)
    for rows in by_cluster.values():
        kept = [r["vec_id"] for r in rows if r["action"] == "KEEP"]
        for r in rows:
            sims = [float(vecs[r["vec_id"]] @ vecs[k]) for k in kept
                    if k != r["vec_id"]]
            if r["action"] == "DROP":
                assert max(sims) >= THRESHOLD
            else:
                assert not sims or max(sims) < THRESHOLD


def test_plan_single_cluster_shuffle_no_bnlj(spark, emb):
    df = semdedup(emb, threshold=THRESHOLD, n_centroids=8)
    df.collect()
    plan = (
        df._jdf.queryExecution().executedPlan().toString()
        .split("== Initial Plan ==")[0]  # final-plan-only (CLAUDE.md gotcha)
    )
    assert "BroadcastNestedLoop" not in plan and "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") <= 1
    assert "FlatMapGroupsInPandas" in plan


def test_giant_cluster_fails_loudly(spark, emb):
    """A degenerate codebook (every vector in one cluster) must raise with
    guidance, not silently build an O(c^2) matrix."""
    with pytest.raises(Exception, match="max_cluster_size"):
        semdedup(emb, threshold=0.9, n_centroids=1,
                 max_cluster_size=100).collect()
