"""Cluster-balanced selection vs an independent numpy/pure-Python
re-derivation (operators/balance.py): assignment, quota apportionment,
and the exact selected set are each checked; salted ≡ unsalted."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from deidcm_spark.operators.balance import (
    cluster_balanced_sample,
    cluster_quotas,
)
from deidcm_spark.operators.similarity import ivf_centroids

SF = "/root/testdata/sf0.001/embeddings.parquet"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(SF).select("vec_id", "embedding")


@pytest.fixture(scope="module")
def cents(spark, emb):
    return ivf_centroids(emb, n_centroids=8)


def _py_select(rows, centroids, k, policy, alpha=0.5):
    C = np.asarray(centroids, dtype=np.float64)
    C = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    ids = np.array([r["vec_id"] for r in rows])
    M = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
    cl = np.argmax(M @ C.T, axis=1)
    sizes = {int(c): int((cl == c).sum()) for c in np.unique(cl)}
    quota = cluster_quotas(sizes, k, policy, alpha)
    out = set()
    for c in sizes:
        members = sorted(
            (int(i) for i in ids[cl == c]),
            key=lambda d: (hashlib.md5(str(d).encode()).hexdigest(), d),
        )
        out |= {(d, c) for d in members[: quota[c]]}
    return out, sizes, quota


def test_quota_apportionment_properties():
    sizes = {0: 100, 1: 50, 2: 3, 3: 1}
    for policy in ("uniform", "proportional", "temperature"):
        q = cluster_quotas(sizes, 40, policy)
        assert sum(q.values()) == 40
        assert all(0 <= q[c] <= sizes[c] for c in sizes)
    # uniform splits evenly until capacity binds, then spills
    q = cluster_quotas(sizes, 40, "uniform")
    assert q[2] == 3 and q[3] == 1  # tiny clusters fully taken
    assert q[0] + q[1] == 36
    # proportional follows mass; temperature sits between the two
    qp = cluster_quotas(sizes, 40, "proportional")
    qt = cluster_quotas(sizes, 40, "temperature")
    assert qp[0] > qt[0] >= q[0] - 1
    # k beyond the corpus clamps to everything
    assert sum(cluster_quotas(sizes, 10_000, "uniform").values()) == sum(
        sizes.values()
    )


@pytest.mark.parametrize("policy", ["uniform", "proportional", "temperature"])
def test_selection_matches_python_oracle(spark, emb, cents, policy):
    rows = emb.collect()
    want, sizes, quota = _py_select(rows, cents, 37, policy)
    got = {
        (r["vec_id"], r["cluster"])
        for r in cluster_balanced_sample(
            emb, 37, policy=policy, centroids=cents
        ).collect()
    }
    assert got == want
    assert len(got) == 37


def test_salted_two_phase_identical(spark, emb, cents):
    base = cluster_balanced_sample(emb, 37, centroids=cents)
    salted = cluster_balanced_sample(emb, 37, centroids=cents, n_salts=7)
    assert sorted(r["vec_id"] for r in base.collect()) == sorted(
        r["vec_id"] for r in salted.collect()
    )


def test_rebalance_flattens_topic_skew(spark, emb, cents):
    """On a corpus where one cluster dominates, uniform quotas pull the
    selected mix toward flat while proportional preserves the skew."""
    # plant the skew: 150 deterministic near-copies of one vector all
    # land in that vector's cluster
    seed = emb.orderBy("vec_id").first()
    dups = []
    for i in range(150):
        v = list(seed["embedding"])
        v[i % len(v)] += 0.001 * (1 + i % 5)
        dups.append((100_000 + i, v))
    skewed = emb.unionByName(
        spark.createDataFrame(dups, "vec_id long, embedding array<float>")
    )
    sel_u = cluster_balanced_sample(skewed, 40, policy="uniform", centroids=cents)
    sel_p = cluster_balanced_sample(
        skewed, 40, policy="proportional", centroids=cents
    )
    share = lambda df: (
        lambda c: max(c.values()) / sum(c.values())
    )({r["cluster"]: r["n"] for r in df.groupBy("cluster").agg(F.count("*").alias("n")).collect()})
    assert share(sel_u) < share(sel_p)


def test_assignment_stage_has_no_shuffle(spark, emb, cents):
    from deidcm_spark.operators.balance import cluster_assign

    assigned, _ = cluster_assign(emb, centroids=cents)
    plan = assigned._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # codebook rides the closure
