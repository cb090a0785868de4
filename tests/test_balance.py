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


# ---------------------------------------------------------------------------
# similarity-ordered packing keys (in-context pretraining layout)
# ---------------------------------------------------------------------------

def test_similarity_pack_keys_match_python_order(spark, emb, cents):
    """The keyed prefix sum equals a pure-Python re-derivation of the
    cluster-major order (numpy assignment + md5-44bit within cluster)."""
    from deidcm_spark.operators.balance import similarity_pack_keys
    from deidcm_spark.operators.textops import _prefix_tokens

    rows = emb.collect()
    docs = spark.createDataFrame(
        [(r["vec_id"], "w " * (r["vec_id"] % 7 + 1)) for r in rows],
        "doc_id long, text string",
    )
    keys = similarity_pack_keys(emb, centroids=cents)
    got = {
        r["doc_id"]: r["_before"]
        for r in _prefix_tokens(docs, None, None, 1000, "keyed", keys=keys).collect()
    }

    C = np.asarray(cents, dtype=np.float64)
    C = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    M = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
    cl = np.argmax(M @ C.T, axis=1)
    key = {
        r["vec_id"]: (int(cl[i]) << 44)
        + int(hashlib.md5(f"{r['vec_id']}:packkey".encode()).hexdigest()[:11], 16)
        for i, r in enumerate(rows)
    }
    order = sorted(key, key=lambda d: (key[d], d))
    want, acc = {}, 0
    for d in order:
        want[d] = acc
        acc += d % 7 + 1
    assert got == want


def test_similarity_packing_groups_topics(spark):
    """Under the keyed order, documents sharing a training sequence are
    overwhelmingly same-cluster; under the hash shuffle they are not."""
    from deidcm_spark.operators.balance import similarity_pack_keys
    from deidcm_spark.operators.textops import pack_sequences

    # two orthogonal topic blobs, 30 vectors each
    vecs = []
    for i in range(60):
        v = [0.0] * 8
        v[0 if i < 30 else 4] = 1.0
        v[(i % 3) + (1 if i < 30 else 5)] = 0.3
        vecs.append((i, v))
    emb2 = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    docs = spark.createDataFrame(
        [(i, "tok " * 50) for i in range(60)], "doc_id long, text string"
    )
    keys = similarity_pack_keys(emb2, n_centroids=2, lloyd_iters=2)
    kk = {r["doc_id"]: r["_key"] >> 44 for r in keys.collect()}
    assert len(set(kk.values())) == 2

    def same_cluster_share(packed):
        by_seq = {}
        for r in packed.collect():
            by_seq.setdefault(r["seq_id"], []).append(r["doc_id"])
        same = tot = 0
        for ds in by_seq.values():
            for i in range(len(ds)):
                for j in range(i + 1, len(ds)):
                    tot += 1
                    same += kk[ds[i]] == kk[ds[j]]
        return same / max(tot, 1)

    keyed = pack_sequences(docs, seq_len=200, order="keyed", keys=keys)
    shuffled = pack_sequences(docs, seq_len=200, order="shuffle", seed=3)
    assert same_cluster_share(keyed) > 0.9
    assert same_cluster_share(shuffled) < 0.8
    # invariants hold under the keyed order too: every non-final
    # sequence exactly full
    from pyspark.sql import functions as SQLF

    sums = {
        r["seq_id"]: r["s"]
        for r in keyed.groupBy("seq_id").agg(SQLF.sum("piece_tokens").alias("s")).collect()
    }
    last = max(sums)
    assert all(v == 200 for k, v in sums.items() if k != last)


def test_similarity_pack_keys_blocks_bounded_and_monotone(spark, emb, cents):
    from deidcm_spark.operators.balance import similarity_pack_keys

    keys = similarity_pack_keys(emb, centroids=cents, max_blocks=64).collect()
    assert len({r["_blk"] for r in keys}) <= 64
    srt = sorted(keys, key=lambda r: (r["_key"], r["doc_id"]))
    blks = [r["_blk"] for r in srt]
    assert blks == sorted(blks)  # _blk nondecreasing in _key
