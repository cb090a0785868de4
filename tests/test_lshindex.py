"""Incremental near-dup index (dedup.lsh_index_*): probe ≡ full-batch
candidate generation restricted to pairs touching the new shard, the
replay/idempotence contract, signature-agreement Jaccard estimates, and
the no-history×history guarantee."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from deidcm_spark.operators import dedup

BASE = "the quick brown fox jumps over the lazy dog and runs away fast again"


def _doc(i: int, text: str):
    return (i, text)


@pytest.fixture(scope="module")
def history(spark):
    rows = [
        _doc(1, BASE),
        _doc(2, BASE),  # exact dup INSIDE history (already adjudicated)
        _doc(3, "completely different content about spark dataframes and shuffles"),
        _doc(4, "le chat est sur la table et il regarde par la fenetre avec interet"),
        _doc(5, ""),  # empty: no signature
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def shard(spark):
    rows = [
        _doc(10, BASE),  # dup of history 1/2
        _doc(11, BASE.replace("runs", "walks")),  # near dup of history
        _doc(12, "brand new unique document text that matches nothing else at all"),
        _doc(13, "brand new unique document text that matches nothing else at all"),  # new x new dup
        _doc(14, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_probe_equals_full_batch_restricted_to_shard(spark, history, shard):
    idx = dedup.lsh_index_build(history)
    got = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.lsh_index_probe(idx, shard, threshold=0.0).collect()
    }
    full = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.lsh_candidate_pairs(history.unionByName(shard)).collect()
    }
    new_ids = {10, 11, 12, 13, 14}
    expect = {p for p in full if p[0] in new_ids or p[1] in new_ids}
    assert got == expect
    assert len(got) > 0
    # never history x history: the (1, 2) exact dup pair is full-batch
    # output but not probe output
    assert (1, 2) in full and (1, 2) not in got


def test_probe_estimates(spark, history, shard):
    idx = dedup.lsh_index_build(history)
    est = {
        (r["doc_a"], r["doc_b"]): r["est_jaccard"]
        for r in dedup.lsh_index_probe(idx, shard, threshold=0.0).collect()
    }
    # identical text -> identical signatures -> estimate 1.0
    assert est[(1, 10)] == 1.0
    assert est[(2, 10)] == 1.0
    assert est[(12, 13)] == 1.0
    # the near-dup estimate matches the python re-count of matching minhashes
    sigs = {r["doc_id"]: [r[f"mh{i}"] for i in range(dedup.N_MINHASH)]
            for r in idx.unionByName(dedup.lsh_index_build(shard)).collect()}
    for (a, b), e in est.items():
        matches = sum(1 for x, y in zip(sigs[a], sigs[b]) if x == y)
        assert e == pytest.approx(matches / dedup.N_MINHASH)
    # thresholding drops weak candidates
    kept = dedup.lsh_index_probe(idx, shard, threshold=0.9).collect()
    assert all(r["est_jaccard"] >= 0.9 for r in kept)
    assert {(r["doc_a"], r["doc_b"]) for r in kept} >= {(1, 10), (12, 13)}


def test_merge_replay_idempotent(spark, history, shard):
    idx = dedup.lsh_index_build(history)
    shard_sig = dedup.lsh_index_build(shard)
    once = dedup.lsh_index_merge(idx, shard_sig)
    twice = dedup.lsh_index_merge(once, shard_sig)
    assert once.count() == twice.count() == 8  # 4 history + 4 shard (empties drop)
    # probing an already-merged shard still finds its pairs (signatures
    # collapse, no double counting)
    got = dedup.lsh_index_probe(once, shard, threshold=0.0)
    assert got.filter("doc_a = 12 and doc_b = 13").count() == 1


def test_index_round_trips_through_parquet(spark, history, shard, tmp_path):
    """The index IS a table: persist, reload, probe — the 100 TB story."""
    p = str(tmp_path / "lsh_index")
    dedup.lsh_index_build(history).write.mode("overwrite").parquet(p)
    idx = spark.read.parquet(p)
    got = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.lsh_index_probe(idx, shard, threshold=0.9).collect()
    }
    assert (1, 10) in got and (12, 13) in got
