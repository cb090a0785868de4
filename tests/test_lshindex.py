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


# ---------- streaming LSH-gated ingest ----------

NEW1 = "brand new unique document text that matches nothing else at all"
NEW2 = "some other entirely separate piece of writing about distributed engines"


def _docs(spark, rows):
    return spark.createDataFrame(
        [(d, t, "", "") for d, t in rows],
        "doc_id long, text string, lang string, source string",
    )


def test_stream_neardup_ingest_two_drops(spark, tmp_path):
    from deidcm_spark.streaming import read_lsh_log, stream_neardup_ingest

    in_dir = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    idx = str(tmp_path / "index")
    # drop 1: two docs + a within-batch exact near-dup (same text, higher id)
    _docs(spark, [(1, BASE), (2, NEW2), (9, BASE)]) \
        .coalesce(1).write.mode("append").parquet(in_dir)
    q = stream_neardup_ingest(spark, in_dir, out, ckpt, idx, threshold=0.9)
    q.awaitTermination(120)
    got = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert got == {1, 2}  # within-batch dup collapsed to the min doc_id
    # drop 2: a re-crawl of doc 1's text (drops against HISTORY even though
    # its id is smaller than nothing in-batch) plus one genuinely new doc
    _docs(spark, [(20, BASE), (3, NEW1)]) \
        .coalesce(1).write.mode("append").parquet(in_dir)
    q = stream_neardup_ingest(spark, in_dir, out, ckpt, idx, threshold=0.9)
    q.awaitTermination(120)
    got = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert got == {1, 2, 3}
    # the compacted log equals a batch-built index over the KEPT corpus
    log = {tuple(r) for r in read_lsh_log(spark, idx).collect()}
    kept = _docs(spark, [(1, BASE), (2, NEW2), (3, NEW1)])
    batch_idx = {tuple(r) for r in dedup.lsh_index_build(kept, "fast").collect()}
    assert log == batch_idx


def test_neardup_ingest_replay_emits_same_fresh_docs(spark, tmp_path):
    """Replay contract: the same batch_id twice (second run = replay after
    the first wrote its signature partial) emits the same fresh rows."""
    from deidcm_spark.streaming import _neardup_ingest_batch

    out = str(tmp_path / "out")
    idx = str(tmp_path / "index")
    batch = _docs(spark, [(1, BASE), (2, NEW2)])
    for attempt in range(2):
        _neardup_ingest_batch(batch, 0, out, idx, 0.9, 100, "fast")
        got = {r.doc_id for r in spark.read.parquet(out).collect()}
        assert got == {1, 2}, f"attempt {attempt}"
    # a LATER batch is gated by batch 0's signatures
    _neardup_ingest_batch(_docs(spark, [(7, NEW2), (8, NEW1)]), 1, out, idx,
                          0.9, 100, "fast")
    got = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert got == {1, 2, 8}


def test_bootstrap_lsh_log(spark, tmp_path):
    from deidcm_spark.streaming import _neardup_ingest_batch, bootstrap_lsh_log

    out = str(tmp_path / "out")
    idx = str(tmp_path / "index")
    history = _docs(spark, [(100, BASE), (101, NEW2)])
    bootstrap_lsh_log(dedup.lsh_index_build(history, "fast"), idx)
    _neardup_ingest_batch(_docs(spark, [(1, BASE), (2, NEW1)]), 0, out, idx,
                          0.9, 100, "fast")
    got = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert got == {2}  # doc 1 near-dups the bootstrapped history
