"""Quality classifier (hashed-n-gram Naive Bayes + Pareto gate) vs a
pure-Python re-derivation — train weights, per-doc scores, and the keep
set are each checked independently (operators/classify.py)."""

import hashlib
import math
import re
from collections import Counter

import pytest

from pyspark.sql import functions as F

from deidcm_spark.operators.classify import (
    nb_score,
    nb_train,
    pareto_select,
    quality_classifier_select,
)

N_BUCKETS = 64  # tiny so collisions actually happen in the test corpus


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _grams(text: str) -> list[str]:
    toks = [t for t in re.split(r"\s+", text.lower()) if t]
    return [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _py_model(pos_rows, neg_rows, n_buckets=N_BUCKETS):
    def counts(rows):
        c = Counter()
        for _, text in rows:
            for g in _grams(text):
                c[_h32(g) % n_buckets] += 1
        return c

    cp, cn = counts(pos_rows), counts(neg_rows)
    tp, tn = sum(cp.values()), sum(cn.values())
    w = {
        b: round(
            math.log((cp.get(b, 0) + 1) / (tp + n_buckets))
            - math.log((cn.get(b, 0) + 1) / (tn + n_buckets)),
            9,
        )
        for b in set(cp) | set(cn)
    }
    meta = {
        "bias": round(math.log(len(pos_rows)) - math.log(len(neg_rows)), 9),
        "w_unseen": round(
            math.log(1.0 / (tp + n_buckets)) - math.log(1.0 / (tn + n_buckets)), 9
        ),
    }
    return w, meta


def _py_scores(doc_rows, w, meta, n_buckets=N_BUCKETS, normalize=False):
    out = {}
    for doc_id, text in doc_rows:
        grams = _grams(text)
        wsum = sum(w.get(_h32(g) % n_buckets, meta["w_unseen"]) for g in grams)
        if normalize:
            logit = meta["bias"] + (wsum / len(grams) if grams else 0.0)
        else:
            logit = meta["bias"] + wsum
        logit = round(logit, 6)
        out[doc_id] = (len(grams), logit, round(1.0 / (1.0 + math.exp(-logit)), 6))
    return out


def _py_draw(doc_id, alpha=9.0, salt="pareto"):
    u = (_h32(f"{doc_id}:{salt}") + 0.5) / 4294967296.0
    return round((1.0 - u) ** (-1.0 / alpha) - 1.0, 6)


POS = [
    (1, "the curated encyclopedia article explains the topic clearly"),
    (2, "a well written reference text covers the subject in depth"),
    (3, "the reference article cites sources and explains the topic"),
    (4, "the encyclopedia text explains the subject clearly and cites sources"),
]
NEG = [
    (11, "click here buy now free free free win win prize"),
    (12, "zzz qqq click buy now cheap cheap deal deal deal"),
    (13, "buy cheap prize click here now zzz win deal free"),
    (14, "free prize deal click now buy cheap win qqq zzz"),
]
DOCS = [
    (21, "the reference article explains the topic clearly and cites sources"),
    (22, "click here now to win a free prize deal"),
    (23, "completely novel vocabulary nowhere in either training corpus"),
    (24, ""),            # gram-less: scores the prior alone
    (25, "one"),         # single token → zero 2-grams
    (26, "the topic buy now"),  # mixed evidence
    # doc_id chosen so the hash-derived Pareto draw exceeds 1.0
    # (draw=1.2897): the gate keeps it at ANY prob — the deliberate
    # low-score trickle the heavy tail exists to admit.
    (423, "win free prize deal click now buy cheap zzz qqq"),
]


@pytest.fixture(scope="module")
def frames(spark):
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    return mk(POS), mk(NEG), mk(DOCS)


def test_weights_and_meta_match_python_oracle(spark, frames):
    pos, neg, _ = frames
    weights, meta = nb_train(pos, neg, n_buckets=N_BUCKETS)
    got = {r["bucket"]: r["w"] for r in weights.collect()}
    w, pymeta = _py_model(POS, NEG)
    assert got == w
    assert meta["bias"] == pymeta["bias"]
    assert meta["w_unseen"] == pymeta["w_unseen"]
    assert weights.count() <= N_BUCKETS  # model is bounded at any corpus size


@pytest.mark.parametrize("normalize", [False, True])
def test_scores_match_python_oracle(spark, frames, normalize):
    pos, neg, docs = frames
    weights, meta = nb_train(pos, neg, n_buckets=N_BUCKETS)
    got = {
        r["doc_id"]: (r["n_grams"], r["logit"], r["prob"])
        for r in nb_score(docs, weights, meta, normalize=normalize).collect()
    }
    w, pymeta = _py_model(POS, NEG)
    assert got == _py_scores(DOCS, w, pymeta, normalize=normalize)
    assert got[24][0] == 0 and got[25][0] == 0  # gram-less docs kept, prior-only


def test_pareto_gate_matches_oracle(spark, frames):
    pos, neg, docs = frames
    kept = quality_classifier_select(docs, pos, neg, n_buckets=N_BUCKETS)
    got = {r["doc_id"]: r["pareto_draw"] for r in kept.collect()}
    w, pymeta = _py_model(POS, NEG)
    scores = _py_scores(DOCS, w, pymeta)
    expect = {
        d: _py_draw(d)
        for d, (_, _, prob) in scores.items()
        if prob > 1.0 - _py_draw(d)
    }
    assert got == expect
    assert 21 in got       # the high-prob reference-like doc passes
    assert 423 in got      # spam text kept ONLY by the heavy-tail draw (>1)
    assert 22 not in got   # ordinary spam is dropped


def test_classifier_separates_pos_from_neg_like_text(spark, frames):
    pos, neg, docs = frames
    weights, meta = nb_train(pos, neg, n_buckets=N_BUCKETS)
    probs = {
        r["doc_id"]: r["prob"] for r in nb_score(docs, weights, meta).collect()
    }
    assert probs[21] > 0.95           # reference-like
    assert probs[22] < 0.1            # spam-like
    assert probs[21] > probs[26] > probs[22]  # mixed evidence in between


def test_pareto_gate_adds_no_shuffle_and_score_broadcasts_model(spark, frames):
    pos, neg, docs = frames
    weights, meta = nb_train(pos, neg, n_buckets=N_BUCKETS)
    scored = nb_score(docs, weights, meta)
    gated = pareto_select(scored)
    p_scored = scored._jdf.queryExecution().executedPlan().toString()
    p_gated = gated._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in p_scored  # model rides as the tiny side
    assert p_gated.count("Exchange") == p_scored.count("Exchange")


def test_fast_hash_path_runs_and_separates(spark, frames):
    pos, neg, docs = frames
    # xxhash64 bucketing partitions the feature space differently (not
    # oracle-portable by design), so check CONTRACT properties, not the
    # exact md5-path keep set: every kept row satisfies the gate
    # inequality, and doc 423 (draw > 1) survives under any hashing.
    kept = quality_classifier_select(
        docs, pos, neg, n_buckets=N_BUCKETS, hash_impl="fast"
    )
    rows = {r["doc_id"]: (r["prob"], r["pareto_draw"]) for r in kept.collect()}
    assert 423 in rows
    assert all(p > 1.0 - d for p, d in rows.values())
    probs = {
        r["doc_id"]: r["prob"]
        for r in nb_score(
            docs, *nb_train(pos, neg, n_buckets=N_BUCKETS, hash_impl="fast")
        ).collect()
    }
    assert probs[21] > probs[22]  # separation holds under xxhash64 too


def test_model_save_load_roundtrip(spark, frames, tmp_path):
    from deidcm_spark.operators.classify import load_model, save_model

    pos, neg, docs = frames
    weights, meta = nb_train(pos, neg, n_buckets=N_BUCKETS)
    save_model(weights, meta, str(tmp_path / "model"))
    w2, m2 = load_model(spark, str(tmp_path / "model"))
    assert m2 == meta
    a = {r["doc_id"]: r for r in nb_score(docs, weights, meta).collect()}
    b = {r["doc_id"]: r for r in nb_score(docs, w2, m2).collect()}
    assert a == b


def test_stream_quality_ingest_two_drops_and_replay(spark, tmp_path, frames):
    """The streaming gate over two drops equals the batch gate over the
    union (stateless model ⇒ per-doc decisions are drop-invariant), and
    a checkpoint-wiped replay rewrites the same partitions (idempotent
    sink) without duplicating rows."""
    from deidcm_spark.operators.classify import save_model
    from deidcm_spark.streaming import stream_quality_ingest

    pos, neg, docs = frames
    weights, meta = nb_train(pos, neg, n_buckets=N_BUCKETS)
    model = str(tmp_path / "model")
    save_model(weights, meta, model)

    in_dir = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    full = spark.createDataFrame(
        [(d, t, "en", "s") for d, t in DOCS],
        "doc_id long, text string, lang string, source string",
    )
    drop1 = full.filter("doc_id < 25")
    drop2 = full.filter("doc_id >= 25")
    drop1.coalesce(1).write.mode("append").parquet(in_dir)
    q = stream_quality_ingest(spark, in_dir, out, ckpt, model)
    q.awaitTermination(120)
    drop2.coalesce(1).write.mode("append").parquet(in_dir)
    q = stream_quality_ingest(spark, in_dir, out, ckpt, model)
    q.awaitTermination(120)

    got = {r["doc_id"]: r["prob"] for r in spark.read.parquet(out).collect()}
    want = {
        r["doc_id"]: r["prob"]
        for r in pareto_select(nb_score(full, weights, meta)).collect()
    }
    assert got == want
    assert 423 in got and 21 in got  # both keep classes flow through

    # restart contract: same checkpoint, no new input → a no-op (the
    # commit log already covers every file); output unchanged
    q = stream_quality_ingest(spark, in_dir, out, ckpt, model)
    q.awaitTermination(120)
    rows = spark.read.parquet(out).collect()
    assert len(rows) == len(want)
    assert {r["doc_id"] for r in rows} == set(want)

    # and a clean fresh run (new checkpoint AND sink) over the same
    # input reproduces the batch result exactly — the gate is stateless
    out2 = str(tmp_path / "out2")
    q = stream_quality_ingest(spark, in_dir, out2, str(tmp_path / "ck2"), model)
    q.awaitTermination(120)
    got2 = {r["doc_id"]: r["prob"] for r in spark.read.parquet(out2).collect()}
    assert got2 == want


def test_nb_train_leaves_no_cache_residue(spark, frames):
    """The count tables are localized (bounded collect), not persisted —
    the old persist-and-never-unpersist leaked two cached block sets per
    training call (the heavy_hitters r4 defect class)."""
    import gc

    pos, neg, _ = frames
    spark.catalog.clearCache()
    gc.collect()
    before = len(spark.sparkContext._jsc.sc().getRDDStorageInfo())
    weights, _meta = nb_train(pos, neg, n_buckets=N_BUCKETS)
    weights.collect()
    after = len(spark.sparkContext._jsc.sc().getRDDStorageInfo())
    assert after == before
