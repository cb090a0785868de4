"""Distributed BPE training/encoding vs an independent pure-Python BPE.

The oracle is a from-scratch Sennrich-style trainer + a PRIORITY-QUEUE
encoder (repeatedly merge the lowest-rank pair present) — a different
algorithm from the operator's replay-in-order encoder, so agreement also
validates the replay≡priority equivalence the module relies on."""

import re

import pytest
from pyspark.sql import functions as F

from deidcm_spark.operators.bpe import (
    bpe_encode_words,
    bpe_token_count,
    train_bpe,
    word_freqs,
)

SF = "/root/testdata/sf0.001/documents.parquet"
N_MERGES = 25


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(SF).filter("doc_id % 5 = 0").select(
        "doc_id", "text"
    )


@pytest.fixture(scope="module")
def merges(spark, docs):
    return train_bpe(docs, n_merges=N_MERGES)


def _py_word_freqs(rows):
    wf = {}
    for r in rows:
        for w in re.split(r"\s+", (r["text"] or "").lower()):
            if w:
                wf[w] = wf.get(w, 0) + 1
    return wf


def _py_train(wf, n_merges, min_freq=2):
    words = {w: list(w) + ["</w>"] for w in wf}
    merges = []
    for _ in range(n_merges):
        pairs = {}
        for w, syms in words.items():
            f = wf[w]
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (a, b), n = best
        if n < min_freq:
            break
        merges.append((a, b))
        for w, syms in words.items():
            i, out = 0, []
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges


def _py_encode_priority(word, merges):
    """Priority-queue apply (Sennrich's apply_bpe shape): repeatedly merge
    the LOWEST-RANK pair present — intentionally NOT the operator's
    replay-in-order loop."""
    rank = {p: i for i, p in enumerate(merges)}
    syms = list(word) + ["</w>"]
    while True:
        cand = [(rank[p], i) for i, p in enumerate(zip(syms, syms[1:]))
                if p in rank]
        if not cand:
            return syms
        r, _ = min(cand)
        a, b = merges[r]
        i, out = 0, []
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out


def test_training_matches_python_oracle(spark, docs, merges):
    wf_got = {r["word"]: r["freq"] for r in word_freqs(docs).collect()}
    wf_want = _py_word_freqs(docs.collect())
    assert wf_got == wf_want

    want = _py_train(wf_want, N_MERGES)
    assert merges == want
    assert len(merges) == N_MERGES  # corpus is rich enough to fill them


def test_encoding_matches_priority_oracle_and_reconstructs(spark, docs, merges):
    enc = bpe_encode_words(docs, merges).collect()
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert len(enc) == len(texts)
    for r in enc[:40]:
        words = [w for w in (texts[r["doc_id"]] or "").lower().split() if w]
        want = [s for w in words for s in _py_encode_priority(w, merges)]
        assert r["subwords"] == want
        # lossless: concatenation reconstructs the words
        assert "".join(r["subwords"]) == "".join(w + "</w>" for w in words)


def test_token_count_consistent_and_compressive(spark, docs, merges):
    counts = {r["doc_id"]: r for r in bpe_token_count(docs, merges).collect()}
    enc = {r["doc_id"]: r["subwords"]
           for r in bpe_encode_words(docs, merges).collect()}
    chars = {r["doc_id"]: r["text"] for r in docs.collect()}
    for d, row in counts.items():
        assert row["n_bpe_tokens"] == len(enc[d])
        words = [w for w in (chars[d] or "").lower().split() if w]
        assert row["n_words"] == len(words)
        # merges only ever shrink the symbol stream
        assert row["n_bpe_tokens"] <= sum(len(w) + 1 for w in words)
    # and they DID shrink somewhere (25 merges on a real corpus must bite)
    assert any(
        counts[d]["n_bpe_tokens"]
        < sum(len(w) + 1 for w in (chars[d] or "").lower().split() if w)
        for d in counts
    )


def test_training_is_deterministic_and_repartition_stable(spark, docs):
    a = train_bpe(docs, n_merges=10)
    b = train_bpe(docs.repartition(7), n_merges=10)
    assert a == b and len(a) == 10


def test_min_freq_early_stop(spark):
    tiny = spark.createDataFrame(
        [(1, "ab ab cd")], "doc_id long, text string"
    )
    merges = train_bpe(tiny, n_merges=50, min_freq=2)
    # only pairs inside 'ab' (freq 2) qualify; 'cd' pairs have freq 1
    assert 1 <= len(merges) <= 3
    for a, b in merges:
        assert "c" not in a + b and "d" not in a + b


def test_bpe_counts_compose_with_pack_shards(spark, docs, merges):
    """The training-data path end to end: tokenizer counts feed the
    token-aware shard packer — shard capacity holds under the REAL
    subword counts, not the chars/4 estimate."""
    from deidcm_spark.operators.textops import pack_shards

    counts = bpe_token_count(docs, merges).withColumnRenamed(
        "n_bpe_tokens", "n_tokens"
    )
    packed = pack_shards(counts.select("doc_id", "n_tokens"),
                         capacity_tokens=2048, token_col="n_tokens")
    rows = packed.collect()
    assert len(rows) == counts.count()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard_id"], 0)
        by_shard[r["shard_id"]] += r["n_tokens"]
    # every shard except possibly the last is filled to capacity +1 doc
    full = [s for s in sorted(by_shard) if s != max(by_shard)]
    assert all(by_shard[s] >= 2048 - 512 for s in full)
    assert len(by_shard) >= 3


def test_nbsp_word_tokenizes_like_training(spark):
    """A \\xa0-bearing word is ONE token under the Spark training spec
    (Java \\s+ is ASCII-only) — the Python-side encoder must agree, or
    trained merges and encode-time words diverge."""
    doc = spark.createDataFrame(
        [(1, "foo\xa0bar foo\xa0bar baz")], "doc_id long, text string"
    )
    wf = {r["word"]: r["freq"] for r in word_freqs(doc).collect()}
    assert wf == {"foo\xa0bar": 2, "baz": 1}
    merges = train_bpe(doc, n_merges=3, min_freq=2)
    got = bpe_token_count(doc, merges).first()
    assert got["n_words"] == 3  # NOT 5 — the UDF uses the ASCII \s spec


def test_train_bpe_releases_all_checkpoints(spark, docs):
    """train_bpe returns only a driver-side merge list; every
    localCheckpoint it makes (including the LAST one, and the initial one
    when no checkpoint boundary is crossed) must be released."""
    import gc

    spark.catalog.clearCache()
    gc.collect()
    before = len(spark.sparkContext._jsc.sc().getRDDStorageInfo())
    train_bpe(docs, n_merges=5, checkpoint_every=2)   # crosses boundaries
    train_bpe(docs, n_merges=2, checkpoint_every=10)  # never crosses one
    after = len(spark.sparkContext._jsc.sc().getRDDStorageInfo())
    assert after == before
