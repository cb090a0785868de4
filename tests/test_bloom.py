"""Bloom-filter incremental dedup: the word table and every probe verdict
are checked bit-for-bit against a pure-Python hashlib re-derivation of the
shared spec (portable impl), plus semantic guarantees: zero false
NEGATIVES ever, false positives bounded, merge ≡ build-over-union."""

import hashlib
import re

import pytest

from deidcm_spark.operators.bloom import (
    bloom_build,
    bloom_merge,
    bloom_new_documents,
    bloom_probe,
)

N_BITS = 1 << 16
K = 4


# ---------- pure-Python oracle ----------

def norm_fp(text: str) -> str:
    return hashlib.md5(
        re.sub(r"\s+", " ", text.lower()).strip().encode("utf-8")
    ).hexdigest()


def positions(fp: str, n_bits: int = N_BITS, k: int = K) -> list[int]:
    return [
        int(hashlib.md5(f"{fp}:{j}".encode()).hexdigest()[:15], 16) % n_bits
        for j in range(k)
    ]


def oracle_words(texts: list[str], n_bits: int = N_BITS, k: int = K) -> dict[int, int]:
    words: dict[int, int] = {}
    for t in texts:
        for p in positions(norm_fp(t), n_bits, k):
            w, b = divmod(p, 64)
            words[w] = words.get(w, 0) | (1 << b)
    return words


def oracle_probe(text: str, words: dict[int, int]) -> bool:
    return all(
        words.get(p // 64, 0) >> (p % 64) & 1 for p in positions(norm_fp(text))
    )


def _signed64(x: int) -> int:
    return x - (1 << 64) if x >= 1 << 63 else x


# ---------- fixtures ----------

@pytest.fixture(scope="module")
def history(spark):
    rows = [(d, f"historical document number {d} body text") for d in range(300)]
    return spark.createDataFrame(rows, "doc_id int, text string")


@pytest.fixture(scope="module")
def shard(spark):
    """New shard: 50 genuinely new docs + 50 exact re-crawls of history
    (one with different whitespace/case — NORM_FP must still match)."""
    rows = [(1000 + d, f"fresh shard doc {d} content") for d in range(50)]
    rows += [(2000 + d, f"historical document number {d} body text") for d in range(49)]
    rows.append((2099, "  Historical DOCUMENT   number 7 body\ttext "))
    return spark.createDataFrame(rows, "doc_id int, text string")


# ---------- tests ----------

def test_word_table_matches_oracle(spark, history):
    texts = [r.text for r in history.collect()]
    expected = {w: _signed64(b) for w, b in oracle_words(texts).items()}
    got = {r.word_idx: r.bits for r in bloom_build(history, N_BITS, K).collect()}
    assert got == expected


def test_probe_verdicts_match_oracle_and_no_false_negatives(spark, history, shard):
    words = oracle_words([r.text for r in history.collect()])
    bloom = bloom_build(history, N_BITS, K)
    got = {
        r.doc_id: r.maybe_seen
        for r in bloom_probe(shard, bloom, N_BITS, K).collect()
    }
    shard_rows = {r.doc_id: r.text for r in shard.collect()}
    assert got == {d: oracle_probe(t, words) for d, t in shard_rows.items()}
    # every re-crawled doc (2000-2099) MUST be flagged — Bloom filters
    # cannot false-negative; whitespace/case variants normalize to the
    # same fingerprint
    assert all(got[d] for d in shard_rows if d >= 2000)


def test_new_documents_conservative(spark, history, shard):
    bloom = bloom_build(history, N_BITS, K)
    fresh = {r.doc_id for r in bloom_new_documents(shard, bloom, N_BITS, K).collect()}
    assert all(d < 2000 for d in fresh)          # never admits a duplicate
    assert len(fresh) >= 45                       # FP rate small at 16 bits/doc


def test_merge_equals_build_over_union(spark, history, shard):
    a = bloom_build(history, N_BITS, K)
    b = bloom_build(shard, N_BITS, K)
    merged = {r.word_idx: r.bits for r in bloom_merge(a, b).collect()}
    union = {
        r.word_idx: r.bits
        for r in bloom_build(history.unionByName(shard), N_BITS, K).collect()
    }
    assert merged == union


def test_fast_impl_same_contract(spark, history, shard):
    """xxhash64 positions: different bits, same guarantees (no false
    negatives on re-crawls, word table within n_bits/64)."""
    bloom = bloom_build(history, N_BITS, K, hash_impl="fast")
    got = {
        r.doc_id: r.maybe_seen
        for r in bloom_probe(shard, bloom, N_BITS, K, hash_impl="fast").collect()
    }
    assert all(got[d] for d in got if d >= 2000)
    assert bloom.count() <= N_BITS // 64


def test_shuffle_join_probe_same_verdicts(spark, history, shard):
    bloom = bloom_build(history, N_BITS, K)
    a = bloom_probe(shard, bloom, N_BITS, K, broadcast_filter=True).collect()
    b = bloom_probe(shard, bloom, N_BITS, K, broadcast_filter=False).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_build_plan_single_aggregation(spark, history):
    df = bloom_build(history, N_BITS, K)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan and "CartesianProduct" not in plan
    # one shuffle: the bit_or aggregation (partials combine map-side)
    assert plan.count("Exchange") - plan.count("ReusedExchange") <= 2
