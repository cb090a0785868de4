"""Corpus mixing (sampling.mix_corpora): exact row-set equality against a
pure-Python md5 re-derivation of the selection rule, plus determinism and
input validation."""

import hashlib

import pytest

from deidcm_spark.operators.sampling import mix_corpora


def u32(doc_id, name, salt):
    h = hashlib.md5(f"{doc_id}:{name}:{salt}".encode()).hexdigest()[:8]
    return int(h, 16) / 2**32


def oracle_mix(corpora, weights, salt="mix"):
    """-> set of (doc_id, source, epoch)."""
    out = set()
    for name, ids in corpora.items():
        w = weights[name]
        n_full = int(w)
        frac = w - n_full
        for doc_id in ids:
            for e in range(n_full):
                out.add((doc_id, name, e))
            if frac > 0 and u32(doc_id, name, salt) < frac:
                out.add((doc_id, name, n_full))
    return out


@pytest.fixture(scope="module")
def corpora(spark):
    def mk(n, off):
        return spark.range(off, off + n).selectExpr(
            "id as doc_id", "concat('doc ', id) as text"
        )

    return {"web": mk(400, 0), "books": mk(100, 1000), "code": mk(60, 5000)}


WEIGHTS = {"web": 0.5, "books": 2.25, "code": 1.0}


def test_mix_matches_oracle(spark, corpora):
    mixed = mix_corpora([(n, df, WEIGHTS[n]) for n, df in corpora.items()])
    got = {(r.doc_id, r.source, r.epoch) for r in mixed.collect()}
    ids = {n: [r.doc_id for r in df.collect()] for n, df in corpora.items()}
    want = oracle_mix(ids, WEIGHTS)
    assert got == want
    # structure: books docs appear in epochs {0, 1} fully, epoch 2 partially
    books_epochs = sorted({e for d, s, e in got if s == "books"})
    assert books_epochs == [0, 1, 2]
    n_books2 = sum(1 for d, s, e in got if s == "books" and e == 2)
    assert 0 < n_books2 < 100  # fractional quarter, not empty / not full
    # web keeps roughly half (hash-uniform)
    n_web = sum(1 for d, s, e in got if s == "web")
    assert 140 < n_web < 260
    # code weight 1.0 -> exactly one full epoch
    assert sum(1 for d, s, e in got if s == "code") == 60


def test_mix_deterministic_and_salt_independent(spark, corpora):
    srcs = [(n, df, WEIGHTS[n]) for n, df in corpora.items()]
    a = {(r.doc_id, r.source, r.epoch) for r in mix_corpora(srcs).collect()}
    b = {(r.doc_id, r.source, r.epoch) for r in mix_corpora(srcs).collect()}
    assert a == b
    c = {(r.doc_id, r.source, r.epoch) for r in mix_corpora(srcs, salt="other").collect()}
    # full epochs identical, fractional draws differ
    assert {t for t in a if t[2] < int(WEIGHTS[t[1]])} == {
        t for t in c if t[2] < int(WEIGHTS[t[1]])
    }
    assert a != c


def test_mix_validation(spark, corpora):
    with pytest.raises(ValueError, match="weight"):
        mix_corpora([("web", corpora["web"], 0.0)])
    with pytest.raises(ValueError, match="at least one"):
        mix_corpora([])
    with pytest.raises(ValueError, match="name"):
        mix_corpora([("we'b", corpora["web"], 1.0)])
    with pytest.raises(ValueError, match="salt"):
        mix_corpora([("web", corpora["web"], 1.0)], salt="x'y")
