"""Product-quantization lane (operators/pq.py) vs an independent numpy
oracle.

The oracle re-implements seeding, encoding, ADC tables, and search as
per-row Python/numpy loops (different code shape, identical float64
operation order), so codes and scores must match BIT FOR BIT for fixed
codebooks; trained codebooks with lloyd_iters=0 are seed-exact, and a
Lloyd pass is checked by its contract (distortion non-increasing,
two-run determinism) like ivf_centroids."""

from __future__ import annotations

import hashlib
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pytest

from pyspark.sql import functions as F

from deidcm_spark.operators import pq


def _spark_round(x: float, nd: int = 6) -> float:
    # Spark round() on doubles is BigDecimal HALF_UP; Python round is
    # HALF_EVEN — replicate Spark's exactly.
    q = Decimal(1).scaleb(-nd)
    return float(Decimal(repr(float(x))).quantize(q, rounding=ROUND_HALF_UP))


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    return df.cache()


@pytest.fixture(scope="module")
def rows(emb):
    data = emb.select("vec_id", "embedding").collect()
    return {int(r["vec_id"]): np.asarray(r["embedding"], dtype=np.float64) for r in data}


def oracle_seeds(rows: dict[int, np.ndarray], ksub: int) -> list[np.ndarray]:
    order = sorted(rows, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    return [rows[i] for i in order[:ksub]]


def oracle_books(rows, m, ksub):
    seeds = oracle_seeds(rows, ksub)
    dsub = seeds[0].shape[0] // m
    return [
        [list(v[s * dsub:(s + 1) * dsub]) for v in seeds]
        for s in range(m)
    ]


def oracle_encode_row(x: np.ndarray, books) -> list[int]:
    codes = []
    for sub in books:
        C = np.asarray(sub, dtype=np.float64)
        dsub = C.shape[1]
        xs = x[len(codes) * dsub:(len(codes) + 1) * dsub]
        d = ((xs[None, :] - C) ** 2).sum(axis=1)
        codes.append(int(np.argmin(d)))
    return codes


def oracle_lut(q: np.ndarray, books):
    lut = []
    for s, sub in enumerate(books):
        C = np.asarray(sub, dtype=np.float64)
        dsub = C.shape[1]
        qs = q[s * dsub:(s + 1) * dsub]
        lut.append([float(((qs - c) ** 2).sum()) for c in C])
    return lut


def oracle_adc_search(rows, books, q, k):
    lut = oracle_lut(q, books)
    scored = []
    for vid in rows:
        codes = oracle_encode_row(rows[vid], books)
        s = 0.0
        for i, c in enumerate(codes):
            s += lut[i][c]
        scored.append((vid, _spark_round(s)))
    scored.sort(key=lambda t: (t[1], t[0]))
    return scored[:k]


def oracle_l2_topk(rows, q, k):
    scored = []
    for vid, x in rows.items():
        d = 0.0
        for a, b in zip(x, q):
            d += (float(a) - float(b)) * (float(a) - float(b))
        scored.append((vid, _spark_round(d)))
    scored.sort(key=lambda t: (t[1], t[0]))
    return scored[:k]


FIXED_M, FIXED_K = 4, 16


@pytest.fixture(scope="module")
def fixed_books(rows):
    return oracle_books(rows, FIXED_M, FIXED_K)


def test_train_seed_codebooks_bit_exact(emb, rows):
    books = pq.pq_train(emb, m=FIXED_M, ksub=FIXED_K, lloyd_iters=0)
    assert books == oracle_books(rows, FIXED_M, FIXED_K)


def test_train_lloyd_reduces_distortion_and_is_deterministic(emb, rows):
    b0 = pq.pq_train(emb, m=FIXED_M, ksub=FIXED_K, lloyd_iters=0)
    b1 = pq.pq_train(emb, m=FIXED_M, ksub=FIXED_K, lloyd_iters=1)
    b1_again = pq.pq_train(emb, m=FIXED_M, ksub=FIXED_K, lloyd_iters=1)
    assert b1 == b1_again  # retry-stable

    def distortion(books):
        total = 0.0
        B = [np.asarray(s, dtype=np.float64) for s in books]
        dsub = B[0].shape[1]
        for x in rows.values():
            for s, C in enumerate(B):
                xs = x[s * dsub:(s + 1) * dsub]
                total += float(((xs[None, :] - C) ** 2).sum(axis=1).min())
        return total

    assert distortion(b1) <= distortion(b0)


def test_encode_bit_exact(emb, rows, fixed_books):
    got = {
        int(r["vec_id"]): list(r["codes"])
        for r in pq.pq_encode(emb, fixed_books).collect()
    }
    assert set(got) == set(rows)
    for vid in rows:
        assert got[vid] == oracle_encode_row(rows[vid], fixed_books), vid


def test_adc_table_matches_oracle(rows, fixed_books):
    q = rows[7]
    assert pq.adc_table(list(q), fixed_books) == oracle_lut(q, fixed_books)


def test_search_matches_oracle_exactly(emb, rows, fixed_books):
    q = rows[7]
    codes = pq.pq_encode(emb, fixed_books)
    got = [
        (int(r["vec_id"]), float(r["adc_dist"]))
        for r in pq.pq_search(codes, fixed_books, list(q), k=15).collect()
    ]
    assert got == oracle_adc_search(rows, fixed_books, q, 15)


def test_rerank_returns_exact_l2_within_shortlist(emb, rows, fixed_books):
    q = rows[3]
    codes = pq.pq_encode(emb, fixed_books)
    got = [
        (int(r["vec_id"]), float(r["l2_dist"]))
        for r in pq.pq_search(
            codes, fixed_books, list(q), k=10, rerank=60, emb=emb
        ).collect()
    ]
    shortlist = {vid for vid, _ in oracle_adc_search(rows, fixed_books, q, 60)}
    expect = oracle_l2_topk({v: rows[v] for v in shortlist}, q, 10)
    assert got == expect


def test_l2_brute_force_matches_oracle(emb, rows):
    q = rows[11]
    got = [
        (int(r["vec_id"]), float(r["l2_dist"]))
        for r in pq.l2_brute_force(emb, list(q), k=12).collect()
    ]
    assert got == oracle_l2_topk(rows, q, 12)


def test_recall_with_rerank(emb, rows):
    """PQ + rerank recovers the exact neighbors on the clustered corpus:
    recall@10 vs brute-force L2 across several query vectors.  Geometry
    m=16, ksub=32 (4-dim subspaces) measures 0.975 at rerank=80 on this
    corpus; asserted at 0.9 for headroom.  (The coarse m=4, ksub=16
    fixture used by the bit-exact lanes measures ~0.4 — kept there
    because exactness, not recall, is what those lanes pin.)"""
    books = pq.pq_train(emb, m=16, ksub=32, lloyd_iters=1)
    codes = pq.pq_encode(emb, books).cache()
    hits = total = 0
    for qid in (0, 7, 123, 400):
        q = list(rows[qid])
        truth = {r["vec_id"] for r in pq.l2_brute_force(emb, q, k=10).collect()}
        got = {
            r["vec_id"]
            for r in pq.pq_search(codes, books, q, k=10, rerank=80, emb=emb).collect()
        }
        hits += len(truth & got)
        total += len(truth)
    codes.unpersist()
    assert hits / total >= 0.9, hits / total


def test_compression_shape(emb, fixed_books):
    row = pq.pq_encode(emb, fixed_books).head()
    assert len(row["codes"]) == FIXED_M  # 64 floats -> 4 codes
    assert all(0 <= c < FIXED_K for c in row["codes"])


def test_search_plan_is_jvm_only_no_global_sort(emb, fixed_books):
    codes = pq.pq_encode(emb, fixed_books)
    codes_tbl = codes.cache()
    codes_tbl.count()
    df = pq.pq_search(codes_tbl, fixed_books, [0.0] * 64, k=5)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # scoring region (above the cached codes scan — the InMemoryRelation
    # prints its own BUILD plan, which rightly contains the encode UDF)
    # carries no Python stage, and top-k is TakeOrdered, not Sort+Exchange
    scoring = plan.split("InMemoryTableScan")[0]
    assert "TakeOrderedAndProject" in scoring
    assert "ArrowEvalPython" not in scoring and "BatchEvalPython" not in scoring
    assert "MapInPandas" not in scoring
    assert "Exchange" not in scoring and "Sort " not in scoring
    codes_tbl.unpersist()


def test_validation(emb, fixed_books):
    with pytest.raises(ValueError):
        pq.pq_train(emb, m=5, ksub=4)  # 5 does not divide 64
    with pytest.raises(ValueError):
        pq.pq_search(pq.pq_encode(emb, fixed_books), fixed_books, [0.0] * 64, rerank=20)
    with pytest.raises(ValueError):
        pq.adc_table([0.0] * 63, fixed_books)


def test_normalized_mode_ranks_by_cosine(emb, rows):
    """On a normalized corpus ascending L2 == descending cosine: the
    rerank lane must agree with ann_brute_force's cosine ordering."""
    from deidcm_spark.operators import similarity

    q = list(rows[42])
    books = pq.pq_train(emb, m=FIXED_M, ksub=FIXED_K, lloyd_iters=0, normalize=True)
    codes = pq.pq_encode(emb, books, normalize=True)
    got = [
        int(r["vec_id"])
        for r in pq.pq_search(
            codes, books, q, k=5, rerank=500, emb=emb, normalize=True
        ).collect()
    ]
    cos = [int(r["vec_id"]) for r in similarity.ann_brute_force(emb, q, k=5).collect()]
    assert got == cos


# ---------- IVF-PQ (coarse lists + residual PQ) ----------


def oracle_coarse(rows, nlist):
    # coarse quantizer == PQ with m=1, ksub=nlist
    return oracle_books(rows, 1, nlist)[0]


def oracle_ivfpq_index(rows, coarse, books):
    C = np.asarray(coarse, dtype=np.float64)
    out = {}
    for vid, x in rows.items():
        lid = int(np.argmin(((x[None, :] - C) ** 2).sum(axis=1)))
        out[vid] = (lid, oracle_encode_row(x - C[lid], books))
    return out


def oracle_ivfpq_search(rows, coarse, books, q, k, nprobe):
    C = np.asarray(coarse, dtype=np.float64)
    dists = ((np.asarray(q)[None, :] - C) ** 2).sum(axis=1)
    probes = [int(p) for p in np.argsort(dists, kind="stable")[:nprobe]]
    idx = oracle_ivfpq_index(rows, coarse, books)
    luts = {p: oracle_lut(np.asarray(q) - C[p], books) for p in probes}
    scored = []
    for vid, (lid, codes) in idx.items():
        if lid not in luts:
            continue
        s = 0.0
        for i, c in enumerate(codes):
            s += luts[lid][i][c]
        scored.append((vid, _spark_round(s)))
    scored.sort(key=lambda t: (t[1], t[0]))
    return scored[:k]


NLIST = 8


@pytest.fixture(scope="module")
def ivfpq_fixed(rows):
    coarse = oracle_coarse(rows, NLIST)
    # residual books: seeds = residuals of the SAME md5-ordered sample —
    # replicate pq_train on the residual frame
    C = np.asarray(coarse, dtype=np.float64)
    res_rows = {}
    for vid, x in rows.items():
        lid = int(np.argmin(((x[None, :] - C) ** 2).sum(axis=1)))
        res_rows[vid] = x - C[lid]
    books = oracle_books(res_rows, FIXED_M, FIXED_K)
    return coarse, books


def test_ivfpq_train_seed_exact(emb, rows, ivfpq_fixed):
    coarse, books = pq.ivfpq_train(
        emb, nlist=NLIST, m=FIXED_M, ksub=FIXED_K, lloyd_iters=0
    )
    exp_coarse, exp_books = ivfpq_fixed
    assert coarse == exp_coarse
    assert books == exp_books


def test_ivfpq_index_bit_exact(emb, rows, ivfpq_fixed):
    coarse, books = ivfpq_fixed
    got = {
        int(r["vec_id"]): (int(r["list_id"]), list(r["codes"]))
        for r in pq.ivfpq_encode(emb, coarse, books).collect()
    }
    assert got == oracle_ivfpq_index(rows, coarse, books)


def test_ivfpq_search_matches_oracle(emb, rows, ivfpq_fixed):
    coarse, books = ivfpq_fixed
    index = pq.ivfpq_encode(emb, coarse, books)
    q = rows[7]
    got = [
        (int(r["vec_id"]), float(r["adc_dist"]))
        for r in pq.ivfpq_search(index, coarse, books, list(q), k=12, nprobe=3).collect()
    ]
    assert got == oracle_ivfpq_search(rows, coarse, books, q, 12, 3)


def test_ivfpq_full_probe_rerank_equals_exact(emb, rows, ivfpq_fixed):
    """nprobe=nlist + rerank over everything == exact L2 top-k (the
    ann_ivf full-probe==exact contract, composed with PQ)."""
    coarse, books = ivfpq_fixed
    index = pq.ivfpq_encode(emb, coarse, books)
    q = rows[3]
    got = [
        (int(r["vec_id"]), float(r["l2_dist"]))
        for r in pq.ivfpq_search(
            index, coarse, books, list(q), k=10, nprobe=NLIST,
            rerank=500, emb=emb,
        ).collect()
    ]
    assert got == oracle_l2_topk(rows, q, 10)


def test_ivfpq_recall_with_rerank(emb, rows):
    """Measured on this corpus: nprobe 4/5/6/8 of 8 lists → recall
    0.725/0.75/0.825/0.95 (true neighbors scatter across coarse lists in
    the synthetic 64-dim data); pinned at nprobe=6 with headroom.  The
    full-probe == exact contract above is the exactness check — this
    lane pins the probe/recall TRADE."""
    coarse, books = pq.ivfpq_train(emb, nlist=8, m=16, ksub=16, lloyd_iters=1)
    index = pq.ivfpq_encode(emb, coarse, books).cache()
    hits = total = 0
    for qid in (0, 7, 123, 400):
        q = list(rows[qid])
        truth = {r["vec_id"] for r in pq.l2_brute_force(emb, q, k=10).collect()}
        got = {
            r["vec_id"]
            for r in pq.ivfpq_search(
                index, coarse, books, q, k=10, nprobe=6, rerank=80, emb=emb
            ).collect()
        }
        hits += len(truth & got)
        total += len(truth)
    index.unpersist()
    assert hits / total >= 0.75, hits / total


def test_ivfpq_search_plan_prunes_and_stays_jvm(emb, ivfpq_fixed):
    coarse, books = ivfpq_fixed
    index = pq.ivfpq_encode(emb, coarse, books).cache()
    index.count()
    df = pq.ivfpq_search(index, coarse, books, [0.0] * 64, k=5, nprobe=2)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    scoring = plan.split("InMemoryTableScan")[0]
    assert "TakeOrderedAndProject" in scoring
    assert "ArrowEvalPython" not in scoring and "BatchEvalPython" not in scoring
    # the probe filter reaches the scan region (IN-list on list_id)
    assert "list_id" in plan
    index.unpersist()
