"""Quantile lane (operators/quantile.py): CDF sketch tables checked
BIT-FOR-BIT against a pure-Python re-derivation of the bucket spec,
merge ≡ build-over-union, the quantile bracketing guarantee against
exact numpy quantiles, and select_top_k/_fraction checked for EXACT
top-k on discriminating scores plus spec-equality of the deterministic
residue draw on tied scores."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from deidcm_spark.operators.quantile import (
    cdf_build,
    cdf_merge,
    cdf_quantile,
    select_top_fraction,
    select_top_k,
)

# ---------- pure-Python oracle of the shared spec ----------


def oracle_bucket(x: float, lo: float, hi: float, m: int) -> int:
    raw = math.floor((x - lo) / (hi - lo) * m)
    return max(0, min(raw, m - 1))


def oracle_cdf(values, lo, hi, m, weights=None):
    out: dict[int, int] = {}
    for i, v in enumerate(values):
        if v is None:
            continue
        b = oracle_bucket(float(v), lo, hi, m)
        out[b] = out.get(b, 0) + (weights[i] if weights else 1)
    return out


def _shuffle_key(doc_id, seed: int) -> int:
    s = f"{doc_id}:{seed}"
    return int(hashlib.md5(s.encode("utf8")).hexdigest()[:15], 16)


def oracle_draw(doc_ids, need: int, seed: int) -> set:
    """The textops._prefix_tokens(order='shuffle') pick: the `need` docs
    with the smallest (md5 key, doc_id)."""
    ranked = sorted(doc_ids, key=lambda d: (_shuffle_key(d, seed), d))
    return set(ranked[:need])


# ---------- fixtures ----------


@pytest.fixture(scope="module")
def scores_df(spark):
    # 400 distinct integer scores (well separated: one per bucket at
    # m=65536) + 3 NULLs
    rows = [(i, float((i * 7919) % 400)) for i in range(400)]
    rows += [(1000 + i, None) for i in range(3)]
    return spark.createDataFrame(rows, "doc_id long, score double")


# ---------- CDF sketch ----------


def test_cdf_build_matches_oracle_bit_for_bit(spark):
    vals = [0.0, 0.5, 1.0, 2.5, 9.999, 10.0, -3.0, 42.0, None, 5.0, 5.0]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    lo, hi, m = 0.0, 10.0, 16
    got = {r["bucket_idx"]: r["cnt"] for r in cdf_build(df, "x", lo, hi, m).collect()}
    assert got == oracle_cdf(vals, lo, hi, m)
    # out-of-range clamps landed in the edge buckets
    assert got[0] >= 1 and got[m - 1] >= 1


def test_cdf_weighted(spark):
    df = spark.createDataFrame(
        [(1.0, 10), (1.1, 5), (9.0, 7)], "x double, w int"
    )
    got = {
        r["bucket_idx"]: r["cnt"]
        for r in cdf_build(df, "x", 0.0, 10.0, 10, weight_col="w").collect()
    }
    assert got == {1: 15, 9: 7}


def test_cdf_merge_is_build_over_union(spark):
    a = [float(i % 37) for i in range(300)]
    b = [float(i % 11) + 20.0 for i in range(200)]
    da = spark.createDataFrame([(v,) for v in a], "x double")
    db = spark.createDataFrame([(v,) for v in b], "x double")
    lo, hi, m = 0.0, 40.0, 64
    merged = {
        r["bucket_idx"]: r["cnt"]
        for r in cdf_merge(
            [cdf_build(da, "x", lo, hi, m), cdf_build(db, "x", lo, hi, m)]
        ).collect()
    }
    union = {
        r["bucket_idx"]: r["cnt"]
        for r in cdf_build(da.unionByName(db), "x", lo, hi, m).collect()
    }
    assert merged == union == oracle_cdf(a + b, lo, hi, m)


def test_cdf_quantile_brackets_true_quantile(spark):
    # deterministic skewed values in [0, 100)
    vals = sorted(float((i * i * 13) % 1000) / 10.0 for i in range(500))
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    lo, hi, m = 0.0, 100.0, 128
    sk = cdf_build(df, "x", lo, hi, m)
    qs = [0.01, 0.25, 0.5, 0.9, 1.0]
    rows = {r["q"]: r for r in cdf_quantile(sk, qs, lo, hi, m).collect()}
    assert set(rows) == set(qs)
    for q in qs:
        r = rows[q]
        assert r["total"] == len(vals)
        # 1-based rank, with the impl's epsilon rule: the product is
        # nudged down one part in 1e12 so binary-double round-up past the
        # true integer (0.07*100 -> 7.000…001) cannot overshoot the rank
        target = math.ceil((q * (1.0 - 1e-12)) * len(vals))
        true_val = vals[target - 1]
        # the true quantile value lies in [value_lo, value_hi)
        # (value_hi itself only when it is the clamped top bucket)
        assert r["value_lo"] <= true_val
        assert true_val < r["value_hi"] or r["bucket_idx"] == m - 1
        # rank bracketing: the bucket's cumulative range contains the target
        assert r["rank_lo"] < target <= r["rank_hi"]


def test_cdf_quantile_float_rank_regression(spark):
    """q=0.07 over 100 one-per-bucket values: 0.07*100 = 7.000…001 in
    doubles, so a plain ceil targets rank 8 and reports a bucket that
    EXCLUDES the true 0.07-quantile (rank 7)."""
    vals = [i + 0.5 for i in range(100)]  # one value per unit bucket
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    lo, hi, m = 0.0, 100.0, 100
    sk = cdf_build(df, "x", lo, hi, m)
    r = cdf_quantile(sk, [0.07], lo, hi, m).collect()[0]
    true_val = vals[7 - 1]  # rank ceil(0.07·100) = 7 → 6.5
    assert r["bucket_idx"] == 6
    assert r["value_lo"] <= true_val < r["value_hi"]


def test_cdf_quantile_empty_sketch(spark):
    sk = cdf_build(
        spark.createDataFrame([], "x double"), "x", 0.0, 1.0, 8
    )
    assert cdf_quantile(sk, [0.5], 0.0, 1.0, 8).count() == 0


def test_cdf_validation(spark):
    df = spark.createDataFrame([(1.0,)], "x double")
    with pytest.raises(ValueError):
        cdf_build(df, "x", 5.0, 5.0, 8)
    with pytest.raises(ValueError):
        cdf_build(df, "x", 0.0, 1.0, 1)
    sk = cdf_build(df, "x", 0.0, 2.0, 8)
    with pytest.raises(ValueError):
        cdf_quantile(sk, [0.0], 0.0, 2.0, 8)
    with pytest.raises(ValueError):
        cdf_quantile(sk, [], 0.0, 2.0, 8)


# ---------- select_top_k ----------


def test_top_k_exact_on_distinct_scores(spark, scores_df):
    for k in (1, 7, 137, 399, 400):
        got = {
            r["doc_id"]: r["score"]
            for r in select_top_k(scores_df, k, "score").collect()
        }
        truth = sorted(
            ((i, float((i * 7919) % 400)) for i in range(400)),
            key=lambda t: -t[1],
        )[:k]
        assert got == dict(truth), f"k={k}"


def test_top_k_more_than_n_returns_all_scored(spark, scores_df):
    got = select_top_k(scores_df, 1000, "score")
    assert got.count() == 400  # NULL scores never selected
    assert got.filter(F.col("score").isNull()).count() == 0


def test_top_k_zero_and_validation(spark, scores_df):
    assert select_top_k(scores_df, 0, "score").count() == 0
    with pytest.raises(ValueError):
        select_top_k(scores_df, -1, "score")
    assert select_top_k(scores_df, 0, "score").columns == scores_df.columns


def test_top_k_all_tied_matches_draw_oracle(spark):
    # degenerate case: every score identical -> the deterministic hash
    # draw decides, and it must match the pure-Python spec exactly
    n, k, seed = 300, 42, 0
    df = spark.createDataFrame(
        [(i, 1.5) for i in range(n)], "doc_id long, score double"
    )
    got = {r["doc_id"] for r in select_top_k(df, k, "score", seed=seed).collect()}
    assert got == oracle_draw(range(n), k, seed)
    # deterministic across invocations
    again = {r["doc_id"] for r in select_top_k(df, k, "score", seed=seed).collect()}
    assert got == again
    # a different seed draws a different (still size-k) set
    other = {r["doc_id"] for r in select_top_k(df, k, "score", seed=7).collect()}
    assert len(other) == k and other == oracle_draw(range(n), k, 7)


def test_top_k_boundary_ties_resolved_by_draw(spark):
    # 50 high distinct scores + 200 tied at the boundary; k cuts inside
    # the tied mass -> all high docs kept + oracle draw among the tied
    high = [(i, 100.0 + i) for i in range(50)]
    tied = [(1000 + i, 1.0) for i in range(200)]
    df = spark.createDataFrame(high + tied, "doc_id long, score double")
    k, seed = 80, 3
    got = {r["doc_id"] for r in select_top_k(df, k, "score", seed=seed).collect()}
    expect = {i for i, _ in high} | oracle_draw(
        [d for d, _ in tied], k - len(high), seed
    )
    assert got == expect


def test_top_fraction(spark, scores_df):
    got = select_top_fraction(scores_df, 0.25, "score")
    k = math.ceil(0.25 * 400)
    assert got.count() == k
    truth = sorted(
        (float((i * 7919) % 400) for i in range(400)), reverse=True
    )[:k]
    assert sorted((r["score"] for r in got.collect()), reverse=True) == truth
    with pytest.raises(ValueError):
        select_top_fraction(scores_df, 0.0, "score")
    with pytest.raises(ValueError):
        select_top_fraction(scores_df, 1.5, "score")
    assert select_top_fraction(scores_df, 1.0, "score").count() == 400
    # float-rank regression: 0.07*400 = 28.000000000000004 in doubles —
    # a plain ceil over-selects 29 rows; the true k is 28
    assert select_top_fraction(scores_df, 0.07, "score").count() == 28


def test_top_k_no_global_sort_in_plan(spark, scores_df):
    """The selection must never plan a global (single-partition) sort of
    the corpus — the whole point of the bucket shape."""
    df = select_top_k(scores_df, 137, "score")
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # a global sort plans as an Exchange rangepartitioning; none allowed
    assert "rangepartitioning" not in plan.lower()
