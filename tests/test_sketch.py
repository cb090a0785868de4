"""Mergeable sketch tables (operators/sketch.py): register/counter tables
checked BIT-FOR-BIT against a pure-Python re-derivation of the shared
spec, plus the algebraic contracts (merge ≡ build-over-union for both
impls), the CMS one-sided error guarantee, and HLL accuracy within the
theoretical band."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from deidcm_spark.operators.sketch import (
    HLL_HASH_BITS,
    cms_build,
    cms_merge,
    cms_query,
    heavy_hitters,
    hll_build,
    hll_estimate,
    hll_estimate_value,
    hll_merge,
)

# ---------- pure-Python oracle of the shared spec ----------


def _h60(v: str) -> int:
    return int(hashlib.md5(v.encode("utf8")).hexdigest()[:15], 16)


def oracle_hll_registers(values, p):
    rest_bits = HLL_HASH_BITS - p
    regs: dict[int, int] = {}
    for v in values:
        h = _h60(str(v))
        idx = h >> rest_bits
        rest = h & ((1 << rest_bits) - 1)
        rho = rest_bits - rest.bit_length() + 1
        regs[idx] = max(regs.get(idx, 0), rho)
    return regs


def oracle_hll_estimate(regs, p):
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    s = sum(2.0 ** -r for r in regs.values()) + (m - len(regs))
    e = alpha * m * m / s
    v = m - len(regs)
    if e <= 2.5 * m and v > 0:
        return m * math.log(m / v)
    return e


def oracle_cms_positions(v: str, width: int, depth: int):
    return [
        int(hashlib.md5(f"{j}:{v}".encode("utf8")).hexdigest()[:15], 16) % width
        for j in range(depth)
    ]


def _values(n, dup=1, tag="v"):
    return [f"{tag}{i % max(n // dup, 1)}" for i in range(n)]


@pytest.fixture(scope="module")
def vals_df(spark):
    # 6000 rows, 2000 distinct values
    return spark.createDataFrame(
        [(v,) for v in _values(6000, dup=3)], "text string"
    )


def test_hll_registers_match_oracle(spark, vals_df):
    p = 10
    got = {
        r["register_idx"]: r["max_rho"]
        for r in hll_build(vals_df, "text", p=p).collect()
    }
    assert got == oracle_hll_registers(_values(6000, dup=3), p)


def test_hll_estimate_matches_oracle_and_truth(spark, vals_df):
    p = 12
    regs = oracle_hll_registers(_values(6000, dup=3), p)
    sk = hll_build(vals_df, "text", p=p)
    est_row = hll_estimate(sk, p=p).collect()[0]
    assert est_row["estimate"] == pytest.approx(
        oracle_hll_estimate(regs, p), rel=1e-12
    )
    # accuracy: 1.04/sqrt(4096) ≈ 1.6% standard error; allow 3 sigma
    assert est_row["estimate"] == pytest.approx(2000, rel=0.05)
    assert est_row["n_zero_registers"] == (1 << p) - len(regs)


def test_hll_small_range_linear_counting(spark):
    # 30 distinct values at p=12: E far below 2.5m -> linear counting path
    df = spark.createDataFrame([(f"x{i}",) for i in range(30)], "text string")
    est = hll_estimate_value(hll_build(df, "text", p=12), p=12)
    assert est == pytest.approx(30, rel=0.01)
    # empty corpus estimates 0, not NULL
    empty = hll_build(df.filter("text is null"), "text", p=12)
    assert hll_estimate_value(empty, p=12) == 0.0


@pytest.mark.parametrize("hash_impl", ["portable", "fast"])
def test_hll_merge_is_build_over_union(spark, hash_impl):
    p = 10
    a = spark.createDataFrame([(v,) for v in _values(800, tag="a")], "text string")
    b = spark.createDataFrame(
        [(v,) for v in _values(900, tag="a")[400:]], "text string"
    )
    merged = hll_merge(
        [hll_build(a, "text", p, hash_impl), hll_build(b, "text", p, hash_impl)]
    )
    direct = hll_build(a.unionByName(b), "text", p, hash_impl)
    as_rows = lambda d: sorted(tuple(r) for r in d.collect())
    assert as_rows(merged) == as_rows(direct)


def test_hll_fast_impl_estimates_sanely(spark, vals_df):
    est = hll_estimate_value(hll_build(vals_df, "text", 12, "fast"), 12)
    assert est == pytest.approx(2000, rel=0.05)


def test_hll_validation(spark, vals_df):
    with pytest.raises(ValueError):
        hll_build(vals_df, "text", p=2)
    with pytest.raises(ValueError):
        hll_build(vals_df, "text", p=12, hash_impl="nope")
    with pytest.raises(ValueError):
        hll_merge([])


def test_hll_build_single_shuffle_plan(spark, vals_df):
    sk = hll_build(vals_df, "text", p=12)
    sk.collect()
    # final-plan only (no caches here, so the plain split is safe)
    plan = sk._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan =="
    )[0]
    assert plan.count("Exchange") <= 1, plan
    assert "partial_max" in plan  # map-side combine before the exchange
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------- Count-Min ----------


def test_cms_counters_match_oracle(spark):
    width, depth = 256, 3
    vals = _values(3000, dup=5)  # 600 distinct, 5 occurrences each
    df = spark.createDataFrame([(v,) for v in vals], "text string")
    got = {
        (r["row_idx"], r["col_idx"]): r["cnt"]
        for r in cms_build(df, "text", width, depth).collect()
    }
    exp: dict[tuple[int, int], int] = {}
    for v in vals:
        for j, pos in enumerate(oracle_cms_positions(v, width, depth)):
            exp[(j, pos)] = exp.get((j, pos), 0) + 1
    assert got == exp


def test_cms_query_overestimates_never_under(spark):
    width, depth = 512, 4
    vals = _values(4000, dup=8) + ["hot"] * 500
    df = spark.createDataFrame([(v,) for v in vals], "text string")
    sk = cms_build(df, "text", width, depth)
    items = spark.createDataFrame(
        [("hot",), ("v0",), ("v3",), ("absent",)], "text string"
    )
    got = {
        r["value"]: r["est"]
        for r in cms_query(sk, items, "text", width, depth).collect()
    }
    true = {"hot": 500, "v0": 8, "v3": 8, "absent": 0}
    for v, t in true.items():
        assert got[v] >= t, (v, got[v], t)
        # ε = e/width bound on the total mass (4500)
        assert got[v] <= t + math.e / width * 4500 + 1


def test_cms_weighted_and_merge(spark):
    width, depth = 128, 3
    a = spark.createDataFrame(
        [("x", 5), ("y", 2)], "text string, n bigint"
    )
    b = spark.createDataFrame(
        [("x", 1), ("z", 7)], "text string, n bigint"
    )
    ska = cms_build(a, "text", width, depth, weight_col="n")
    skb = cms_build(b, "text", width, depth, weight_col="n")
    merged = cms_merge([ska, skb])
    direct = cms_build(
        a.unionByName(b), "text", width, depth, weight_col="n"
    )
    as_rows = lambda d: sorted(tuple(r) for r in d.collect())
    assert as_rows(merged) == as_rows(direct)
    items = spark.createDataFrame([("x",), ("y",), ("z",)], "text string")
    got = {
        r["value"]: r["est"]
        for r in cms_query(merged, items, "text", width, depth).collect()
    }
    # tiny corpus, no collisions plausible at 128x3 with 3 keys
    assert got == {"x": 6, "y": 2, "z": 7}


@pytest.mark.parametrize("hash_impl", ["portable", "fast"])
def test_cms_merge_algebra_both_impls(spark, hash_impl):
    width, depth = 64, 2
    a = spark.createDataFrame([(f"k{i}",) for i in range(50)], "text string")
    b = spark.createDataFrame([(f"k{i}",) for i in range(25, 80)], "text string")
    merged = cms_merge(
        [cms_build(a, "text", width, depth, hash_impl=hash_impl),
         cms_build(b, "text", width, depth, hash_impl=hash_impl)]
    )
    direct = cms_build(a.unionByName(b), "text", width, depth,
                       hash_impl=hash_impl)
    as_rows = lambda d: sorted(tuple(r) for r in d.collect())
    assert as_rows(merged) == as_rows(direct)


def test_cms_validation(spark):
    df = None
    with pytest.raises(ValueError):
        cms_build(df, "text", width=1, depth=2)
    with pytest.raises(ValueError):
        cms_build(df, "text", width=16, depth=0)
    with pytest.raises(ValueError):
        cms_merge([])


def test_hll_grouped_equals_per_group_builds(spark):
    """group_cols keys the registers per group: the one-pass grouped
    sketch is IDENTICAL to building each group's slice separately, the
    grouped estimate matches the oracle formula per group, and grouped
    merge is build-over-union per group."""
    rows = [
        ("web", "en", f"u{i % 700}") for i in range(2100)
    ] + [
        ("web", "fr", f"u{i % 40}") for i in range(200)
    ] + [
        ("books", "en", f"b{i}") for i in range(900)
    ]
    df = spark.createDataFrame(rows, "source string, lang string, text string")
    p = 8
    grouped = hll_build(df, "text", p, group_cols=["source", "lang"])
    got = {
        (r["source"], r["lang"], r["register_idx"]): r["max_rho"]
        for r in grouped.collect()
    }
    expect = {}
    for src, lang in {("web", "en"), ("web", "fr"), ("books", "en")}:
        vals = [t for s, lg, t in rows if (s, lg) == (src, lang)]
        for idx, rho in oracle_hll_registers(vals, p).items():
            expect[(src, lang, idx)] = rho
    assert got == expect

    est = {
        (r["source"], r["lang"]): r["estimate"]
        for r in hll_estimate(grouped, p, group_cols=["source", "lang"]).collect()
    }
    for src, lang in expect_keys(expect):
        vals = [t for s, lg, t in rows if (s, lg) == (src, lang)]
        assert est[(src, lang)] == pytest.approx(
            oracle_hll_estimate(oracle_hll_registers(vals, p), p), rel=1e-12
        )
        truth = len(set(vals))
        assert abs(est[(src, lang)] - truth) / truth < 0.25

    # merge per group: two shards of the same corpus
    a = df.filter("text like '%0' or text like '%1' or text like '%2'")
    b = df.subtract(a)
    merged = hll_merge(
        [
            hll_build(a, "text", p, group_cols=["source", "lang"]),
            hll_build(b, "text", p, group_cols=["source", "lang"]),
        ],
        group_cols=["source", "lang"],
    )
    got_m = {
        (r["source"], r["lang"], r["register_idx"]): r["max_rho"]
        for r in merged.collect()
    }
    assert got_m == expect


def expect_keys(expect):
    return sorted({(s, lg) for s, lg, _ in expect})


# ---------- CMS-gated exact heavy hitters ----------


@pytest.fixture(scope="module")
def hh_docs(spark):
    # boilerplate footer in every doc, a medium-frequency phrase in 1/3,
    # and unique long-tail content everywhere
    rows = [
        (
            i,
            f"unique words {i} alpha{i} beta{i} "
            + ("subscribe to our newsletter today " if i % 3 == 0 else "")
            + "all rights reserved 2024",
        )
        for i in range(240)
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _naive_hh(spark, docs, n, min_count):
    from deidcm_spark.operators.textops import (
        TOKENS,
        shingles_all_expr,
        twograms_all_expr,
    )

    expr = {1: TOKENS, 2: twograms_all_expr(), 3: shingles_all_expr()}[n]
    return {
        (r["gram"], r["n"])
        for r in docs.select(F.explode(F.expr(expr)).alias("gram"))
        .groupBy("gram")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= min_count)
        .collect()
    }


@pytest.mark.parametrize("n,min_count", [(3, 50), (2, 80), (1, 100)])
def test_heavy_hitters_equals_naive(spark, hh_docs, n, min_count):
    got = {
        (r["gram"], r["n_occurrences"])
        for r in heavy_hitters(hh_docs, min_count, n=n).collect()
    }
    assert got == _naive_hh(spark, hh_docs, n, min_count)
    assert got  # the boilerplate phrases are in there


def test_heavy_hitters_tiny_width_collisions_still_exact(spark, hh_docs):
    """width=8 forces massive counter collisions — the gate passes false
    positives, the exact count must remove every one."""
    got = {
        (r["gram"], r["n_occurrences"])
        for r in heavy_hitters(hh_docs, 50, n=3, width=8).collect()
    }
    assert got == _naive_hh(spark, hh_docs, 3, 50)


def test_heavy_hitters_prebuilt_sketch_and_fast_impl(spark, hh_docs, tmp_path):
    from deidcm_spark.operators.textops import shingles_all_expr

    grams = hh_docs.select(F.explode(F.expr(shingles_all_expr())).alias("gram"))
    loc = str(tmp_path / "cms")
    cms_build(grams, "gram", 4096, 4, hash_impl="fast").write.parquet(loc)
    got = {
        (r["gram"], r["n_occurrences"])
        for r in heavy_hitters(
            hh_docs, 50, n=3, width=4096, hash_impl="fast",
            sketch=spark.read.parquet(loc),
        ).collect()
    }
    assert got == _naive_hh(spark, hh_docs, 3, 50)


def test_heavy_hitters_validation(spark, hh_docs):
    with pytest.raises(ValueError):
        heavy_hitters(hh_docs, 10, n=4)
    with pytest.raises(ValueError):
        heavy_hitters(hh_docs, 0)


def test_heavy_hitters_line_unit(spark):
    docs = spark.createDataFrame(
        [
            (i, f"unique content {i}\nAll Rights Reserved\n  \n"
                + ("Subscribe now\n" if i % 2 == 0 else ""))
            for i in range(80)
        ],
        "doc_id bigint, text string",
    )
    got = {
        (r["gram"], r["n_occurrences"])
        for r in heavy_hitters(docs, 40, unit="line").collect()
    }
    # blank/whitespace-only lines are never mined; exact line content keys
    assert got == {("All Rights Reserved", 80), ("Subscribe now", 40)}
    with pytest.raises(ValueError):
        heavy_hitters(docs, 40, unit="sentence")


def test_cdf_grouped_equals_per_group_builds(spark):
    from deidcm_spark.operators.quantile import cdf_build, cdf_merge, cdf_quantile

    rows = [("web", float(i % 100)) for i in range(3000)] + [
        ("books", float((i * 7) % 50)) for i in range(600)
    ]
    df = spark.createDataFrame(rows, "source string, v double")
    lo, hi, m = 0.0, 100.0, 64
    grouped = cdf_build(df, "v", lo, hi, m, group_cols=["source"])
    for src in ("web", "books"):
        solo = {
            r["bucket_idx"]: r["cnt"]
            for r in cdf_build(
                df.filter(F.col("source") == src), "v", lo, hi, m
            ).collect()
        }
        got = {
            r["bucket_idx"]: r["cnt"]
            for r in grouped.filter(F.col("source") == src).collect()
        }
        assert got == solo
    # per-group quantiles == per-group solo quantiles
    qs = [0.5, 0.9]
    gq = {
        (r["source"], r["q"]): (r["bucket_idx"], r["rank_lo"], r["rank_hi"], r["total"])
        for r in cdf_quantile(grouped, qs, lo, hi, m, group_cols=["source"]).collect()
    }
    for src in ("web", "books"):
        solo = {
            r["q"]: (r["bucket_idx"], r["rank_lo"], r["rank_hi"], r["total"])
            for r in cdf_quantile(
                cdf_build(df.filter(F.col("source") == src), "v", lo, hi, m),
                qs, lo, hi, m,
            ).collect()
        }
        for q in qs:
            assert gq[(src, q)] == solo[q]
    # grouped merge ≡ grouped build-over-union
    a = df.filter("v < 30")
    b = df.filter("v >= 30")
    merged = cdf_merge(
        [cdf_build(a, "v", lo, hi, m, group_cols=["source"]),
         cdf_build(b, "v", lo, hi, m, group_cols=["source"])],
        group_cols=["source"],
    )
    as_rows = lambda d: sorted(tuple(r) for r in d.collect())
    assert as_rows(merged) == as_rows(grouped)


def test_heavy_hitters_leaves_no_cache_residue(spark, hh_docs):
    """The internally built CMS is localized (bounded collect), not
    persisted (r4 ADVICE: the old persist was never released and leaked
    cached blocks into the session per call)."""
    import gc

    # flush residue other tests may have left in the shared session:
    # clearCache drops persisted frames, gc releases localCheckpoint RDDs
    # that are only freed when their DataFrame is collected
    spark.catalog.clearCache()
    gc.collect()
    before = len(spark.sparkContext._jsc.sc().getRDDStorageInfo())
    heavy_hitters(hh_docs, min_count=3, n=1).collect()
    after = len(spark.sparkContext._jsc.sc().getRDDStorageInfo())
    assert after == before  # heavy_hitters itself adds no cache residue
