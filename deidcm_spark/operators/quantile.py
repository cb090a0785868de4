"""Distributed quantiles and exact top-k / top-fraction selection without
a global sort.

Two lanes, both built on the repo's bounded-bucket discipline
(``textops.pack_shards`` / ``sampling.select_token_budget``):

* **CDF sketch** — a mergeable quantile statistic represented AS A SPARK
  TABLE (the ``sketch.py`` / ``bloom.py`` pattern): ``(bucket_idx int,
  cnt bigint)``, at most ``m`` rows at ANY corpus size.  Build = ONE
  hash aggregation (``sum`` combines map-side); merge across shards =
  re-aggregation; quantile query touches only the ≤ m sketch rows.
  Rank error of a query is bounded by the queried bucket's own mass
  (the answer interval ``[value_lo, value_hi)`` provably contains the
  true quantile when all data lies in ``[lo, hi]``).

* **select_top_k / select_top_fraction** — "keep the k highest-scoring
  documents" at corpus scale.  A global ``ORDER BY score DESC LIMIT k``
  serializes 100 TB through one partition; instead scores quantize into
  ``n_buckets`` equal-width buckets (per-bucket COUNTS, ≤ n_buckets
  driver rows), buckets strictly above the boundary are wholly kept,
  below wholly dropped, and the boundary bucket — the only one the
  cut lands inside — is refined: re-bucketed over its own observed
  [min, max] (``refine_levels`` times, slice shrinks ~n_buckets× per
  level), with the final residue resolved by the deterministic
  md5-permutation prefix count (``textops._prefix_tokens`` with unit
  weights, ``order="shuffle"``) — the same machinery that keeps the
  all-scores-tied degenerate case fully distributed instead of
  one-partition.

  Exactness: the result IS the true top-k, except that documents whose
  scores tie within the final refinement level's bucket width
  (span / n_buckets^(refine_levels+1); zero for genuinely tied scores)
  are interchangeable and the hash draw picks among them.  With the
  defaults (65536 buckets, one refinement) the final width is
  span / 2^32.

The reference repo has no selection lane; this is part of the
training-data operator family the brief mandates ("take the best X%
by quality / perplexity / DSIR score").  Deterministic end to end: no
RNG, no wall-clock; bucket bounds are pure functions of the score
distribution and the residue draw is md5(doc_id:seed).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

# ---------------------------------------------------------------------------
# CDF sketch (mergeable quantile table)
# ---------------------------------------------------------------------------


# relative nudge for float rank targets: ceil(q·total) on binary doubles
# overshoots when the product rounds UP past the true integer (0.07·100
# computes to 7.000000000000001 — plain ceil says rank 8, the true rank is
# 7, and the reported bucket can exclude the true quantile).  One part in
# 1e12 is far above double rounding error at any representable corpus size
# (2^53 ≈ 9e15 has relative ulp 1.1e-16) and far below any intentional
# fractional rank, so ceil(x·(1-ε)) is the exact real-number rank.
_RANK_EPS = 1e-12


def _ceil_rank(x: float) -> int:
    return int(math.ceil(x * (1.0 - _RANK_EPS)))


def _check_cdf(lo: float, hi: float, m: int) -> None:
    if not lo < hi:
        raise ValueError(f"need lo < hi, got [{lo}, {hi}]")
    if m < 2:
        raise ValueError(f"need m >= 2 buckets, got {m}")


def _bucket_col(value_col: str, lo: float, hi: float, m: int):
    """Equal-width bucket index over [lo, hi], clamped to [0, m-1].

    Out-of-range values clamp to the edge buckets (documented lossiness:
    the sketch then bounds their rank, not their value).  The arithmetic
    is plain IEEE-double multiply/floor — bit-identical in Spark, DuckDB,
    and the Python oracle."""
    x = F.col(value_col).cast("double")
    raw = F.floor((x - F.lit(float(lo))) / F.lit(float(hi - lo)) * m)
    return F.greatest(F.lit(0), F.least(raw, F.lit(m - 1))).cast("int")


def cdf_build(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    m: int = 4096,
    weight_col: str | None = None,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """value column → CDF sketch table ``(bucket_idx, cnt)``.

    ONE hash aggregation over the scan (``sum`` partials combine
    map-side, so the shuffle carries ≤ m rows per map task regardless of
    corpus size).  NULL values are skipped.  ``weight_col`` accumulates
    weights (e.g. token counts) instead of row counts, giving a
    token-weighted CDF.  ``group_cols`` keys the sketch per group
    (≤ m rows PER GROUP — per-source length/score distributions in one
    pass, identical to building each group's sketch separately)."""
    _check_cdf(lo, hi, m)
    g = list(group_cols or [])
    w = F.col(weight_col).cast("bigint") if weight_col else F.lit(1).cast("bigint")
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(
            *g, _bucket_col(value_col, lo, hi, m).alias("bucket_idx"), w.alias("_w")
        )
        .groupBy(*g, "bucket_idx")
        .agg(F.sum("_w").alias("cnt"))
    )


def cdf_merge(
    sketches: list[DataFrame], group_cols: list[str] | None = None
) -> DataFrame:
    """Element-wise sum: the CDF sketch of the concatenated corpora.
    Per-shard sketches persist as tiny parquet tables; corpus-wide
    quantiles never rescan the corpus.  Pass the same ``group_cols``
    the sketches were built with."""
    if not sketches:
        raise ValueError("need at least one sketch")
    g = list(group_cols or [])
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy(*g, "bucket_idx").agg(F.sum("cnt").alias("cnt"))


def cdf_quantile(
    sketch: DataFrame,
    qs: list[float],
    lo: float,
    hi: float,
    m: int = 4096,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Sketch → one row per q (per group with ``group_cols``):
    ``(q, bucket_idx, value_lo, value_hi, rank_lo, rank_hi, total)``.

    The true q-quantile (rank ``ceil(q·total)``, q in (0, 1]) lies in
    ``[value_lo, value_hi)``; ``rank_lo``/``rank_hi`` are the exclusive/
    inclusive cumulative counts bracketing the bucket, so the rank
    uncertainty is exactly the bucket's own mass.  The cumulative walk
    runs as a window over the ≤ m sketch rows per group (one partition
    when ungrouped — BOUNDED at any corpus size, same class as the
    ≤ n_buckets driver tables elsewhere, never over data) and the per-q
    hit lookup is ONE ``min_by`` aggregation (no join, no nested-loop
    pairing of the q list against the sketch)."""
    _check_cdf(lo, hi, m)
    for q in qs:
        if not 0.0 < q <= 1.0:
            raise ValueError(f"q must be in (0, 1], got {q}")
    if not qs:
        raise ValueError("need at least one q")
    from pyspark.sql import Window

    g = list(group_cols or [])
    w = (
        Window.partitionBy(*g)
        .orderBy("bucket_idx")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    total_w = Window.partitionBy(*g)
    cum = (
        sketch.withColumn("_cum", F.sum("cnt").over(w))
        .withColumn("_total", F.sum("cnt").over(total_w))
    )
    # per q: the first bucket whose cumulative count reaches the target
    # rank, picked with min_by inside one aggregation (rows failing the
    # predicate contribute a NULL ordering key, which min_by skips)
    aggs = [
        F.min_by(
            F.struct("bucket_idx", "cnt", "_cum", "_total"),
            F.when(
                F.col("_cum")
                >= F.ceil(
                    F.lit(float(q) * (1.0 - _RANK_EPS)) * F.col("_total")
                ),
                F.col("bucket_idx"),
            ),
        ).alias(f"_s{i}")
        for i, q in enumerate(qs)
    ]
    one = cum.groupBy(*g).agg(*aggs) if g else cum.agg(*aggs)
    width = (hi - lo) / m
    rows = F.explode(
        F.array(
            *[
                F.struct(F.lit(float(q)).alias("q"), F.col(f"_s{i}").alias("s"))
                for i, q in enumerate(qs)
            ]
        )
    )
    return (
        one.select(*g, rows.alias("r"))
        .filter(F.col("r.s").isNotNull())  # empty sketch -> no rows
        .select(
            *g,
            F.col("r.q").alias("q"),
            F.col("r.s.bucket_idx").alias("bucket_idx"),
            (F.lit(lo) + F.col("r.s.bucket_idx") * F.lit(width)).alias("value_lo"),
            (F.lit(lo) + (F.col("r.s.bucket_idx") + 1) * F.lit(width)).alias(
                "value_hi"
            ),
            (F.col("r.s._cum") - F.col("r.s.cnt")).alias("rank_lo"),
            F.col("r.s._cum").alias("rank_hi"),
            F.col("r.s._total").alias("total"),
        )
    )


# ---------------------------------------------------------------------------
# exact top-k selection
# ---------------------------------------------------------------------------


def select_top_k(
    df: DataFrame,
    k: int,
    score_col: str = "score",
    n_buckets: int = 65536,
    refine_levels: int = 1,
    seed: int = 0,
) -> DataFrame:
    """Keep the ``k`` highest-scoring rows, distributed (see module
    docstring for the bucket-refine-draw design and the exactness
    guarantee).  NULL scores are never selected.  Requires a ``doc_id``
    column (the deterministic residue draw keys on it).

    Scan accounting at corpus scale: one min/max aggregate, one bucket
    aggregate, and one output filter touch the full corpus; every
    refinement level touches only the boundary slice (expected
    corpus/n_buckets of the previous level).  The bucket expression is
    deliberately recomputed in the output filter rather than cached —
    at 100 TB a persist of the scored corpus costs more than the extra
    projection (the ``substring_dedup`` trade)."""
    if k < 0:
        raise ValueError(f"k must be >= 0, got {k}")
    out_cols = df.columns
    if k == 0:
        return df.limit(0)
    scored = df.filter(F.col(score_col).isNotNull())

    def _draw(slice_df: DataFrame, need: int) -> DataFrame:
        # scores tied (or within the final granularity): deterministic
        # md5-permutation prefix count picks exactly `need` of them,
        # fully distributed (no one-partition sort)
        from deidcm_spark.operators.textops import _prefix_tokens

        picked = (
            _prefix_tokens(
                slice_df.withColumn("_one", F.lit(1)),
                "_one",
                None,
                n_buckets,
                order="shuffle",
                seed=seed,
            )
            .filter(F.col("_before") < need)
            .select("doc_id")
        )
        return slice_df.join(picked, "doc_id", "left_semi")

    parts: list[DataFrame] = []
    need = k
    slice_df = scored
    settled = False
    for _level in range(refine_levels + 1):
        lo, hi, n = slice_df.agg(
            F.min(score_col).cast("double"),
            F.max(score_col).cast("double"),
            F.count(score_col),
        ).first()
        if n == 0:
            settled = True
            break
        if need >= n:
            parts.append(slice_df)
            need -= n
            settled = True
            break
        if hi == lo:
            parts.append(_draw(slice_df, need))
            need = 0
            settled = True
            break
        bucket = _bucket_col(score_col, lo, hi, n_buckets)
        with_b = slice_df.withColumn("_bkt", bucket)
        totals = sorted(
            (
                (r["_bkt"], r["c"])
                for r in with_b.groupBy("_bkt").agg(F.count("*").alias("c")).collect()
            ),
            reverse=True,
        )
        acc = 0
        boundary = None
        full_above = None  # lowest wholly-selected bucket
        for bkt, c in totals:
            if acc + c <= need:
                acc += c
                full_above = bkt
            else:
                boundary = bkt
                break
        if full_above is not None:
            parts.append(with_b.filter(F.col("_bkt") >= full_above).drop("_bkt"))
        need -= acc
        if boundary is None or need == 0:
            settled = True
            break
        slice_df = with_b.filter(F.col("_bkt") == boundary).drop("_bkt")
    if not settled and need > 0:
        # refinement budget exhausted with the cut still inside the final
        # boundary bucket (score window <= span / n_buckets^(levels+1))
        parts.append(_draw(slice_df, need))

    if not parts:
        return df.limit(0)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(*out_cols)


def select_top_fraction(
    df: DataFrame,
    frac: float,
    score_col: str = "score",
    n_buckets: int = 65536,
    refine_levels: int = 1,
    seed: int = 0,
) -> DataFrame:
    """Keep the top ``frac`` of rows by score: k = ceil(frac · N) over
    the non-NULL-score rows (one count aggregate, then
    :func:`select_top_k`).  frac in (0, 1]."""
    if not 0.0 < frac <= 1.0:
        raise ValueError(f"frac must be in (0, 1], got {frac}")
    n = df.filter(F.col(score_col).isNotNull()).count()
    if n == 0:
        return df.limit(0)
    k = _ceil_rank(frac * n)
    return select_top_k(
        df, k, score_col=score_col, n_buckets=n_buckets,
        refine_levels=refine_levels, seed=seed,
    )
