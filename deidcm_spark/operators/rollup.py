"""Hypertable rollup — multi-resolution time-bucketed continuous
aggregates (the TimescaleDB ``time_bucket`` rollup family) as a
hierarchical re-aggregation.

THE SCALE SHAPE: the naive way to produce hour+day+week aggregates is
``GROUP BY GROUPING SETS`` — but Spark plans grouping sets by EXPANDING
the input (one copy per set) before a single hash aggregate, so a
3-resolution rollup shuffles ~3× the corpus.  The hierarchical form
aggregates the raw stream ONCE at the finest resolution (the only
corpus-sized shuffle), then derives every coarser resolution from the
finer partials: a day has ≤24 hourly rows and a week ≤7 daily rows per
key, so the re-aggregations shuffle bucket-cardinality rows — metadata
scale, exactly how a TimescaleDB continuous aggregate refreshes its
coarser materializations from the finer one.

Decomposable aggregates only (count → sum of counts, sum → sum of sums,
min/max → min/max): the partials compose exactly, so the derived
coarse rows are bit-equal to aggregating the raw stream directly —
which is precisely what the DuckDB oracle does (three independent
direct aggregations, one per resolution).

Bucket nesting: hour ⊂ day ⊂ week/month ⊂/⊄ … — WEEKS do not nest in
months or years (a Monday-truncated week can straddle a month
boundary), so when ``week`` is the finest requested resolution and a
coarser calendar level is also requested, the internal aggregation
base drops to ``day`` (still one corpus-sized shuffle; the day partials
are never emitted unless requested) and every level derives from that
base.  Deriving ``month`` from week partials would silently put every
event of a straddling week in the wrong month.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# supported bucket widths, finest → coarsest (date_trunc units)
GRANULARITIES = ["hour", "day", "week", "month", "year"]


def resolve_granularities(granularities: list[str] | None) -> tuple[list[str], str]:
    """Validate + order the requested resolutions and pick the
    nesting-safe aggregation base (weeks don't nest in months/years)."""
    gs = granularities or ["hour", "day", "week"]
    bad = [g for g in gs if g not in GRANULARITIES]
    if bad:
        raise ValueError(f"unknown granularities {bad}; pick from {GRANULARITIES}")
    gs = sorted(set(gs), key=GRANULARITIES.index)
    base = gs[0]
    if base == "week" and len(gs) > 1:
        base = "day"
    return gs, base


def base_partials(
    events: DataFrame, ts_col: str, key_cols: list[str], value_col: str,
    base: str,
) -> DataFrame:
    """The finest-resolution partial aggregate — the ONE corpus-sized
    shuffle, and the unit a streaming refresh appends per micro-batch
    (partials compose: re-aggregating partials of partials is exact)."""
    return (
        events.groupBy(
            F.date_trunc(base, ts_col).alias("bucket"), *key_cols
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(value_col).alias("sum_value"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
    )


def _combine(df: DataFrame, bucket_expr, key_cols: list[str]) -> DataFrame:
    return df.groupBy(bucket_expr.alias("bucket"), *key_cols).agg(
        F.sum("n_events").alias("n_events"),
        F.sum("sum_value").alias("sum_value"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
    )


def derive_levels(
    finest: DataFrame, gs: list[str], base: str, key_cols: list[str],
    combine_base: bool = False,
) -> DataFrame:
    """finest partials → tagged union of every requested resolution.
    ``combine_base=True`` first merges duplicate base buckets (needed when
    ``finest`` is an APPEND-ONLY partial log, e.g. the streaming refresh,
    where one bucket may appear in several micro-batches)."""
    if combine_base:
        finest = _combine(finest, F.col("bucket"), key_cols)
    levels = []
    if base == gs[0]:
        levels.append(finest.withColumn("granularity", F.lit(base)))
    for g in gs if base != gs[0] else gs[1:]:
        levels.append(
            _combine(finest, F.date_trunc(g, "bucket"), key_cols)
            .withColumn("granularity", F.lit(g))
        )
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out.select(
        "bucket", "granularity", *key_cols,
        "n_events", "sum_value", "min_value", "max_value",
    )


def hypertable_rollup(
    events: DataFrame,
    ts_col: str,
    key_cols: list[str],
    value_col: str,
    granularities: list[str] | None = None,
) -> DataFrame:
    """(bucket, granularity, *key_cols, n_events, sum_value, min_value,
    max_value) at every requested resolution, the coarser levels derived
    from the finest level's partials (one corpus-sized shuffle total).

    ``granularities``: subset of hour/day/week/month/year, any order;
    the finest NESTING-SAFE base is aggregated from the raw stream and
    every requested level derives from it.
    """
    gs, base = resolve_granularities(granularities)
    finest = base_partials(events, ts_col, key_cols, value_col, base)
    return derive_levels(finest, gs, base, key_cols)


def gap_fill(
    rollup: DataFrame,
    granularity: str,
    key_cols: list[str],
    fill_cols: list[str],
    method: str = "locf",
) -> DataFrame:
    """Time-series gap filling over one resolution of a rollup — the
    TimescaleDB ``time_bucket_gapfill`` analogue Spark lacks: every key
    gets a DENSE bucket series between its first and last observed
    bucket, and missing buckets fill by

    * ``locf``  — last observation carried forward (each ``fill_cols``
      value from the most recent real bucket);
    * ``zero``  — 0 for the fill columns;
    * ``null``  — rows emitted, fill columns left NULL.

    Emitted rows carry ``filled = true``.  ``rollup`` is one
    granularity's slice of :func:`hypertable_rollup` output (or any
    ``(bucket, *key_cols, ...)`` frame); ``granularity`` must match the
    bucket spacing.

    Scale shape: per-key span aggregation (|keys| rows) → dense bucket
    explode via ``sequence(first, last, interval 1 <g>)`` (output-sized,
    no shuffle beyond its own aggregation) → one equi-join back on
    ``(key, bucket)`` → for ``locf`` one window per key ordered by bucket
    (``last(col, ignorenulls)`` over the preceding frame).  The join and
    the window hash-partition on the SAME key columns, so the exchange is
    reused; state per key is bounded by its bucket span.
    """
    if method not in ("locf", "zero", "null"):
        raise ValueError(f"method must be locf/zero/null, got {method!r}")
    if granularity not in GRANULARITIES:
        raise ValueError(
            f"unknown granularity {granularity!r}; pick from {GRANULARITIES}"
        )
    from pyspark.sql import Window

    step = {"hour": "interval 1 hour", "day": "interval 1 day",
            "week": "interval 7 days", "month": "interval 1 month",
            "year": "interval 1 year"}[granularity]
    spans = rollup.groupBy(*key_cols).agg(
        F.min("bucket").alias("_first"), F.max("bucket").alias("_last")
    )
    dense = spans.select(
        *key_cols,
        F.explode(
            F.expr(f"sequence(_first, _last, {step})")
        ).alias("bucket"),
    )
    # the marker rides the rollup side of the left join: a synthesized row
    # is one with no join partner — NOT one whose first fill column is
    # NULL (a real bucket may legitimately carry NULL aggregates)
    joined = dense.join(
        rollup.withColumn("_present", F.lit(True)),
        [*key_cols, "bucket"],
        "left",
    ).withColumn("filled", F.col("_present").isNull())
    if method == "zero":
        # fill ONLY the synthesized rows: a REAL bucket may legitimately
        # carry NULL aggregates (every event's value NULL that hour) and
        # coalescing those to 0 made them indistinguishable from an
        # observed zero — exactly the distinction the _present marker
        # exists to keep
        filled = joined.select(
            *key_cols, "bucket", "filled",
            *[
                F.when(F.col("filled"), F.lit(0)).otherwise(F.col(c)).alias(c)
                for c in fill_cols
            ],
        )
    elif method == "null":
        filled = joined.select(*key_cols, "bucket", "filled", *fill_cols)
    else:
        w = (
            Window.partitionBy(*key_cols)
            .orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        # LOCF carries the last REAL row's value — NULL included: the
        # struct wrapper is non-null for every present row, so a real
        # NULL aggregate is carried as NULL instead of being skipped
        # for an older non-null value
        filled = joined.select(
            *key_cols, "bucket", "filled",
            *[
                F.last(
                    F.when(F.col("_present"), F.struct(F.col(c).alias("v"))),
                    ignorenulls=True,
                ).over(w)["v"].alias(c)
                for c in fill_cols
            ],
        )
    return filled
