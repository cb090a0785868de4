"""Range (interval) join — the second temporal-join operator Spark's
DataFrame API lacks natively (the as-of join is ``operators/asof.py``).

For each *point* row, attach every *interval* row with the same key whose
``[start, end]`` range contains the point (inclusive on both ends) — the
"which error windows was this click inside" join.

THE SCALE SHAPE: written directly (``p.key = i.key AND i.start <= p.x
AND p.x <= i.end``) Spark plans the inequality pair as a
BroadcastNestedLoopJoin or an exploding theta join — per-key cartesian
work that dies on hot keys.  The distributed shape used here is BINNING:

1. pick a bin width ``B`` (callers size it near the maximum interval
   width); every point falls in exactly one bin ``floor(x / B)``;
2. every interval is exploded to the bins it overlaps,
   ``sequence(floor(start/B), floor(end/B))`` — when ``B`` >= the
   interval width that is at most 2 rows per interval;
3. equi-join on ``(key, bin)`` — a plain shuffled hash/sort-merge join
   Catalyst can plan, partition, and AQE-skew-split — then apply the
   containment predicate as a post-join filter.

Each matching (point, interval) pair appears EXACTLY once: the point
lives in one bin, and the interval's exploded bin list is distinct — no
dedup pass needed.  Cost is explicit and tunable: shuffle volume is
``|points| + |intervals| * ceil(width/B + 1)`` rows, never ``|points| *
|intervals|``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    key: str,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_width: int,
    how: str = "inner",
) -> DataFrame:
    """Binned range join: rows of ``points`` paired with every row of
    ``intervals`` sharing ``key`` where ``start_col <= point_col <=
    end_col`` (both inclusive).

    ``point_col`` / ``start_col`` / ``end_col`` are integral columns in
    one domain (e.g. ``unix_micros`` timestamps — exact, unlike double
    epoch seconds which can disagree across engines at the boundary).
    ``bin_width`` must be positive; size it near the LARGEST interval
    width so the per-interval explode factor stays ~2 (an interval
    spanning ``w`` units emits ``floor(end/B) - floor(start/B) + 1``
    rows).  Output = all point columns + all interval columns except the
    duplicated key (callers alias collisions beforehand).

    ``how="left"`` keeps unmatched points with NULL interval columns
    (implemented as the same equi-join per bin, then an outer
    re-attach of never-matched points — still no theta join).
    """
    if bin_width <= 0:
        raise ValueError(f"bin_width must be positive, got {bin_width}")
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")

    b = F.lit(bin_width).cast("long")
    pts = points.withColumn("_bin", F.floor(F.col(point_col) / b))
    ivs = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / b), F.floor(F.col(end_col) / b)
            )
        ),
    )
    matched = (
        pts.join(ivs, on=[key, "_bin"], how="inner")
        .filter(
            (F.col(start_col) <= F.col(point_col))
            & (F.col(point_col) <= F.col(end_col))
        )
        .drop("_bin")
    )
    if how == "inner":
        return matched
    # left: re-attach points that matched nothing (anti join on the point
    # side's full column identity is wasteful — an aggregate of matched
    # point keys is enough when the caller guarantees a unique point id;
    # without that guarantee the safe distributed form is a left join of
    # points against the per-(key, point) matched marker)
    marker = matched.select(key, point_col).distinct().withColumn(
        "_matched", F.lit(1)
    )
    unmatched = (
        points.join(marker, on=[key, point_col], how="left")
        .filter(F.col("_matched").isNull())
        .drop("_matched")
    )
    iv_cols = [c for c in matched.columns if c not in points.columns]
    for c in iv_cols:
        unmatched = unmatched.withColumn(
            c, F.lit(None).cast(matched.schema[c].dataType)
        )
    return matched.unionByName(unmatched.select(*matched.columns))
