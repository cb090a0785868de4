"""As-of join — an operator Spark's DataFrame API lacks natively.

For each left row, attach the LATEST right row whose timestamp is <= the
left row's timestamp within the same key (the standard time-series
"last known value" join; DuckDB spells it ``ASOF LEFT JOIN``, which is
exactly the oracle the contract query runs against).

THE SCALE SHAPE: a naive implementation is a range join
(``l.key = r.key AND r.ts <= l.ts`` + a per-row max), which Spark plans
as a broadcast-nested-loop or an exploding theta join.  The distributed
shape used here is UNION + WINDOW:

1. tag right rows 0 and left rows 1, union them into one stream;
2. one window ``partitionBy(key).orderBy(ts, side, seq)`` carries the
   last non-null right payload forward (``last(..., ignorenulls=True)``);
3. keep the left rows.

One shuffle on the key, sorted once, zero joins — the merge-sorted
single-pass an as-of join is supposed to be.  Ties (right.ts == left.ts)
sort the right row first, so an exactly-simultaneous right row IS
visible to the left row, matching ASOF's ``>=``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    payload_cols: list[str],
    seq_col: str | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: ``left`` keeps all its columns; each payload column
    ``c`` of ``right`` arrives as ``{prefix}{c}`` from the latest right row
    with ``right.ts <= left.ts`` and equal ``key`` (null when none).

    ``seq_col``: a right-side column that makes ordering deterministic
    when two right rows share (key, ts) — the LARGEST seq wins, mirroring
    "latest record" semantics.  Without it, equal-ts right rows are
    engine-order nondeterministic (same caveat as DuckDB's ASOF).
    """
    left_cols = left.columns
    tag_left = left.withColumn("_side", F.lit(1))
    for c in payload_cols:
        tag_left = tag_left.withColumn(f"_p_{c}", F.lit(None).cast(right.schema[c].dataType))
    tag_right = right.select(
        F.col(key),
        F.col(ts),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_p_{c}") for c in payload_cols],
    )
    for c in left_cols:
        if c not in (key, ts):
            tag_right = tag_right.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    merged = tag_left.select(
        *left_cols, "_side", *[f"_p_{c}" for c in payload_cols]
    ).unionByName(
        tag_right.select(*left_cols, "_side", *[f"_p_{c}" for c in payload_cols])
    )
    order = [F.col(ts).asc(), F.col("_side").asc()]
    if seq_col is not None:
        # right rows carry seq in their payload; left rows are null there —
        # asc_nulls_last keeps left rows after right rows at equal ts
        order.append(F.col(f"_p_{seq_col}").asc_nulls_last())
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.select(
        *left_cols,
        "_side",
        *[
            F.last(f"_p_{c}", ignorenulls=True).over(w).alias(f"{prefix}{c}")
            for c in payload_cols
        ],
    )
    return carried.filter(F.col("_side") == 1).drop("_side")
