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
   last right PAYLOAD STRUCT forward (``last(..., ignorenulls=True)``
   over one struct column — never per payload column, which would tear
   rows whenever the latest right row holds a NULL in one payload
   column while an older row doesn't);
3. keep the left rows and expand the struct.

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

    ``seq_col``: a right-side column (need not be in ``payload_cols``)
    that makes ordering deterministic when two right rows share
    (key, ts) — the LARGEST seq wins, mirroring "latest record"
    semantics.  Without it, equal-ts right rows are engine-order
    nondeterministic (same caveat as DuckDB's ASOF).

    All ``payload_cols`` come from the SAME (latest) right row: the
    payload travels as one struct, so a NULL in one payload column of
    the latest row stays NULL instead of leaking the previous row's
    value (DuckDB ASOF parity on nullable payloads).
    """
    from pyspark.sql import types as T

    left_cols = left.columns
    struct_cols = list(payload_cols)
    if seq_col is not None and seq_col not in struct_cols:
        struct_cols.append(seq_col)
    p_type = T.StructType(
        [T.StructField(c, right.schema[c].dataType, True) for c in struct_cols]
    )
    for internal in ("_side", "_p", "_pc"):
        if internal in left_cols:
            raise ValueError(
                f"left frame carries the reserved internal column "
                f"{internal!r} — rename it before asof_join"
            )
    clashes = [c for c in payload_cols if f"{prefix}{c}" in left_cols]
    if clashes:
        raise ValueError(
            f"output column(s) {[prefix + c for c in clashes]} already "
            f"exist on the left frame — pick another prefix"
        )
    tag_left = (
        left.withColumn("_side", F.lit(1))
        .withColumn("_p", F.lit(None).cast(p_type))
    )
    # DuckDB-ASOF parity on NULLs (the documented oracle semantics):
    # a right row with NULL ts never matches (ts >= NULL is never true —
    # unfiltered it sorts FIRST under asc and leaks its payload into every
    # left row), and NULL keys never join (NULL = NULL is not a match —
    # partitionBy would otherwise group all null-key rows together)
    tag_right = right.filter(
        F.col(ts).isNotNull() & F.col(key).isNotNull()
    ).select(
        F.col(key),
        F.col(ts),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c).alias(c) for c in struct_cols]).alias("_p"),
    )
    for c in left_cols:
        if c not in (key, ts):
            tag_right = tag_right.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    merged = tag_left.select(*left_cols, "_side", "_p").unionByName(
        tag_right.select(*left_cols, "_side", "_p")
    )
    order = [F.col(ts).asc(), F.col("_side").asc()]
    if seq_col is not None:
        # right rows carry seq inside the struct; left rows have a null
        # struct — asc_nulls_last keeps left rows after right rows at
        # equal ts
        order.append(F.col("_p").getField(seq_col).asc_nulls_last())
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.select(
        *left_cols,
        "_side",
        F.last("_p", ignorenulls=True).over(w).alias("_pc"),
    )
    return carried.filter(F.col("_side") == 1).select(
        *left_cols,
        *[F.col("_pc").getField(c).alias(f"{prefix}{c}") for c in payload_cols],
    )
