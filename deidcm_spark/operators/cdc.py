"""Corpus snapshot diff (change data capture) and incremental
reprocessing.

A continuously-recrawled 100 TB corpus is re-snapshotted, not
re-created: between snapshot T and T+1 almost every document is
byte-identical, and the downstream pipeline (extract → deid → dedup →
pack) should touch ONLY the delta.  This module computes that delta:

* :func:`snapshot_fingerprint` — one deterministic md5 per document,
  in-row (zero shuffles).  For interleaved corpus frames the
  fingerprint covers the FULL span-sequence correctness surface in
  order — kind, text, media_ref, offset per span (the same per-row
  invariant the north rule checks) — so any span-level change flips it.
  For flat text corpora it covers the text column.
* :func:`snapshot_diff` — full outer join of two fingerprinted
  snapshots on doc_id → ``(doc_id, change, fp_old, fp_new)`` with
  change ∈ {added, removed, changed} (unchanged rows are dropped by
  default; they are the ~100 TB that must NOT flow downstream).
* :func:`select_reprocess` — the new-snapshot rows the pipeline must
  actually process (added + changed), as a left-semi join; removed
  doc_ids are served by anti-join at read time (parquet is immutable —
  the same no-in-place-delete stance as ``maintenance.py``).

Scale notes: the fingerprint is a projection; the diff is ONE shuffle
per side on doc_id — and zero-exchange when both snapshots are written
doc_id-bucketed (``sources.write_bucketed`` / ``register_bucketed``),
the layout the deid lane already maintains.  Deterministic: md5 only,
no wall-clock.

Canonical string spec (shared with the pure-Python oracle in
tests/test_cdc.py): spans are joined in ARRAY ORDER (span order is the
correctness surface; the array is never re-sorted) as
``kind \\x1e text \\x1e media_ref \\x1e offset``, records joined by
``\\x1f``.  Every variable-length field is LENGTH-PREFIXED
(``len:value``, char length) and NULL is the bare ``\\x1d`` marker —
the prefix makes the encoding INJECTIVE: without it a span text
containing the separator bytes could make two different span sequences
produce the same canonical string (one span embedding
``…\\x1f<next record>`` is indistinguishable from two spans), i.e. a
changed document silently classified unchanged and dropped from the
reprocess slice.  A bare marker can't be confused with a prefixed
value (prefixes start with a digit), and the offset field is all
digits, so the string parses back unambiguously left to right.

FORMAT VERSION: ``v2`` (:data:`FP_SPEC`).  v1 (pre-r4) used unprefixed
fields and a plain-NULL kind — sound-looking but non-injective; the
r4 fix CHANGED every fingerprint value.  The break is silent at the
byte level (both are 32-hex md5), so persisted fingerprint tables MUST
carry their spec tag: :func:`snapshot_fingerprint` stamps an ``fp_spec``
column, and :func:`snapshot_diff` refuses to diff snapshots whose specs
differ — a mixed-version diff would otherwise flag ~100 % of the corpus
as changed and silently reprocess all of it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# raw control characters interpolated directly into the SQL text (no
# backslash escapes — the two-dialect literal-eating gotcha in CLAUDE.md)
_FS = chr(0x1E)  # field separator inside one span
_RS = chr(0x1F)  # record separator between spans
_NULLMARK = chr(0x1D)  # distinguishes NULL from empty string


def _nullsafe(field: str) -> str:
    """Length-prefixed (injective) encoding; NULL is the bare marker."""
    return (
        f"CASE WHEN {field} IS NULL THEN '{_NULLMARK}' "
        f"ELSE concat(cast(length({field}) as string), ':', {field}) END"
    )


def span_fingerprint_expr(spans_col: str = "spans") -> str:
    """SQL expression: md5 over the ordered span sequence (see module
    docstring for the canonical string spec)."""
    rec = (
        f"concat_ws('{_FS}', {_nullsafe('s.kind')}, {_nullsafe('s.text')}, "
        f"{_nullsafe('s.media_ref')}, cast(s.offset as string))"
    )
    # a NULL spans CELL (nullability metadata is advisory — joins/UDFs and
    # foreign parquet lose it) must fingerprint to a real value: md5(NULL)
    # is NULL, and snapshot_diff classifies a NULL fp as 'added' on every
    # diff forever.  The bare marker cannot collide: every real record
    # contains a field separator, and an empty array joins to ''.
    # Spec-compatible with v2 (non-NULL spans hash unchanged).
    return (
        f"md5(CASE WHEN {spans_col} IS NULL THEN '{_NULLMARK}' "
        f"ELSE array_join(transform({spans_col}, s -> {rec}), '{_RS}') END)"
    )


# canonical-string spec version stamped into every fingerprint table; bump
# whenever the encoding changes (v1 = unprefixed/non-injective, pre-r4)
FP_SPEC = "v2"


def snapshot_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, fp, fp_spec): one md5 per document, computed in-row.

    Corpus frames (a ``spans`` column) fingerprint the full ordered span
    sequence; flat corpora fingerprint ``text_col`` (NULL text gets the
    ``\\x1d`` marker so NULL ≠ '').  ``fp_spec`` tags the canonical-string
    version so PERSISTED fingerprint tables from different builds can never
    be silently diffed across an encoding change (see module docstring)."""
    if "spans" in df.columns:
        fp = F.expr(span_fingerprint_expr("spans"))
    else:
        fp = F.expr(f"md5({_nullsafe(text_col)})")
    return df.select("doc_id", fp.alias("fp"), F.lit(FP_SPEC).alias("fp_spec"))


def _as_fingerprints(df: DataFrame, text_col: str, side: str) -> DataFrame:
    """Raw snapshot → fingerprint it; pre-fingerprinted table → verify its
    spec tag matches this build's encoding (one ``first()`` probe — tables
    are written by a single build, so a per-row sweep adds nothing)."""
    if "fp" not in df.columns:
        return snapshot_fingerprint(df, text_col)
    if "fp_spec" not in df.columns:
        raise ValueError(
            f"{side} snapshot is a fingerprint table without an fp_spec "
            f"column (pre-v2 build?) — re-fingerprint it; a mixed-version "
            f"diff would flag the whole corpus as changed"
        )
    head = df.select("fp_spec").first()
    if head is not None and head["fp_spec"] != FP_SPEC:
        raise ValueError(
            f"{side} snapshot fingerprints are spec {head['fp_spec']!r} but "
            f"this build computes {FP_SPEC!r} — re-fingerprint before "
            f"diffing (values are not comparable across encodings)"
        )
    return df.select("doc_id", "fp", "fp_spec")


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    text_col: str = "text",
    include_unchanged: bool = False,
) -> DataFrame:
    """Two snapshots → ``(doc_id, change, fp_old, fp_new)``.

    Each side may be a RAW snapshot (fingerprinted here) or an already
    persisted :func:`snapshot_fingerprint` table — the latter must carry a
    matching ``fp_spec`` tag (guard against silently diffing across the
    v1→v2 encoding change; see module docstring).

    change ∈ {'added', 'removed', 'changed'} (plus 'unchanged' when
    ``include_unchanged`` — off by default: at snapshot cadence the
    unchanged mass IS the corpus and must not leave this operator)."""
    o = _as_fingerprints(old, text_col, "old").withColumnRenamed(
        "fp", "fp_old").drop("fp_spec")
    n = _as_fingerprints(new, text_col, "new").withColumnRenamed(
        "fp", "fp_new").drop("fp_spec")
    j = o.join(n, "doc_id", "full_outer")
    change = (
        F.when(F.col("fp_old").isNull(), F.lit("added"))
        .when(F.col("fp_new").isNull(), F.lit("removed"))
        .when(F.col("fp_old") != F.col("fp_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = j.select("doc_id", change.alias("change"), "fp_old", "fp_new")
    if not include_unchanged:
        out = out.filter(F.col("change") != "unchanged")
    return out


def snapshot_diff_stats(diff: DataFrame) -> DataFrame:
    """(change, n_docs): one aggregation over the (already small) delta."""
    return diff.groupBy("change").agg(F.count("*").alias("n_docs"))


def select_reprocess(new: DataFrame, diff: DataFrame) -> DataFrame:
    """The new-snapshot rows the pipeline must process: added + changed,
    via left-semi join (the delta side is small → AQE broadcasts it;
    no hint forced, per the select_token_budget lesson)."""
    ids = diff.filter(F.col("change").isin("added", "changed")).select("doc_id")
    return new.join(ids, "doc_id", "left_semi")
