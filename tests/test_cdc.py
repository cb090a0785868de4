"""Snapshot diff / CDC (operators/cdc.py): fingerprints bit-for-bit vs a
pure-Python re-derivation of the canonical-string spec, diff semantics
over both corpus shapes, and the incremental-reprocess slice."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from deidcm_spark.operators.cdc import (
    select_reprocess,
    snapshot_diff,
    snapshot_diff_stats,
    snapshot_fingerprint,
)
from deidcm_spark.schema import DOCUMENTS_SCHEMA

FS, RS, NM = chr(0x1E), chr(0x1F), chr(0x1D)


def _lp(v) -> str:
    # length-prefixed field (injective); NULL is the bare marker
    return NM if v is None else f"{len(v)}:{v}"


def oracle_span_fp(spans) -> str:
    recs = []
    for kind, text, media_ref, offset in spans:
        recs.append(FS.join([_lp(kind), _lp(text), _lp(media_ref), str(offset)]))
    return hashlib.md5(RS.join(recs).encode("utf8")).hexdigest()


def _frame(spark, docs):
    return spark.createDataFrame(
        [(d, [tuple(s) for s in spans]) for d, spans in docs], DOCUMENTS_SCHEMA
    )


@pytest.fixture(scope="module")
def old_frame(spark):
    return _frame(
        spark,
        [
            ("a", [("text", "hello", None, 0), ("media", None, "m/1", 1)]),
            ("b", [("text", "stable doc", None, 0)]),
            ("c", [("text", "will change", None, 0)]),
            ("d", [("text", "will vanish", None, 0)]),
        ],
    )


@pytest.fixture(scope="module")
def new_frame(spark):
    return _frame(
        spark,
        [
            ("a", [("text", "hello", None, 0), ("media", None, "m/1", 1)]),
            ("b", [("text", "stable doc", None, 0)]),
            ("c", [("text", "did change", None, 0)]),
            ("e", [("text", "brand new", None, 0)]),
        ],
    )


def test_span_fingerprint_matches_oracle(spark, old_frame):
    got = {r["doc_id"]: r["fp"] for r in snapshot_fingerprint(old_frame).collect()}
    assert got["a"] == oracle_span_fp(
        [("text", "hello", None, 0), ("media", None, "m/1", 1)]
    )
    assert got["b"] == oracle_span_fp([("text", "stable doc", None, 0)])


def test_fingerprint_sensitivity(spark):
    """Every field of the span-sequence correctness surface flips the fp:
    kind, text, media_ref, offset, order, NULL-vs-empty."""
    base = [("text", "x", None, 0), ("media", None, "m/1", 1)]
    variants = [
        [("attr", "x", None, 0), ("media", None, "m/1", 1)],   # kind
        [("text", "y", None, 0), ("media", None, "m/1", 1)],   # text
        [("text", "x", None, 0), ("media", None, "m/2", 1)],   # media_ref
        [("text", "x", None, 0), ("media", None, "m/1", 2)],   # offset
        [("media", None, "m/1", 1), ("text", "x", None, 0)],   # order
        [("text", "", None, 0), ("media", None, "m/1", 1)],    # NULL vs ''
    ]
    fps = {oracle_span_fp(v) for v in variants}
    assert len(fps) == len(variants)
    assert oracle_span_fp(base) not in fps


def test_fingerprint_injective_on_separator_bytes(spark):
    """Without length prefixes these two DIFFERENT documents produced the
    SAME canonical string (one span whose text embeds
    ``…\\x1e\\x1d\\x1e0\\x1f<record 2>`` concatenates identically to two
    spans) — i.e. a changed snapshot row silently classified unchanged.
    The length-prefixed spec separates them, Spark ≡ oracle on both, and
    texts containing every separator byte round through Spark intact."""
    two = [("text", "x", None, 0), ("text", "y", None, 0)]
    one = [("text", f"x{FS}{NM}{FS}0{RS}text{FS}y", None, 0)]
    nasty = [("text", f"{NM}", None, 0), ("text", f"a{FS}b{RS}c{NM}", "m/1", 1)]
    df = _frame(spark, [("two", two), ("one", one), ("nasty", nasty)])
    got = {r["doc_id"]: r["fp"] for r in snapshot_fingerprint(df).collect()}
    assert got["two"] != got["one"]
    assert got["two"] == oracle_span_fp(two)
    assert got["one"] == oracle_span_fp(one)
    assert got["nasty"] == oracle_span_fp(nasty)
    # flat-text lane: NULL, '', and the bare marker all fingerprint apart
    flat = spark.createDataFrame(
        [(1, None), (2, ""), (3, NM)], "doc_id bigint, text string"
    )
    flat_fps = [r["fp"] for r in snapshot_fingerprint(flat).collect()]
    assert len(set(flat_fps)) == 3


def test_snapshot_diff_frames(spark, old_frame, new_frame):
    got = {
        r["doc_id"]: r["change"]
        for r in snapshot_diff(old_frame, new_frame).collect()
    }
    assert got == {"c": "changed", "d": "removed", "e": "added"}
    with_unchanged = {
        r["doc_id"]: r["change"]
        for r in snapshot_diff(old_frame, new_frame, include_unchanged=True).collect()
    }
    assert with_unchanged["a"] == "unchanged" and with_unchanged["b"] == "unchanged"
    stats = {
        r["change"]: r["n_docs"]
        for r in snapshot_diff_stats(snapshot_diff(old_frame, new_frame)).collect()
    }
    assert stats == {"changed": 1, "removed": 1, "added": 1}


def test_snapshot_diff_flat_text(spark):
    old = spark.createDataFrame(
        [("1", "aaa"), ("2", "bbb"), ("3", None), ("4", "")],
        "doc_id string, text string",
    )
    new = spark.createDataFrame(
        [("1", "aaa"), ("2", "BBB"), ("3", ""), ("5", "eee")],
        "doc_id string, text string",
    )
    got = {r["doc_id"]: r["change"] for r in snapshot_diff(old, new).collect()}
    # NULL -> '' is a change (the null marker), '4' removed, '5' added
    assert got == {"2": "changed", "3": "changed", "4": "removed", "5": "added"}


def test_select_reprocess(spark, old_frame, new_frame):
    diff = snapshot_diff(old_frame, new_frame)
    got = {r["doc_id"] for r in select_reprocess(new_frame, diff).collect()}
    assert got == {"c", "e"}
    # reprocess rows carry the full new-snapshot schema
    assert select_reprocess(new_frame, diff).columns == new_frame.columns


def test_fingerprint_zero_exchange_plan(spark, old_frame):
    """The fingerprint is a projection: no Exchange in its plan."""
    df = snapshot_fingerprint(old_frame)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_fingerprint_spec_tag_and_mixed_version_guard(spark, old_frame):
    """Persisted fingerprint tables carry fp_spec; snapshot_diff refuses a
    spec mismatch and a tag-less pre-v2 table (r4 ADVICE: the v1->v2
    canonical-string change must fail loudly, not reprocess the corpus)."""
    from deidcm_spark.operators.cdc import FP_SPEC

    fp = snapshot_fingerprint(old_frame)
    assert fp.columns == ["doc_id", "fp", "fp_spec"]
    assert {r["fp_spec"] for r in fp.collect()} == {FP_SPEC}

    # fingerprint tables diff directly (both sides tagged, same spec)
    same = snapshot_diff(fp, fp, include_unchanged=True)
    assert {r["change"] for r in same.collect()} == {"unchanged"}

    # spec mismatch → loud error
    v1 = fp.withColumn("fp_spec", F.lit("v1"))
    with pytest.raises(ValueError, match="spec 'v1'"):
        snapshot_diff(v1, fp).collect()
    # tag-less pre-v2 table → loud error
    with pytest.raises(ValueError, match="without an fp_spec"):
        snapshot_diff(fp.drop("fp_spec"), fp).collect()


def test_null_spans_cell_fingerprints_stably(spark, old_frame):
    """Nullability metadata is advisory (joins/UDFs/foreign parquet lose
    it): a NULL spans CELL must fingerprint to a real value — md5(NULL)
    is NULL, and snapshot_diff classified a NULL fp as 'added' on every
    diff forever."""
    nulled = old_frame.withColumn(
        "spans", F.expr("CASE WHEN doc_id = 'd' THEN NULL ELSE spans END")
    )
    fps = {r["doc_id"]: r["fp"] for r in snapshot_fingerprint(nulled).collect()}
    assert all(fp is not None for fp in fps.values())
    # NULL spans ≠ empty spans ≠ any real sequence
    empty = old_frame.withColumn(
        "spans", F.expr("CASE WHEN doc_id = 'd' THEN array() ELSE spans END")
    )
    fps_empty = {r["doc_id"]: r["fp"] for r in snapshot_fingerprint(empty).collect()}
    assert fps["d"] != fps_empty["d"] != fps["a"]
    # a frame diffed against itself is 100% unchanged, not 'added'
    d = snapshot_diff(nulled, nulled, include_unchanged=True)
    assert {r["change"] for r in d.collect()} == {"unchanged"}
    assert snapshot_diff(nulled, nulled).count() == 0
