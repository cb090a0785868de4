"""Round-trip (inverse-function) tests for the rebuild/export lane — the
analogue of the reference's difflib round-trip verification
(df2dicom_verification.py:55-77)."""

import json

import pytest

from deidcm_spark import corpus
from deidcm_spark.export import (
    build_tree,
    decode_value,
    export_corpus,
    flatten_tree,
    render_documents,
)


def _norm(spans):
    return [(s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in sorted(spans, key=lambda x: x["offset"])]


def test_decode_value_typing():
    assert decode_value("X_0x0001_IS_1____", "42") == 42
    assert decode_value("X_0x0001_FD_1____", "3.5") == 3.5
    assert decode_value("X_0x0001_DS_1____", "3.5") == "3.5"
    assert decode_value("X_0x0001_IS_3____", '["1", "2", "3"]') == [1, 2, 3]
    assert decode_value("X_0x0001_OB_1____", "aGVsbG8=") == "aGVsbG8="
    assert decode_value("X_0x0001_LO_1____", "None") is None


def test_round_trip_9_cases():
    for doc in corpus.case_documents():
        rebuilt = flatten_tree(build_tree(doc["spans"]))
        assert _norm(rebuilt) == _norm(doc["spans"]), f"round trip failed for {doc['doc_id']}"


def test_round_trip_with_media_and_empty_seq():
    spans = [
        corpus.text_span(corpus.attr_key("0x00080018", "UI"), "1.2.3", 0),
        {"kind": "text", "text": corpus.seq_base("0x0040A730", "__empty") + "=",
         "media_ref": "", "offset": 1},
        corpus.media_span("m_1", 2),
        corpus.text_span(corpus.attr_key("0x00201002", "IS"), "7", 3),
    ]
    rebuilt = flatten_tree(build_tree(spans))
    assert _norm(rebuilt) == _norm(spans)


def test_round_trip_nested_sequences():
    import random
    rng = random.Random(3)
    spans = corpus.dummy_sequence_spans("0x0040A730", rng, 0)
    spans += corpus.dummy_sequence_spans("0x00081072", rng, len(spans))
    rebuilt = flatten_tree(build_tree(spans))
    assert _norm(rebuilt) == _norm(spans)


def test_render_documents_deterministic_json(spark):
    df = corpus.case_documents_df(spark)
    r1 = {r["doc_id"]: r["rendered"] for r in render_documents(df).collect()}
    r2 = {r["doc_id"]: r["rendered"] for r in render_documents(df).collect()}
    assert r1 == r2
    tree = json.loads(r1["case_1"])
    # nested sequence rebuilt with @1 item and decoded children
    seq_key = [k for k in tree if "0x0040a730" in k]
    assert seq_key and "@1" in tree[seq_key[0]]


def test_export_corpus_sinks(spark, tmp_path):
    df = corpus.synth_documents(spark, 30, seed=2, media_rate=0.3)
    out = str(tmp_path / "export")
    export_corpus(df, out)
    rendered = spark.read.json(f"{out}/rendered")
    assert rendered.count() == 30
    meta = spark.read.option("header", True).csv(f"{out}/meta")
    assert meta.count() == 30
    assert set(meta.columns) == {"doc_id", "n_spans", "n_media"}


def test_tree_roundtrip_with_duplicate_keys():
    """The synthetic corpus draws tags with replacement, so one document
    can carry the same attribute key twice.  build_tree must preserve
    BOTH (the old last-wins dict assignment silently dropped spans from
    the rendered doc), and the flatten round-trip must regenerate them."""
    from deidcm_spark.export import build_tree, flatten_tree

    key = "PatientAge_0x00101010_IS_1____"
    spans = [
        {"kind": "text", "text": f"{key}=30", "media_ref": "", "offset": 0},
        {"kind": "text", "text": "Other_0x00100020_LO_1____=x", "media_ref": "", "offset": 1},
        {"kind": "text", "text": f"{key}=45", "media_ref": "", "offset": 2},
    ]
    tree = build_tree(spans)
    back = flatten_tree(tree)
    assert back == spans  # nothing lost, offsets and order preserved
    import json
    rendered = json.dumps(tree, sort_keys=True)
    assert rendered.count("0x00101010") == 2
