"""Arrow-native deid kernel vs the pandas-UDF reference implementation:
span-for-span equality (kind, text, media_ref, offset, order) plus counter
equality on every corpus shape we have — synthetic skewed corpora (media
mixed in), the 9 recipe cases, the ingested driver table, both date modes,
and passthrough columns."""

import pytest

from pyspark.sql import functions as F

from deidcm_spark.corpus import case_documents_df, synth_documents
from deidcm_spark.ingest import documents_to_spans
from deidcm_spark.operators.deidentify import deidentify_attributes

ORG = "9.9.9.9.9"


def _canon(df):
    rows = df.collect()
    out = {}
    for r in rows:
        d = r.asDict()
        spans = [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in d.pop("spans")
        ]
        out[d.pop("doc_id")] = (spans, tuple(sorted(d.items())))
    return out


def _assert_impls_equal(docs, **kw):
    a = _canon(deidentify_attributes(docs, ORG, "s1", impl="arrow", **kw))
    p = _canon(deidentify_attributes(docs, ORG, "s1", impl="pandas", **kw))
    assert set(a) == set(p)
    for doc_id in p:
        assert a[doc_id] == p[doc_id], f"doc {doc_id}"


def test_arrow_equals_pandas_synth(spark):
    docs = synth_documents(spark, 400, seed=31, media_rate=0.25, skew=0.05)
    _assert_impls_equal(docs, with_metrics=True)


def test_arrow_equals_pandas_recipe_cases(spark):
    _assert_impls_equal(case_documents_df(spark), with_metrics=True)


def test_arrow_equals_pandas_ingested(spark):
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    _assert_impls_equal(documents_to_spans(d), with_metrics=True)


def test_arrow_equals_pandas_offset_mode(spark):
    docs = synth_documents(spark, 150, seed=7, media_rate=0.1)
    _assert_impls_equal(
        docs, with_metrics=True, date_mode="offset", date_offset=365
    )


def test_arrow_passthrough_columns(spark):
    docs = synth_documents(spark, 100, seed=3).withColumn(
        "bucket", (F.xxhash64("doc_id") % 8).cast("int")
    )
    _assert_impls_equal(docs, with_metrics=False)


def test_arrow_empty_spans_doc(spark):
    # a document with zero spans still gains the marker (offset 0)
    import pandas as pd

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": ["empty1"], "spans": [[]]}),
        schema="doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    _assert_impls_equal(docs, with_metrics=True)
    out = deidentify_attributes(docs, ORG, "s1", impl="arrow").collect()
    assert [tuple(s) for s in out[0]["spans"]] == [
        ("text", "PatientIdentityRemoved_0x00120062_CS_1____=YES", "", 0)
    ]


def test_arrow_rejects_unknown_impl(spark):
    docs = synth_documents(spark, 5, seed=1)
    with pytest.raises(ValueError):
        deidentify_attributes(docs, ORG, "s1", impl="rdd")


def test_arrow_giant_and_empty_docs_mixed(spark):
    """Hot-study shape: one 20k-span document among empties and normal docs
    — segment reductions (offsets, counters, marker placement) must hold at
    both extremes within one Arrow batch."""
    import pandas as pd

    from deidcm_spark.corpus import synth_documents

    normal = synth_documents(spark, 30, seed=11, media_rate=0.2)
    giant_spans = [
        {
            "kind": "text",
            "text": f"PatientName_0x00100010_PN_1____=HOT^{i}",
            "media_ref": "",
            "offset": i,
        }
        for i in range(20_000)
    ]
    extremes = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": ["giant", "empty_a", "empty_b"],
             "spans": [giant_spans, [], []]}
        ),
        schema=normal.schema,
    )
    docs = normal.unionByName(extremes)
    _assert_impls_equal(docs, with_metrics=True)
    out = {
        r["doc_id"]: r
        for r in deidentify_attributes(docs, ORG, "s1", with_metrics=True).collect()
    }
    g = out["giant"]
    assert g["n_pseudonymized"] == 20_000
    assert g["spans"][-1]["text"].endswith("=YES")
    assert g["spans"][-1]["offset"] == 20_000
    # one attr_key shared by all 20k spans → ONE deterministic replacement
    # (keyed on salt+doc_id+attr_key; parity with the pandas impl asserted
    # above by _assert_impls_equal)
    from deidcm_spark.kernels import patient_name

    texts = {s["text"] for s in g["spans"][:-1]}
    assert texts == {
        "PatientName_0x00100010_PN_1____="
        + patient_name("s1", "giant", "PatientName_0x00100010_PN_1____")
    }
    for d in ("empty_a", "empty_b"):
        assert [s["offset"] for s in out[d]["spans"]] == [0]


def test_record_batch_slice_and_empty_paths():
    """Drive deidentify_record_batch directly on a SLICED batch (non-zero
    Arrow offsets — the normalization path Spark may or may not exercise)
    and on an empty batch."""
    import pyarrow as pa

    from deidcm_spark.operators.deidentify_arrow import deidentify_record_batch

    span_t = pa.struct([
        ("kind", pa.string()), ("text", pa.string()),
        ("media_ref", pa.string()), ("offset", pa.int32()),
    ])
    docs = []
    for i in range(5):
        docs.append([
            {"kind": "text", "text": f"StudyDate_0x00080020_DA_1____=2021050{i}",
             "media_ref": "", "offset": 0},
            {"kind": "media", "text": "", "media_ref": f"m{i}", "offset": 1},
        ])
    batch = pa.RecordBatch.from_arrays(
        [pa.array([f"d{i}" for i in range(5)]), pa.array(docs, pa.list_(span_t))],
        names=["doc_id", "spans"],
    )

    def rows(b):
        out = deidentify_record_batch(b, "9.9", "s")
        return out.to_pylist()

    full = rows(batch)
    sliced = rows(batch.slice(2, 2))
    assert sliced == full[2:4]
    assert sliced[0]["spans"][0]["text"] == "StudyDate_0x00080020_DA_1____=20210101"
    assert sliced[0]["spans"][1]["media_ref"] == "m2"
    assert sliced[0]["spans"][2]["text"].endswith("=YES")

    empty = rows(batch.slice(0, 0))
    assert empty == []
