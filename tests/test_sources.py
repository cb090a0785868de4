"""Raw-file source + projection-flag tests (P1/S1/S2 analogues) and the
date-offset pseudonymization mode."""

import os

from deidcm_spark import corpus
from deidcm_spark.operators.deidentify import deidentify_attributes
from deidcm_spark.oracle import deidentify_corpus_oracle
from deidcm_spark.sources import filter_spans, read_raw_documents


def test_read_raw_documents(spark, tmp_path):
    d = tmp_path / "raw"
    d.mkdir()
    (d / "doc_a.spans").write_text(
        "SOPInstanceUID_0x00080018_UI_1____=1.2.3\n"
        "StudyDate_0x00080020_DA_1____=20230101\n"
        "media:m_42\n"
    )
    (d / "doc_b.spans").write_text("PatientName_0x00100010_PN_1____=X Y\n")
    df = read_raw_documents(spark, str(d))
    rows = {r["doc_id"]: r["spans"] for r in df.collect()}
    assert set(rows) == {"doc_a", "doc_b"}
    a = rows["doc_a"]
    assert [s["kind"] for s in a] == ["text", "text", "media"]
    assert a[2]["media_ref"] == "m_42"
    assert a[0]["offset"] == 0 and a[2]["offset"] == 2
    # parsed corpus runs straight through the pipeline
    out = deidentify_attributes(df, "9.9.9.9.9", "s")
    assert out.count() == 2


def test_filter_spans_flags(spark):
    docs = [{
        "doc_id": "d",
        "spans": [
            {"kind": "text", "text": "A_0x00080018_UI_1____=1", "media_ref": "", "offset": 0},
            {"kind": "text", "text": "B_0x00090010_LO_1____=priv", "media_ref": "", "offset": 1},
            {"kind": "text", "text": "S_0x0040a730_SQ_1____@1.C_0x00080100_SH_1____=x",
             "media_ref": "", "offset": 2},
            {"kind": "media", "text": "", "media_ref": "m1", "offset": 3},
        ],
    }]
    from deidcm_spark.schema import DOCUMENTS_SCHEMA

    df = spark.createDataFrame(docs, DOCUMENTS_SCHEMA)

    def texts(out):
        return [(s["kind"], s["text"]) for s in out.collect()[0]["spans"]]

    default = texts(filter_spans(df))  # drop private only
    assert ("text", "B_0x00090010_LO_1____=priv") not in default
    assert len(default) == 3

    no_seq = texts(filter_spans(df, with_private=True, with_seqs=False))
    assert all("@" not in t for _, t in no_seq)
    assert len(no_seq) == 3

    no_media = texts(filter_spans(df, with_private=True, with_media=False))
    assert all(k != "media" for k, _ in no_media)

    everything = texts(filter_spans(df, with_private=True))
    assert len(everything) == 4


def test_date_offset_mode_matches_oracle(spark):
    docs = corpus.case_documents()
    from deidcm_spark.schema import DOCUMENTS_SCHEMA

    df = spark.createDataFrame(docs, DOCUMENTS_SCHEMA)
    out = deidentify_attributes(df, "9.9.9.9.9", "s", date_mode="offset", date_offset=56)
    got = {
        r["doc_id"]: [(s["kind"], s["text"]) for s in
                      sorted(r.asDict(recursive=True)["spans"], key=lambda s: s["offset"])]
        for r in out.collect()
    }
    from deidcm_spark.oracle import deidentify_doc_oracle

    want = {
        d["doc_id"]: [(s["kind"], s["text"]) for s in
                      sorted(deidentify_doc_oracle(d["doc_id"], d["spans"], "9.9.9.9.9", "s",
                                                   "offset", 56), key=lambda s: s["offset"])]
        for d in docs
    }
    assert got == want
    # dates actually shifted (offset mode), not coarsened to YYYY0101
    moved = [t.partition("=")[2] for _, t in got["case_2"] if "_DA_" in t]
    assert moved and any(not v.endswith("0101") for v in moved)
