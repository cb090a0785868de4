"""Cross-syntax ingest invariance: the SAME document stored under every
supported transfer syntax must ingest (``sources.read_dcm_documents``, the
dicom2df analogue) to identical dataset spans and identical pixel payload —
only the meta group's TransferSyntaxUID cell may differ.

This is the Spark-level counterpart of the per-codec round-trip tests: it
proves the distributed binary source is syntax-agnostic, exactly like the
reference's pydicom-backed walk (deidcm/dicom/dicom2df.py:72-90), where
the transfer syntax is a storage detail the DataFrame never sees.
"""

import struct

from deidcm_spark.dcm import (
    TRANSFER_SYNTAX_DEFLATED_LE,
    TRANSFER_SYNTAX_EXPLICIT_BE,
    TRANSFER_SYNTAX_EXPLICIT_LE,
    TRANSFER_SYNTAX_IMPLICIT_LE,
    TRANSFER_SYNTAX_JPEG_LL_SV1,
    TRANSFER_SYNTAX_RLE,
    encode_part10,
)

SYNTAXES = [
    TRANSFER_SYNTAX_EXPLICIT_LE,
    TRANSFER_SYNTAX_IMPLICIT_LE,
    TRANSFER_SYNTAX_DEFLATED_LE,
    TRANSFER_SYNTAX_EXPLICIT_BE,
    TRANSFER_SYNTAX_RLE,
    TRANSFER_SYNTAX_JPEG_LL_SV1,
]


def _doc(ts: str):
    spans = [
        {"kind": "text",
         "text": f"TransferSyntaxUID_0x00020010_UI_1____={ts}",
         "media_ref": "", "offset": 0},
        {"kind": "text", "text": "SOPInstanceUID_0x00080018_UI_1____=4.4.4",
         "media_ref": "", "offset": 1},
        {"kind": "text", "text": "PatientName_0x00100010_PN_1____=DOE^JANE",
         "media_ref": "", "offset": 2},
        {"kind": "text", "text": "SamplesPerPixel_0x00280002_US_1____=1",
         "media_ref": "", "offset": 3},
        {"kind": "text", "text": "Rows_0x00280010_US_1____=8",
         "media_ref": "", "offset": 4},
        {"kind": "text", "text": "Columns_0x00280011_US_1____=16",
         "media_ref": "", "offset": 5},
        {"kind": "text", "text": "BitsAllocated_0x00280100_US_1____=16",
         "media_ref": "", "offset": 6},
        # an SQ the implicit-VR rule table KNOWS (unknown tags resolve
        # to UN under implicit VR — correct, but not syntax-invariant)
        {"kind": "text",
         "text": ("InstitutionCodeSequence_0x00080082_SQ_1____@1."
                  "Rows_0x00280010_US_1____=7"),
         "media_ref": "", "offset": 7},
        {"kind": "media", "text": "", "media_ref": "m/0", "offset": 8},
    ]
    pix = b"".join(struct.pack("<H", (i * 2654435761) % 65536)
                   for i in range(16 * 8))
    payload = {"width": 16, "height": 8, "channels": 1, "bits": 16,
               "pixels": pix}
    return spans, payload


def test_every_syntax_ingests_identically(spark, tmp_path):
    from deidcm_spark.sources import read_dcm_documents

    out_dir = tmp_path / "tree"
    out_dir.mkdir()
    expected_pix = None
    for i, ts in enumerate(SYNTAXES):
        spans, payload = _doc(ts)
        expected_pix = payload["pixels"]
        (out_dir / f"doc_{i}.dcm").write_bytes(encode_part10(spans, payload))

    back = read_dcm_documents(spark, str(out_dir)).collect()
    assert len(back) == len(SYNTAXES)

    def dataset_texts(row):
        # drop the meta group (the TransferSyntaxUID cell legitimately
        # differs per file); everything else must be identical
        return [s["text"] for s in row["spans"]
                if s["kind"] == "text" and "_0x0002" not in
                s["text"].split("=", 1)[0].split(".")[0]]

    rows = sorted(back, key=lambda r: r["doc_id"])
    baseline = dataset_texts(rows[0])
    assert any("PatientName" in t for t in baseline)
    assert any("InstitutionCodeSequence_0x00080082_SQ" in t for t in baseline)
    for row in rows[1:]:
        assert dataset_texts(row) == baseline, row["doc_id"]
    for row in rows:
        assert bytes(row["pixels"]) == expected_pix, row["doc_id"]
        assert (row["width"], row["height"], row["bits"]) == (16, 8, 16)
    # and the declared syntax really is what each file stores
    uids = set()
    for row in rows:
        for s in row["spans"]:
            if "_0x00020010_" in s["text"]:
                uids.add(s["text"].split("=", 1)[1])
    assert uids == set(SYNTAXES)


def test_transcode_on_export(spark, tmp_path):
    """The distributed transcode job: ingest a MIXED-syntax archive, export
    with ``transfer_syntax=`` override → every output file is Explicit VR
    LE with identical dataset spans and pixels (pydicom equivalent:
    rewriting ``file_meta.TransferSyntaxUID`` before ``save_as``)."""
    from deidcm_spark.dcm import export_dcm, parse_part10
    from deidcm_spark.sources import (
        documents_view,
        payloads_view,
        read_dcm_documents,
    )

    src_dir = tmp_path / "mixed"
    src_dir.mkdir()
    for i, ts in enumerate(SYNTAXES):
        spans, payload = _doc(ts)
        (src_dir / f"doc_{i}.dcm").write_bytes(encode_part10(spans, payload))

    flat = read_dcm_documents(spark, str(src_dir))
    out_dir = str(tmp_path / "transcoded")
    export_dcm(documents_view(flat), out_dir, payloads_view(flat),
               transfer_syntax=TRANSFER_SYNTAX_EXPLICIT_LE)

    import os
    files = sorted(os.listdir(out_dir))
    assert len(files) == len(SYNTAXES)
    _, expected_payload = _doc(TRANSFER_SYNTAX_EXPLICIT_LE)
    for name in files:
        blob = (tmp_path / "transcoded" / name).read_bytes()
        out = parse_part10(blob, include_meta=True)
        texts = {s["text"] for s in out["spans"]}
        assert (f"TransferSyntaxUID_0x00020010_UI_1____="
                f"{TRANSFER_SYNTAX_EXPLICIT_LE}") in texts, name
        assert "PatientName_0x00100010_PN_1____=DOE^JANE" in texts
        assert out["media"]["pixels"] == expected_payload["pixels"], name
        # natively encoded now: the LE pixel words appear verbatim
        assert expected_payload["pixels"] in blob, name
