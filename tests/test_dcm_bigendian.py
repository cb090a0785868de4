"""Explicit VR Big Endian transfer syntax (1.2.840.10008.1.2.2, retired
PS3.5 §7.3) — the last native syntax the reference reads via pydicom that
the engine previously rejected (VERDICT r4 "missing" #1).

Contract under test:
  * a hand-assembled golden BE stream (parser vs the STANDARD, not the
    writer) parses to the same spans its LE twin would produce — span
    values are canonicalized to the LE representation on read;
  * the writer honors a declared BE UID (every multi-byte field swapped,
    meta group stays Explicit VR LE per PS3.10 §7.1) and round-trips;
  * OW word payloads (pixels and in-span b64 values) swap to LE-canonical
    storage, so downstream media operators see identical bytes;
  * malformed BE bodies keep the parser's ValueError-only contract.

Reference parity: deidcm reads BE transparently through pydicom's
TransferSyntaxUID dispatch (deidcm/dicom/df2dicom.py:162-183).
"""

import base64
import struct

import pytest

from deidcm_spark.dcm import (
    TRANSFER_SYNTAX_EXPLICIT_BE,
    TRANSFER_SYNTAX_EXPLICIT_LE,
    canonical_spans,
    encode_part10,
    parse_part10,
)

BE = TRANSFER_SYNTAX_EXPLICIT_BE


def _texts(spans):
    return [s["text"] for s in spans]


# ---------------------------------------------------------------------------
# golden stream: hand-assembled per PS3.10 §7.1 + PS3.5 §7.1.2/§7.3
# ---------------------------------------------------------------------------

def _golden_be_stream() -> tuple[bytes, bytes]:
    """(stream, expected LE-canonical pixels): meta group in Explicit VR LE
    (as the standard requires regardless of the dataset syntax), dataset in
    Explicit VR Big Endian — short-form, long-form (OW), and SQ/item
    headers all byte-swapped, 16-bit pixel words stored big-endian."""
    ts = BE.encode()
    if len(ts) % 2:
        ts += b"\x00"
    meta_body = (struct.pack("<HH", 2, 0x10) + b"UI"
                 + struct.pack("<H", len(ts)) + ts)
    meta = (struct.pack("<HH", 2, 0) + b"UL" + struct.pack("<H", 4)
            + struct.pack("<I", len(meta_body)) + meta_body)

    ds = b""
    # elements in ascending tag order (so the LE twin, whose writer sorts
    # by tag, reproduces the same file order)
    # (0008,0018) UI — text body, endian-neutral
    ds += struct.pack(">HH", 0x0008, 0x0018) + b"UI" + struct.pack(">H", 6) + b"1.2.3\x00"
    ds += struct.pack(">HH", 0x0028, 0x0002) + b"US" + struct.pack(">H", 2) + struct.pack(">H", 1)
    # (0028,0010) Rows US 2 — the asymmetric byte pair \x00\x02 would read
    # as 512 under an LE misparse, so the value itself proves the swap
    ds += struct.pack(">HH", 0x0028, 0x0010) + b"US" + struct.pack(">H", 2) + b"\x00\x02"
    ds += struct.pack(">HH", 0x0028, 0x0011) + b"US" + struct.pack(">H", 2) + struct.pack(">H", 2)
    ds += struct.pack(">HH", 0x0028, 0x0100) + b"US" + struct.pack(">H", 2) + struct.pack(">H", 16)
    # defined-length SQ with one defined-length item holding US 7 —
    # sequence, item, and nested element headers ALL swap
    inner = struct.pack(">HH", 0x0028, 0x0010) + b"US" + struct.pack(">H", 2) + struct.pack(">H", 7)
    item = struct.pack(">HH", 0xFFFE, 0xE000) + struct.pack(">I", len(inner)) + inner
    ds += (struct.pack(">HH", 0x300A, 0x00B0) + b"SQ\x00\x00"
           + struct.pack(">I", len(item)) + item)
    # (7FE0,0010) OW long-form: 2x2 16-bit words, big-endian on disk
    words = [0x0102, 0x0304, 0xBEEF, 0x0001]
    pix_be = b"".join(struct.pack(">H", w) for w in words)
    ds += (struct.pack(">HH", 0x7FE0, 0x0010) + b"OW\x00\x00"
           + struct.pack(">I", len(pix_be)) + pix_be)

    pix_le = b"".join(struct.pack("<H", w) for w in words)
    return b"\x00" * 128 + b"DICM" + meta + ds, pix_le


def test_parse_golden_be_stream():
    stream, pix_le = _golden_be_stream()
    out = parse_part10(stream)
    texts = _texts(out["spans"])
    assert "SOPInstanceUID_0x00080018_UI_1____=1.2.3" in texts
    assert "Rows_0x00280010_US_1____=2" in texts  # NOT 512: bytes swapped
    assert ("_0x300a00b0_SQ_1____@1."
            "Rows_0x00280010_US_1____=7" in texts)
    # pixel payload comes back LE-canonical, dims folded from the module
    assert out["media"]["pixels"] == pix_le
    assert (out["media"]["width"], out["media"]["height"],
            out["media"]["bits"]) == (2, 2, 16)


def test_golden_be_spans_equal_le_twin():
    """The SAME dataset assembled under both endiannesses parses to
    byte-identical spans — values are canonicalized, not pass-through."""
    stream, pix_le = _golden_be_stream()
    be_out = parse_part10(stream)
    le_spans = [dict(s) for s in be_out["spans"]]
    le_spans.insert(0, {
        "kind": "text",
        "text": f"TransferSyntaxUID_0x00020010_UI_1____={TRANSFER_SYNTAX_EXPLICIT_LE}",
        "media_ref": "", "offset": -1})
    le_spans.append({"kind": "media", "text": "", "media_ref": "m/0",
                     "offset": len(le_spans)})
    payload = {"width": 2, "height": 2, "channels": 1, "bits": 16,
               "pixels": pix_le}
    le_stream = encode_part10(le_spans, payload)
    le_out = parse_part10(le_stream)
    assert _texts(le_out["spans"]) == _texts(be_out["spans"])
    assert le_out["media"]["pixels"] == be_out["media"]["pixels"]


# ---------------------------------------------------------------------------
# writer round-trip
# ---------------------------------------------------------------------------

def _doc_spans(extra=()):
    spans = [
        {"kind": "text",
         "text": f"TransferSyntaxUID_0x00020010_UI_1____={BE}",
         "media_ref": "", "offset": 0},
        {"kind": "text", "text": "SOPInstanceUID_0x00080018_UI_1____=9.8.7",
         "media_ref": "", "offset": 1},
        {"kind": "text", "text": "PatientName_0x00100010_PN_1____=DOE^JANE",
         "media_ref": "", "offset": 2},
        {"kind": "text", "text": "Rows_0x00280010_US_1____=513",
         "media_ref": "", "offset": 3},
        {"kind": "text",
         "text": 'PixelSpacing_0x00280030_DS_2____=["1.5", "2.5"]',
         "media_ref": "", "offset": 4},
        {"kind": "text",
         "text": ("_0x300a00b0_SQ_1____@1."
                  "Rows_0x00280010_US_1____=7"),
         "media_ref": "", "offset": 5},
    ]
    return spans + list(extra)


def test_writer_round_trip_be():
    spans = _doc_spans()
    stream = encode_part10(spans)
    out = parse_part10(stream, include_meta=True)
    got = {s["text"] for s in out["spans"]}
    for s in canonical_spans(spans):
        assert s["text"] in got, s["text"]
    # genuinely big-endian on disk: US 513 = 0x0201 appears as \x02\x01
    # inside an element whose tag is also swapped
    assert struct.pack(">HH", 0x0028, 0x0010) + b"US" + b"\x00\x02\x02\x01" in stream


def test_writer_round_trip_be_with_16bit_pixels():
    spans = _doc_spans(
        [{"kind": "media", "text": "", "media_ref": "m/1", "offset": 9}])
    pixels = bytes(range(256)) * 2  # 16x8, 16-bit, asymmetric byte pairs
    payload = {"width": 16, "height": 8, "channels": 1, "bits": 16,
               "pixels": pixels}
    stream = encode_part10(spans, payload)
    out = parse_part10(stream)
    assert out["media"]["pixels"] == pixels  # LE-canonical both sides
    assert pixels not in stream  # the on-disk copy is word-swapped
    # 8-bit payloads are endian-neutral: OB body rides through unswapped
    payload8 = {"width": 16, "height": 16, "channels": 1, "bits": 8,
                "pixels": pixels}
    out8 = parse_part10(encode_part10(spans, payload8))
    assert out8["media"]["pixels"] == pixels


def test_ow_span_value_is_le_canonical():
    """A non-pixel OW element's b64 span value must be identical whether
    the file was BE or LE — word order canonicalizes on read."""
    raw_le = struct.pack("<4H", 1, 2, 3, 0xABCD)
    b64 = base64.b64encode(raw_le).decode()
    extra = [{"kind": "text",
              "text": f"_0x00281201_OW_1____={b64}",  # red palette LUT data
              "media_ref": "", "offset": 8}]
    be_out = parse_part10(encode_part10(_doc_spans(extra)))
    le_spans = _doc_spans(extra)
    le_spans[0]["text"] = (
        f"TransferSyntaxUID_0x00020010_UI_1____={TRANSFER_SYNTAX_EXPLICIT_LE}")
    le_out = parse_part10(encode_part10(le_spans))
    be_texts = {s["text"] for s in be_out["spans"]}
    le_texts = {s["text"] for s in le_out["spans"]}
    assert be_texts == le_texts
    assert any(b64 in t for t in be_texts)


# ---------------------------------------------------------------------------
# malformed input keeps the ValueError-only contract
# ---------------------------------------------------------------------------

def test_odd_ow_body_is_clean_error():
    """An OW body whose length is not a multiple of the 2-byte word width
    cannot be word-swapped — descriptive ValueError, no other class."""
    stream, _ = _golden_be_stream()
    # hand-append a 3-byte OW element (odd → unswappable)
    bad = (struct.pack(">HH", 0x0028, 0x1201) + b"OW\x00\x00"
           + struct.pack(">I", 3) + b"abc")
    with pytest.raises(ValueError, match="word width"):
        parse_part10(stream + bad)


def test_truncated_be_header_is_clean_error():
    stream, _ = _golden_be_stream()
    with pytest.raises(ValueError):
        parse_part10(stream[:-3])


# ---------------------------------------------------------------------------
# review-pass regression: AT (attribute tag) is endian-sensitive word data
# ---------------------------------------------------------------------------

def test_at_vr_canonicalizes_across_endianness():
    """AT = (group,element) uint16 pair (PS3.5 §7.3 lists it among the
    endian-sensitive VRs).  A BE file's AT span must equal its LE twin's,
    and re-encoding under either endianness must reproduce the original
    on-disk bytes — previously AT fell to the text path (no swap, pad
    stripping, 0x5C splitting)."""
    from deidcm_spark.dcm import _encode_value, _parse_value

    at_le = struct.pack("<HH", 0x0028, 0x0010)
    at_be = struct.pack(">HH", 0x0028, 0x0010)
    v_le, vm = _parse_value("AT", at_le, bo="<")
    v_be, _ = _parse_value("AT", at_be, bo=">")
    assert v_le == v_be == base64.b64encode(at_le).decode()
    assert vm == "1"
    assert _encode_value("AT", v_le, bo="<") == at_le
    assert _encode_value("AT", v_le, bo=">") == at_be
    # VM>1 AT (two concatenated pairs) and awkward byte values: a pair
    # containing 0x5C (backslash) and trailing 0x20 (space) — both were
    # corrupted by the old text path
    raw = struct.pack("<HH", 0x005C, 0x2020) + struct.pack("<HH", 0x7FE0, 0x0010)
    enc, _ = _parse_value("AT", raw, bo="<")
    assert _encode_value("AT", enc, bo="<") == raw
    raw_be = struct.pack(">HH", 0x005C, 0x2020) + struct.pack(">HH", 0x7FE0, 0x0010)
    enc_be, _ = _parse_value("AT", raw_be, bo=">")
    assert enc_be == enc


def test_at_vr_part10_be_le_twins_agree():
    """Full-stream proof: a BE file holding FrameIncrementPointer
    (0028,0009) AT parses to the same span as its LE twin, and the BE→LE
    transcode does not corrupt the referenced tag."""
    def stream(bo: str) -> bytes:
        ts = (BE if bo == ">" else TRANSFER_SYNTAX_EXPLICIT_LE).encode()
        if len(ts) % 2:
            ts += b"\x00"
        meta_body = (struct.pack("<HH", 2, 0x10) + b"UI"
                     + struct.pack("<H", len(ts)) + ts)
        meta = (struct.pack("<HH", 2, 0) + b"UL" + struct.pack("<H", 4)
                + struct.pack("<I", len(meta_body)) + meta_body)
        at_val = struct.pack(bo + "HH", 0x0018, 0x1063)  # -> FrameTime
        ds = (struct.pack(bo + "HH", 0x0028, 0x0009) + b"AT"
              + struct.pack(bo + "H", 4) + at_val)
        return b"\x00" * 128 + b"DICM" + meta + ds

    le_spans = parse_part10(stream("<"))["spans"]
    be_spans = parse_part10(stream(">"))["spans"]
    strip = lambda spans: [s["text"] for s in spans
                           if "0x00280009" in s["text"]]
    assert strip(le_spans) == strip(be_spans)
    expected = base64.b64encode(struct.pack("<HH", 0x0018, 0x1063)).decode()
    assert strip(le_spans) == [f"_0x00280009_AT_1____={expected}"]
