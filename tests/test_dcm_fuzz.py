"""Parser robustness fuzz for dcm.parse_part10 (r4 VERDICT item 6).

Contract (mirrors the reference's behavior on malformed files — it
escalates them with a clear per-file error, df2dicom.py:87-88): for ANY
truncation or byte mutation of a valid Part-10 stream, parse_part10
either succeeds or raises ValueError with a descriptive message.  It must
NEVER hang, overrun the buffer, or leak another exception class
(struct.error, IndexError, zlib.error, UnicodeDecodeError, ...).

Two layers:
  * a deterministic exhaustive sweep — every truncation point and every
    single-byte XOR mutation of three golden streams (explicit, implicit,
    deflated), bit-for-bit reproducible across runs (the repo's
    no-wall-clock/no-RNG invariant);
  * a derandomized hypothesis pass with multi-byte splices and junk
    tails for shapes the sweep can't enumerate.
"""

import signal
import struct
import zlib

import pytest
from hypothesis import given, settings, strategies as st

from deidcm_spark.dcm import encode_part10, parse_part10

_BASE_SPANS = [
    {"kind": "text",
     "text": "SOPInstanceUID_0x00080018_UI_1____=1.2.3",
     "media_ref": "", "offset": 0},
    {"kind": "text",
     "text": "PatientName_0x00100010_PN_1____=DOE^JANE",
     "media_ref": "", "offset": 1},
    {"kind": "text",
     "text": "BeamSequence_0x300a00b0_SQ_1____@1.Rows_0x00280010_US_1____=7",
     "media_ref": "", "offset": 2},
    {"kind": "text", "text": "Rows_0x00280010_US_1____=123",
     "media_ref": "", "offset": 3},
]


def _stream(ts_uid: str) -> bytes:
    spans = [{"kind": "text",
              "text": f"TransferSyntaxUID_0x00020010_UI_1____={ts_uid}",
              "media_ref": "", "offset": 0}] + _BASE_SPANS
    return encode_part10(spans)


def _encap_stream(ts_uid: str) -> bytes:
    """Golden encapsulated-PixelData stream (RLE or JPEG-LL): text spans +
    one encapsulated frame, so the sweep hammers the item-framing walk and
    the frame codec (PackBits / T.81 entropy decode)."""
    spans = [{"kind": "text",
              "text": f"TransferSyntaxUID_0x00020010_UI_1____={ts_uid}",
              "media_ref": "", "offset": 0}] + [
        {"kind": "text", "text": "SamplesPerPixel_0x00280002_US_1____=1",
         "media_ref": "", "offset": 1},
        {"kind": "text", "text": "Columns_0x00280011_US_1____=16",
         "media_ref": "", "offset": 2},
    ] + _BASE_SPANS + [
        {"kind": "media", "text": "", "media_ref": "m/0", "offset": 9},
    ]
    # NOTE: _BASE_SPANS carries a root-level Rows=123; the pixel module
    # must stay consistent for the JPEG-LL dims cross-check, so override
    # it (the SQ's NESTED Rows stays — root-only dims folding is itself
    # under test here)
    spans = [s for s in spans if not s["text"].startswith("Rows_")] + [
        {"kind": "text", "text": "Rows_0x00280010_US_1____=8",
         "media_ref": "", "offset": 10},
        {"kind": "text", "text": "BitsAllocated_0x00280100_US_1____=8",
         "media_ref": "", "offset": 11},
    ]
    pixels = bytes([7] * 40 + list(range(48)) + [9] * 40)
    return encode_part10(spans, {"width": 16, "height": 8, "channels": 1,
                                 "bits": 8, "pixels": pixels})


STREAMS = {
    "explicit": _stream("1.2.840.10008.1.2.1"),
    "implicit": _stream("1.2.840.10008.1.2"),
    "deflated": _stream("1.2.840.10008.1.2.1.99"),
    "bigendian": _stream("1.2.840.10008.1.2.2"),
    "rle": _encap_stream("1.2.840.10008.1.2.5"),
    "jpegll": _encap_stream("1.2.840.10008.1.2.4.70"),
}


class _Hang(Exception):
    pass


def _parse_bounded(blob: bytes, seconds: int = 10) -> None:
    """parse_part10 under an alarm: a hang is a test failure, not a stall."""
    def _raise(signum, frame):
        raise _Hang()

    old = signal.signal(signal.SIGALRM, _raise)
    try:
        signal.alarm(seconds)
        try:
            parse_part10(blob)
        except ValueError:
            pass  # the one allowed failure mode
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


@pytest.mark.parametrize("name", sorted(STREAMS))
def test_every_truncation_is_clean(name):
    blob = STREAMS[name]
    for cut in range(len(blob) + 1):
        _parse_bounded(blob[:cut])


@pytest.mark.parametrize("name", sorted(STREAMS))
def test_every_single_byte_mutation_is_clean(name):
    blob = STREAMS[name]
    for off in range(len(blob)):
        for x in (0x01, 0x80, 0xFF):
            m = bytearray(blob)
            m[off] ^= x
            _parse_bounded(bytes(m))


def test_undefined_length_pixel_data_is_clear_error():
    """Undefined-length PixelData under a NATIVE syntax (r5: fragments are
    collected for RLE, so the error moved from the element to the syntax
    check) and undefined-length NON-pixel elements both stay descriptive
    ValueErrors, never a misparse."""
    blob = STREAMS["explicit"]
    # truncated item framing → clear encapsulation error
    tail = (struct.pack("<HH", 0x7FE0, 0x0010) + b"OB\x00\x00"
            + struct.pack("<I", 0xFFFFFFFF))
    with pytest.raises(ValueError, match="encapsulated"):
        parse_part10(blob + tail)
    # well-formed framing but a native declared syntax → clear error too
    tail2 = (tail + struct.pack("<HHI", 0xFFFE, 0xE000, 0)
             + struct.pack("<HHI", 0xFFFE, 0xE0DD, 0))
    with pytest.raises(ValueError, match="encapsulated PixelData under"):
        parse_part10(blob + tail2)
    # undefined length on a non-pixel binary element is still rejected
    tail3 = (struct.pack("<HH", 0x0008, 0x0000) + b"OB\x00\x00"
             + struct.pack("<I", 0xFFFFFFFF))
    with pytest.raises(ValueError, match="undefined"):
        parse_part10(blob + tail3)


def test_deflated_zip_bomb_shape_is_bounded():
    """A deflated stream whose body inflates to a huge-but-bounded buffer
    still terminates (zlib.decompress materializes, then the parser walks
    it); truncating the deflate stream itself is a clean ValueError."""
    meta = STREAMS["deflated"]
    # find where the deflate body starts: end of meta group
    # (cheap: parse the good stream's meta length directly)
    (glen,) = struct.unpack_from("<I", meta, 140)
    body_at = 144 + glen
    head, body = meta[:body_at], meta[body_at:]
    with pytest.raises(ValueError, match="deflate"):
        parse_part10(head + body[: len(body) // 2] + b"\x00")


@settings(max_examples=300, deadline=None, derandomize=True)
@given(
    name=st.sampled_from(sorted(STREAMS)),
    start=st.integers(min_value=0, max_value=400),
    splice=st.binary(min_size=0, max_size=24),
    cut=st.integers(min_value=0, max_value=500),
)
def test_hypothesis_splice_and_cut(name, start, splice, cut):
    blob = STREAMS[name]
    start = min(start, len(blob))
    mutated = (blob[:start] + splice + blob[start:])[: max(cut, 132)]
    _parse_bounded(mutated)


def test_sweep_is_deterministic():
    """The golden streams themselves are bit-stable (retry/engine parity)."""
    again = {
        "explicit": _stream("1.2.840.10008.1.2.1"),
        "deflated": _stream("1.2.840.10008.1.2.1.99"),
    }
    assert again["explicit"] == STREAMS["explicit"]
    assert again["deflated"] == STREAMS["deflated"]
    # and the deflated body really is compressed
    assert b"DOE^JANE" not in STREAMS["deflated"]
    assert zlib.decompress(
        STREAMS["deflated"][144 + struct.unpack_from("<I", STREAMS["deflated"], 140)[0]:],
        wbits=-15,
    )
