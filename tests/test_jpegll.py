"""Lossless JPEG (ITU-T T.81 process 14) codec + DICOM integration.

Layers:
  * codec properties — encode→decode identity over every supported shape
    (8/16-bit gray, 8-bit RGB) × all 7 predictors, flat and extreme
    payloads;
  * a hand-assembled GOLDEN stream with a custom Huffman table, decoded
    against sample values computed by hand from the standard — the
    decoder is tested against T.81, not against this repo's encoder;
  * a point-transform golden (Al shifts the decoded output);
  * Part-10 integration: declared ``1.2.840.10008.1.2.4.70`` / ``.57``
    encapsulate on write and decode on read (single fragment, PS3.5 A.4),
    other JPEG UIDs still fail with the clear per-file error;
  * the ValueError-only malformed-input contract (the exhaustive sweep
    lives in tests/test_dcm_fuzz.py via the ``jpegll`` golden).

Reference parity: deidcm reads these syntaxes through pydicom's handlers
(deidcm/dicom/df2dicom.py:162-183); the codec here is an original
implementation from the public standard.
"""

import struct

import pytest

from deidcm_spark.dcm import encode_part10, parse_part10
from deidcm_spark.jpegll import decode_jpegll, encode_jpegll

UID_SV1 = "1.2.840.10008.1.2.4.70"
UID_ANY = "1.2.840.10008.1.2.4.57"


def _gen(n: int, mod: int, seed: int = 12345) -> list[int]:
    v, out = seed, []
    for _ in range(n):
        v = (v * 1103515245 + 12345) & 0x7FFFFFFF
        out.append(v % mod)
    return out


def _pack(samples: list[int], bits: int) -> bytes:
    if bits > 8:
        return b"".join(struct.pack("<H", s) for s in samples)
    return bytes(samples)


# ---------------------------------------------------------------------------
# codec round-trips
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("bits,channels", [(8, 1), (16, 1), (8, 3)])
@pytest.mark.parametrize("predictor", list(range(1, 8)))
def test_round_trip_every_shape_and_predictor(bits, channels, predictor):
    w, h = 9, 7
    samples = _gen(w * h * channels, 1 << bits, seed=predictor * 31 + bits)
    pix = _pack(samples, bits)
    out = decode_jpegll(encode_jpegll(pix, w, h, channels, bits,
                                      predictor=predictor))
    assert out["pixels"] == pix
    assert (out["width"], out["height"], out["channels"], out["bits"]) == \
        (w, h, channels, bits)


def test_round_trip_extremes_and_flat():
    # max-magnitude diffs exercise category 16 (32768, no extra bits)
    pix = _pack([0, 65535, 0, 65535, 32768, 0, 65535, 1], 16)
    assert decode_jpegll(encode_jpegll(pix, 4, 2, 1, 16))["pixels"] == pix
    flat = bytes([200] * 1024)
    enc = encode_jpegll(flat, 32, 32, 1, 8)
    assert decode_jpegll(enc)["pixels"] == flat
    assert len(enc) < len(flat)  # zero diffs actually compress
    one = bytes([77])
    assert decode_jpegll(encode_jpegll(one, 1, 1, 1, 8))["pixels"] == one


def test_encode_validation():
    with pytest.raises(ValueError, match="precision"):
        encode_jpegll(b"\x00", 1, 1, 1, 12)
    with pytest.raises(ValueError, match="components"):
        encode_jpegll(b"\x00\x00", 1, 1, 2, 8)
    with pytest.raises(ValueError, match="payload bytes"):
        encode_jpegll(b"\x00" * 5, 2, 2, 1, 8)
    with pytest.raises(ValueError, match="predictor"):
        encode_jpegll(b"\x00" * 4, 2, 2, 1, 8, predictor=8)


# ---------------------------------------------------------------------------
# golden stream — hand-assembled per T.81 §B.2/B.3/H, custom Huffman table
# ---------------------------------------------------------------------------

def _golden(entropy: bytes, precision: int = 8, w: int = 2, h: int = 2,
            pred: int = 1, al: int = 0) -> bytes:
    """SOI + SOF3 + DHT{cat0:len1, cat1:len2, cat2:len2} + SOS + entropy
    + EOI.  Codes: cat0='0', cat1='10', cat2='11' (canonical order)."""
    out = bytearray(b"\xff\xd8")
    sof = struct.pack(">BHHB", precision, h, w, 1) + bytes([1, 0x11, 0])
    out += b"\xff\xc3" + struct.pack(">H", len(sof) + 2) + sof
    dht = bytes([0x00, 1, 2] + [0] * 14 + [0, 1, 2])
    out += b"\xff\xc4" + struct.pack(">H", len(dht) + 2) + dht
    sos = bytes([1, 1, 0x00, pred, 0, al])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    out += entropy + b"\xff\xd9"
    return bytes(out)


def test_golden_decode_sv1():
    """2x2 8-bit, predictor 1.  By hand: s00 pred=128(default) diff=0;
    s01 pred=Ra=128 diff=+1 (cat1, extra bit '1'); s10 pred=Rb=128
    diff=-1 (cat1, extra bit '0' → EXTEND → -1); s11 pred=Ra=127 diff=0.
    Bits: 0|10 1|10 0|0 → 0101 1000 = 0x58."""
    out = decode_jpegll(_golden(b"\x58"))
    assert out["pixels"] == bytes([128, 129, 127, 127])
    assert (out["width"], out["height"], out["bits"]) == (2, 2, 8)


def test_golden_decode_predictor_2():
    """Same bitstream under predictor 2 (Rb): s11 pred=Rb=s01=129, diff=0
    → 129, not 127."""
    out = decode_jpegll(_golden(b"\x58", pred=2))
    assert out["pixels"] == bytes([128, 129, 127, 129])


def test_golden_decode_point_transform():
    """Al=1: default prediction is 2^(8-1-1)=64 and decoded samples are
    shifted left by 1 on output.  1x2 image, bits: cat0 '0'; cat1 '10'+'1'
    → 0101 + 1-padding = 0101 1111 = 0x5F.  Samples 64, 65 → output
    128, 130."""
    out = decode_jpegll(_golden(b"\x5f", w=2, h=1, al=1))
    assert out["pixels"] == bytes([128, 130])


def test_golden_rejects():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpegll(b"\x00\x01")
    with pytest.raises(ValueError, match="restart"):
        # DRI with a nonzero interval before SOS
        g = _golden(b"\x58")
        dri = b"\xff\xdd\x00\x04\x00\x08"
        decode_jpegll(g[:2] + dri + g[2:])
    with pytest.raises(ValueError, match="EOI"):
        decode_jpegll(_golden(b"\x58")[:-2])  # EOI cut off
    with pytest.raises(ValueError, match="truncated|exhausted|marker"):
        decode_jpegll(_golden(b""))  # no entropy data at all
    with pytest.raises(ValueError, match="unsupported marker"):
        decode_jpegll(b"\xff\xd8\xff\xc0\x00\x08" + b"\x08\x00\x01\x00\x01\x01\x11\x00")


def test_every_truncation_of_a_codec_stream_is_clean():
    enc = encode_jpegll(_pack(_gen(24, 256), 8), 6, 4, 1, 8)
    for cut in range(len(enc)):
        try:
            decode_jpegll(enc[:cut])
        except ValueError:
            pass  # the one allowed failure mode


# ---------------------------------------------------------------------------
# Part-10 integration
# ---------------------------------------------------------------------------

def _doc(ts: str, bits: int, ch: int, w: int, h: int):
    spans = [
        {"kind": "text", "text": f"TransferSyntaxUID_0x00020010_UI_1____={ts}",
         "media_ref": "", "offset": 0},
        {"kind": "text", "text": "SOPInstanceUID_0x00080018_UI_1____=5.5.5",
         "media_ref": "", "offset": 1},
        {"kind": "text", "text": f"SamplesPerPixel_0x00280002_US_1____={ch}",
         "media_ref": "", "offset": 2},
        {"kind": "text", "text": f"Rows_0x00280010_US_1____={h}",
         "media_ref": "", "offset": 3},
        {"kind": "text", "text": f"Columns_0x00280011_US_1____={w}",
         "media_ref": "", "offset": 4},
        {"kind": "text", "text": f"BitsAllocated_0x00280100_US_1____={bits}",
         "media_ref": "", "offset": 5},
        {"kind": "media", "text": "", "media_ref": "m/0", "offset": 6},
    ]
    samples = _gen(w * h * ch, 1 << bits, seed=bits * 7 + ch)
    pix = _pack(samples, bits)
    return spans, {"width": w, "height": h, "channels": ch, "bits": bits,
                   "pixels": pix}


@pytest.mark.parametrize("ts", [UID_SV1, UID_ANY])
@pytest.mark.parametrize("bits,ch", [(8, 1), (16, 1), (8, 3)])
def test_part10_round_trip(ts, bits, ch):
    spans, payload = _doc(ts, bits, ch, 11, 7)
    stream = encode_part10(spans, payload)
    out = parse_part10(stream, include_meta=True)
    assert out["media"]["pixels"] == payload["pixels"]
    assert payload["pixels"] not in stream  # on-disk copy is entropy-coded
    texts = {s["text"] for s in out["spans"]}
    assert f"TransferSyntaxUID_0x00020010_UI_1____={ts}" in texts
    assert f"Rows_0x00280010_US_1____=7" in texts


def test_part10_dims_mismatch_is_clean_error():
    """A JPEG frame whose dimensions contradict the pixel module must fail
    loudly, not hand downstream operators a mis-shaped payload."""
    spans, payload = _doc(UID_SV1, 8, 1, 4, 4)
    stream = encode_part10(spans, payload)
    # corrupt the module's Rows cell from 4 to 5 in the encoded stream:
    # explicit US element (0028,0010), little-endian value 4 → 5
    needle = struct.pack("<HH", 0x0028, 0x0010) + b"US" + struct.pack("<H", 2)
    at = stream.index(needle) + len(needle)
    bad = stream[:at] + struct.pack("<H", 5) + stream[at + 2:]
    with pytest.raises(ValueError, match="contradicts"):
        parse_part10(bad)


def test_part10_other_jpeg_uids_still_rejected():
    for uid in ("1.2.840.10008.1.2.4.50",   # JPEG Baseline
                "1.2.840.10008.1.2.4.80",   # JPEG-LS
                "1.2.840.10008.1.2.4.90"):  # JPEG 2000
        spans, payload = _doc(uid, 8, 1, 4, 4)
        with pytest.raises(ValueError, match="unsupported transfer syntax"):
            encode_part10(spans, payload)


def test_part10_text_mode_cells_fail_loudly():
    """Text-mode corpora (opaque cells) cannot re-encode JPEG-LL — the
    writer needs numeric dims; same contract as the RLE writer."""
    spans, payload = _doc(UID_SV1, 8, 1, 4, 4)
    spans[3]["text"] = "Rows_0x00280010_US_1____=opaque"
    with pytest.raises(ValueError, match="not.*numeric|numeric"):
        encode_part10(spans, payload)


# ---------------------------------------------------------------------------
# review-pass regressions: bit-I/O boundedness, DHT table classes,
# 12-in-16-bit frames, multi-fragment single-frame streams
# ---------------------------------------------------------------------------

def test_bit_io_acc_stays_bounded():
    """Consumed bits must be discarded from the accumulator — an unbounded
    acc makes every shift copy a growing bignum (quadratic codec time,
    measured 161 s for one 512x512 frame before the fix)."""
    from deidcm_spark.jpegll import _BitReader, _BitWriter

    w = _BitWriter()
    for i in range(4096):
        w.put(i & 0x3FF, 10)
        assert w.acc.bit_length() <= 8
    data = w.flush()
    r = _BitReader(data, 0)
    for _ in range(4096):
        r.bits(10)
        assert r.acc.bit_length() <= 8


def test_codec_time_is_linear_not_quadratic():
    """Coarse wall-clock guard: quadrupling the sample count must not cost
    ~16x (quadratic); allow generous noise headroom (< 10x)."""
    import time

    def roundtrip_secs(side: int) -> float:
        pix = _pack(_gen(side * side, 65536, seed=side), 16)
        t0 = time.perf_counter()
        enc = encode_jpegll(pix, side, side, 1, 16)
        decode_jpegll(enc)
        return time.perf_counter() - t0

    roundtrip_secs(32)  # warm-up
    small, big = roundtrip_secs(64), roundtrip_secs(128)
    assert big < small * 10, (small, big)


def test_dht_ac_class_table_does_not_shadow_dc():
    """T.81 B.2.4.2 keys Huffman tables by (class, id): an AC-class table
    with the same id — legal, emitted by generic JPEG writers — must not
    replace the DC table the lossless scan decodes with."""
    g = _golden(b"\x58")
    # AC-class (Tc=1) table id 0 with a REVERSED symbol order: if it
    # shadowed the DC table the decode would produce different samples
    dht = bytes([0x10, 1, 2] + [0] * 14 + [2, 1, 0])
    seg = b"\xff\xc4" + struct.pack(">H", len(dht) + 2) + dht
    at = g.index(b"\xff\xda")
    out = decode_jpegll(g[:at] + seg + g[at:])
    assert out["pixels"] == bytes([128, 129, 127, 127])


def test_dht_invalid_table_class_rejected():
    g = _golden(b"\x58")
    dht = bytes([0x20, 1, 2] + [0] * 14 + [0, 1, 2])
    seg = b"\xff\xc4" + struct.pack(">H", len(dht) + 2) + dht
    at = g.index(b"\xff\xda")
    with pytest.raises(ValueError, match="table class"):
        decode_jpegll(g[:at] + seg + g[at:])


def test_trailing_data_after_eoi_rejected_pad_allowed():
    g = _golden(b"\x58")
    decode_jpegll(g + b"\x00")          # DICOM even-pad after EOI: fine
    decode_jpegll(g + b"\x00\x00")
    with pytest.raises(ValueError, match="trailing"):
        decode_jpegll(g + g)            # a second concatenated frame


def _part10_jll(frag: bytes, extra_us=(), frags=None) -> bytes:
    """Hand-assembled Part-10 stream (Explicit VR LE dataset) wrapping the
    given JPEG-LL fragment(s) — independent of encode_part10."""
    ts = UID_SV1.encode()
    if len(ts) % 2:
        ts += b"\x00"
    meta_body = (struct.pack("<HH", 2, 0x10) + b"UI"
                 + struct.pack("<H", len(ts)) + ts)
    meta = (struct.pack("<HH", 2, 0) + b"UL" + struct.pack("<H", 4)
            + struct.pack("<I", len(meta_body)) + meta_body)

    def us(group, elem, val):
        return (struct.pack("<HH", group, elem) + b"US"
                + struct.pack("<H", 2) + struct.pack("<H", val))

    pieces = frags if frags is not None else [frag]
    enc = b""
    for p in pieces:
        if len(p) % 2:
            p += b"\x00"
        enc += struct.pack("<HHI", 0xFFFE, 0xE000, len(p)) + p
    ds = us(0x0028, 0x0002, 1) + us(0x0028, 0x0010, 2) + us(0x0028, 0x0011, 2)
    for group, elem, val in extra_us:
        ds += us(group, elem, val)
    ds += (struct.pack("<HH", 0x7FE0, 0x0010) + b"OB\x00\x00"
           + struct.pack("<I", 0xFFFFFFFF)
           + struct.pack("<HHI", 0xFFFE, 0xE000, 0)   # empty BOT
           + enc
           + struct.pack("<HHI", 0xFFFE, 0xE0DD, 0))
    return b"\x00" * 128 + b"DICM" + meta + ds


def test_part10_12bit_in_16_parses():
    """BitsAllocated=16 / BitsStored=12 / frame precision 12 — the common
    real-world CT/MG shape.  Cross-check is against BitsStored; the frame
    precision becomes the payload's bits."""
    frag = _golden(b"\x58", precision=12)
    stream = _part10_jll(frag, extra_us=[(0x0028, 0x0100, 16),
                                         (0x0028, 0x0101, 12)])
    out = parse_part10(stream)
    assert out["media"]["bits"] == 12
    assert out["media"]["pixels"] == struct.pack("<4H", 2048, 2049, 2047, 2047)


def test_part10_bits_stored_mismatch_is_clean_error():
    frag = _golden(b"\x58", precision=12)
    stream = _part10_jll(frag, extra_us=[(0x0028, 0x0100, 16),
                                         (0x0028, 0x0101, 10)])
    with pytest.raises(ValueError, match="contradicts"):
        parse_part10(stream)


def test_part10_precision_exceeding_bits_allocated_rejected():
    frag = _golden(b"\x58", precision=12)
    stream = _part10_jll(frag, extra_us=[(0x0028, 0x0100, 8),
                                         (0x0028, 0x0101, 12)])
    with pytest.raises(ValueError, match="exceeds"):
        parse_part10(stream)


def test_part10_single_frame_spanning_two_fragments():
    """PS3.5 A.4 allows one frame split across fragments for JPEG-family
    syntaxes — the fragments concatenate into one stream."""
    frag = _golden(b"\x58", precision=8)
    extra = [(0x0028, 0x0100, 8)]
    cut = (len(frag) // 2) & ~1  # even split point
    whole = parse_part10(_part10_jll(frag, extra_us=extra))
    split = parse_part10(_part10_jll(b"", extra_us=extra,
                                     frags=[frag[:cut], frag[cut:]]))
    assert split["media"]["pixels"] == whole["media"]["pixels"]
    assert split["media"]["pixels"] == bytes([128, 129, 127, 127])


def test_part10_numberofframes_gt1_is_clean_error():
    frag = _golden(b"\x58", precision=8)
    stream = _part10_jll(frag, extra_us=[(0x0028, 0x0008, 2),
                                         (0x0028, 0x0100, 8)])
    with pytest.raises(ValueError, match="NumberOfFrames=2"):
        parse_part10(stream)
