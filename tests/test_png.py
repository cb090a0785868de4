"""PNG codec + sink tests (SURVEY §2 S7 — real .png output parity with
deidcm's PIL img.save, dicom2png.py:77-80): byte-level chunk/CRC checks,
decode-back pixel equality on every supported shape, full unfilter
coverage, and the distributed export_png sink over synth media payloads."""

import struct
import zlib

import numpy as np
import pytest

from deidcm_spark import corpus
from deidcm_spark.operators.media import decode_payload, redact_media
from deidcm_spark.png import decode_png, encode_png, export_png, render_png

RNG = np.random.default_rng  # seeded everywhere — determinism invariant


# --- byte-level structure -------------------------------------------------

def test_png_signature_and_chunk_layout():
    blob = encode_png(np.zeros((4, 5), dtype=np.uint8))
    assert blob[:8] == b"\x89PNG\r\n\x1a\n"
    # IHDR first, IEND last (spec §5.6); every CRC must verify
    pos, tags = 8, []
    while pos + 8 <= len(blob):
        (length,) = struct.unpack(">I", blob[pos:pos + 4])
        tag = blob[pos + 4:pos + 8]
        body = blob[pos + 8:pos + 8 + length]
        (crc,) = struct.unpack(">I", blob[pos + 8 + length:pos + 12 + length])
        assert zlib.crc32(tag + body) & 0xFFFFFFFF == crc
        tags.append(tag)
        pos += 12 + length
    assert tags[0] == b"IHDR" and tags[-1] == b"IEND" and b"IDAT" in tags
    # IHDR fields: width=5 height=4 depth=8 color=0 (grayscale)
    w, h, depth, color = struct.unpack(">IIBB", blob[16:26])
    assert (w, h, depth, color) == (5, 4, 8, 0)


def test_png_deterministic_bytes():
    arr = RNG(3).integers(0, 256, size=(16, 16), dtype=np.uint8)
    assert encode_png(arr) == encode_png(arr.copy())


# --- encode → decode round-trips ------------------------------------------

@pytest.mark.parametrize("shape,dtype", [
    ((7, 11), np.uint8),        # 8-bit grayscale
    ((5, 9), np.uint16),        # 16-bit grayscale (big-endian samples)
    ((6, 4, 3), np.uint8),      # RGB
    ((1, 1), np.uint8),         # degenerate single pixel
])
def test_roundtrip_pixel_equality(shape, dtype):
    info = np.iinfo(dtype)
    arr = RNG(7).integers(0, int(info.max) + 1, size=shape, dtype=dtype)
    back = decode_png(encode_png(arr))
    assert back.dtype == arr.dtype and back.shape == arr.shape
    assert np.array_equal(back, arr)


def test_encode_rejects_unsupported():
    with pytest.raises(TypeError):
        encode_png(np.zeros((4, 4), dtype=np.float64))
    with pytest.raises(TypeError):
        encode_png(np.zeros((4, 4, 2), dtype=np.uint8))
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")


# --- decoder reads ordinary (filtered) PNGs --------------------------------

def _forward_filter(img: np.ndarray, filters: list[int]) -> bytes:
    """Spec §9 forward filters, applied per-row — an independent encoder so
    the decoder is tested against the standard, not against encode_png."""
    h, w = img.shape
    out = bytearray()
    prev = np.zeros(w, dtype=np.int32)
    for y in range(h):
        cur = img[y].astype(np.int32)
        f = filters[y % len(filters)]
        line = np.zeros(w, dtype=np.int32)
        for x in range(w):
            a = int(cur[x - 1]) if x else 0
            b = int(prev[x])
            c = int(prev[x - 1]) if x else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            line[x] = (int(cur[x]) - pred) & 0xFF
        out.append(f)
        out.extend(line.astype(np.uint8).tobytes())
        prev = cur
    return bytes(out)


def test_decode_handles_all_filter_types():
    img = RNG(11).integers(0, 256, size=(10, 8), dtype=np.uint8)
    raster = _forward_filter(img, filters=[0, 1, 2, 3, 4])
    ihdr = struct.pack(">IIBBBBB", 8, 10, 8, 0, 0, 0, 0)

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    blob = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raster)) + chunk(b"IEND", b""))
    assert np.array_equal(decode_png(blob), img)


def test_decode_rejects_corrupt_crc():
    blob = bytearray(encode_png(np.zeros((3, 3), dtype=np.uint8)))
    blob[20] ^= 0xFF  # flip a byte inside IHDR body
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(blob))


# --- distributed sink -------------------------------------------------------

def test_export_png_sink_roundtrip(spark, tmp_path):
    """redact → render → write real .png files → decode back pixel-equal to
    the redacted payload table (the full S7 composition)."""
    payloads, boxes = corpus.synth_media(spark, 40, seed=5, media_rate=0.5)
    redacted = redact_media(payloads, boxes, margin=8)
    out_dir = str(tmp_path / "png_out")
    export_png(redacted, out_dir)

    from urllib.parse import quote

    expected = {r["media_ref"]: r.asDict() for r in redacted.collect()}
    assert expected, "fixture produced no media payloads"
    for ref, row in expected.items():
        path = tmp_path / "png_out" / f"{quote(ref, safe='')}.png"
        blob = path.read_bytes()
        assert blob[:8] == b"\x89PNG\r\n\x1a\n"
        arr = decode_png(blob)
        assert np.array_equal(arr, decode_payload(row))


def test_render_png_stays_arrow_side(spark):
    """render_png is one mapInPandas stage — no per-row Python UDF, no
    shuffle introduced by the encode itself."""
    payloads, _ = corpus.synth_media(spark, 20, seed=5, media_rate=0.5)
    df = render_png(payloads)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "Exchange" not in plan  # narrow: encode shuffles nothing


def test_render_png_12bit_payload(spark):
    """bits>8 payloads ride uint16 storage repo-wide (e.g. 12-bit JPEG-LL
    frames); render_png must pick the 2-byte dtype for ANY bits>8, not
    just 16 — uint8 misreads the buffer and crashes the reshape."""
    import pandas as pd

    w, h = 6, 4
    vals = np.arange(w * h, dtype=np.uint16) * 170 % 4096  # 12-bit range
    pdf = pd.DataFrame([{
        "media_ref": "m/12bit", "width": w, "height": h,
        "channels": 1, "bits": 12, "pixels": vals.tobytes(),
    }])
    df = spark.createDataFrame(pdf)
    rows = render_png(df).collect()
    assert len(rows) == 1
    arr = decode_png(bytes(rows[0]["png"]))
    assert arr.dtype == np.uint16 and arr.shape == (h, w)
    assert np.array_equal(arr, vals.reshape(h, w))
