"""Lossless JPEG (ITU-T T.81 process 14) codec — pure Python, no PIL.

DICOM's "JPEG Lossless, Non-Hierarchical" transfer syntaxes wrap exactly
this bitstream: ``1.2.840.10008.1.2.4.57`` (any predictor) and
``1.2.840.10008.1.2.4.70`` (first-order prediction, selection value 1 —
the one real archives use).  The reference reads both through pydicom's
pixel-data handlers; here the codec is implemented directly from the
public standard (ITU-T T.81 §H: lossless mode; Annex C: Huffman tables;
§B.2/B.3: frame/scan headers), so the engine's ``.dcm`` ingest and sink
stay dependency-free.

Scope (same contract as the RLE codec in ``dcm.py``):
  * decode: SOF3 frames, 2-16 bit precision, 1 or 3 components
    (H=V=1 sampling, one interleaved scan), predictors 1-7, point
    transform; restart intervals raise a clear error (implementations
    disagree on lossless restart prediction state — a wrong decode is
    worse than a loud one, and DICOM JPEG-LL writers don't emit them);
  * encode: selection value 1 (the `.70` syntax), precision 8 or 16,
    grayscale or RGB, one fixed length-per-category Huffman table
    (category ``c`` → code length ``max(2, c)``, a complete-enough
    prefix code for all 17 diff categories);
  * every malformed stream raises ``ValueError`` — the dcm parser's
    never-misparse contract extends through this codec (fuzz-swept in
    tests/test_dcm_fuzz.py).

Payload convention matches the rest of the media pipeline: samples are
little-endian storage order, interleaved channels, bits>8 → 2 bytes per
sample.

Scale note: entropy decode is inherently serial per frame (~1M samples/s
in CPython), so JPEG-LL ingest costs seconds per large mammogram — paid
ONCE per file, executor-parallel across the corpus.  At 100-TB scale the
pattern is: ingest (decode) once, keep payloads out-of-row in parquet,
and/or normalize the archive with the distributed transcode job
(``export --format dcm --transfer-syntax 1.2.840.10008.1.2.1``) so
every later pass reads native-syntax bytes.

Reference parity: deidcm relies on pydicom + its handlers for these
syntaxes (deidcm/dicom/df2dicom.py:162-183 maps TransferSyntaxUID
generally); this module is an original implementation from the standard.
"""

from __future__ import annotations

import struct

# marker bytes (T.81 table B.1)
_SOI = 0xD8
_EOI = 0xD9
_SOF3 = 0xC3
_DHT = 0xC4
_SOS = 0xDA
_DRI = 0xDD
# markers whose segment is skippable metadata (APPn, COM)
_SKIPPABLE = set(range(0xE0, 0xF0)) | {0xFE}


# ---------------------------------------------------------------------------
# Huffman table (encode side): fixed, complete-enough, category c → length
# max(2, c).  Kraft sum = 3/4 + (2^-3 + ... + 2^-15) + 2^-16 = 1 - 2^-16.
# ---------------------------------------------------------------------------

def _fixed_table() -> tuple[list[int], list[int]]:
    """-> (BITS[1..16] code-length counts, HUFFVAL symbol order)."""
    lengths = {cat: max(2, cat) for cat in range(17)}
    bits = [0] * 17  # 1-indexed by code length
    for cat in sorted(lengths, key=lambda c: (lengths[c], c)):
        bits[lengths[cat]] += 1
    huffval = sorted(lengths, key=lambda c: (lengths[c], c))
    return bits[1:], huffval


def _codes_from_table(bits: list[int], huffval: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical code assignment (T.81 C.2): symbol → (code, length)."""
    codes: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


# ---------------------------------------------------------------------------
# bit I/O with 0xFF byte stuffing (T.81 B.1.1.5 / F.1.2.3)
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # stuffing
        # trim emitted bits: acc must stay <8 bits or every later shift
        # copies an ever-growing bignum (quadratic in image size)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # 1-fill (B.1.1.5)
        return bytes(self.out)


class _BitReader:
    """Entropy-coded segment reader: unstuffs FF00, stops at any marker."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None  # marker that ended the segment

    def _fill(self) -> None:
        if self.marker is not None:
            raise ValueError("JPEG-LL entropy data exhausted at a marker")
        if self.pos >= len(self.data):
            raise ValueError("JPEG-LL entropy data truncated")
        b = self.data[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(self.data):
                raise ValueError("JPEG-LL entropy data truncated at 0xFF")
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2  # stuffed data byte
            else:
                self.marker = nxt
                raise ValueError(
                    f"JPEG-LL entropy data ended early at marker 0x{nxt:02x}")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        b = (self.acc >> self.nbits) & 1
        # drop the consumed bit: without this acc grows without bound and
        # each shift is O(bits consumed so far) — quadratic decode
        self.acc &= (1 << self.nbits) - 1
        return b

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_to_marker(self) -> int:
        """Discard pad bits, expect an immediate marker; -> marker byte."""
        self.acc, self.nbits = 0, 0
        while self.pos < len(self.data) and self.data[self.pos] == 0xFF and \
                self.pos + 1 < len(self.data) and self.data[self.pos + 1] == 0xFF:
            self.pos += 1  # fill bytes before a marker are legal
        if self.pos + 1 >= len(self.data) or self.data[self.pos] != 0xFF:
            raise ValueError("JPEG-LL: expected a marker at restart boundary")
        m = self.data[self.pos + 1]
        self.pos += 2
        return m


def _category(diff: int) -> int:
    mag = diff if diff >= 0 else -diff
    return mag.bit_length()


# ---------------------------------------------------------------------------
# encoder (selection value 1 — the 1.2.840.10008.1.2.4.70 syntax)
# ---------------------------------------------------------------------------

def encode_jpegll(pixels: bytes, width: int, height: int, channels: int,
                  bits: int, predictor: int = 1) -> bytes:
    """LE interleaved samples → one lossless JPEG (process 14) frame.

    ``bits`` must be 8 or 16 (the payload shapes ``operators/media.py``
    produces); ``channels`` 1 or 3.  ``predictor`` defaults to 1 — the
    DICOM ``1.2.840.10008.1.2.4.70`` selection value; 2-7 exist for the
    ``.4.57`` family and for decoder coverage."""
    if bits not in (8, 16):
        raise ValueError(f"JPEG-LL encode: {bits}-bit precision unsupported "
                         f"(8/16-bit gray or 8-bit RGB)")
    if channels not in (1, 3):
        raise ValueError(f"JPEG-LL encode: {channels} components unsupported")
    if not (1 <= predictor <= 7):
        raise ValueError(f"JPEG-LL encode: predictor {predictor} out of 1-7")
    step = 2 if bits > 8 else 1
    expected = width * height * channels * step
    if len(pixels) != expected:
        raise ValueError(
            f"JPEG-LL encode: {len(pixels)} payload bytes != "
            f"{width}x{height}x{channels}x{step} = {expected}")
    if step == 2:
        samples = list(struct.unpack(f"<{width * height * channels}H", pixels))
    else:
        samples = list(pixels)

    bits_arr, huffval = _fixed_table()
    codes = _codes_from_table(bits_arr, huffval)

    w = _BitWriter()
    half = 1 << (bits - 1)
    # full-row prediction state (Ra/Rb/Rc), mirror of the decoder's
    cur = [[0] * width for _ in range(channels)]
    prev = [[half] * width for _ in range(channels)]
    for y in range(height):
        for x in range(width):
            base = (y * width + x) * channels
            for c in range(channels):
                sample = samples[base + c]
                if x == 0 and y == 0:
                    pred = half
                elif x == 0:
                    pred = prev[c][0]
                elif y == 0:
                    pred = cur[c][x - 1]
                else:
                    pred = _predict(predictor, cur[c][x - 1], prev[c][x],
                                    prev[c][x - 1])
                diff = (sample - pred) & 0xFFFF
                if diff >= 0x8000:
                    diff -= 0x10000  # minimal-magnitude representative
                cat = _category(diff)
                code, length = codes[cat]
                w.put(code, length)
                if cat and cat < 16:
                    v = diff if diff >= 0 else diff + (1 << cat) - 1
                    w.put(v, cat)
                cur[c][x] = sample
        prev, cur = cur, prev

    out = bytearray()
    out += bytes([0xFF, _SOI])
    # SOF3: precision, Y, X, Nf, then (Ci, HiVi=0x11, Tq=0) per component
    sof = struct.pack(">BHHB", bits, height, width, channels)
    for c in range(channels):
        sof += bytes([c + 1, 0x11, 0])
    out += bytes([0xFF, _SOF3]) + struct.pack(">H", len(sof) + 2) + sof
    # DHT: one table, class 0 id 0
    dht = bytes([0x00]) + bytes(bits_arr) + bytes(huffval)
    out += bytes([0xFF, _DHT]) + struct.pack(">H", len(dht) + 2) + dht
    # SOS: Ns, (Cs, TdTa=0x00) per component, Ss=1 (predictor), Se=0, AhAl=0
    sos = bytes([channels])
    for c in range(channels):
        sos += bytes([c + 1, 0x00])
    sos += bytes([predictor, 0, 0])
    out += bytes([0xFF, _SOS]) + struct.pack(">H", len(sos) + 2) + sos
    out += w.flush()
    out += bytes([0xFF, _EOI])
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder (predictors 1-7, point transform, restart intervals)
# ---------------------------------------------------------------------------

class _HuffDecoder:
    """Canonical Huffman decoder built from a DHT segment (T.81 C.2)."""

    def __init__(self, bits: list[int], huffval: list[int]) -> None:
        self.lookup: dict[tuple[int, int], int] = {}
        code, k = 0, 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                if k >= len(huffval):
                    raise ValueError("JPEG-LL DHT: BITS/HUFFVAL mismatch")
                self.lookup[(length, code)] = huffval[k]
                code += 1
                k += 1
            code <<= 1

    def read(self, r: _BitReader) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | r.bit()
            length += 1
            sym = self.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("JPEG-LL: invalid Huffman code in entropy data")


def _predict(pred_sel: int, ra: int, rb: int, rc: int) -> int:
    if pred_sel == 1:
        return ra
    if pred_sel == 2:
        return rb
    if pred_sel == 3:
        return rc
    if pred_sel == 4:
        return ra + rb - rc
    if pred_sel == 5:
        return ra + ((rb - rc) >> 1)
    if pred_sel == 6:
        return rb + ((ra - rc) >> 1)
    if pred_sel == 7:
        return (ra + rb) >> 1
    raise ValueError(f"JPEG-LL: predictor {pred_sel} out of range 1-7")


def _extend(v: int, cat: int) -> int:
    """Received ``cat`` low bits → signed difference (T.81 F.2.2.1)."""
    if cat == 0:
        return 0
    if cat == 16:
        return 32768
    if v < (1 << (cat - 1)):
        return v - (1 << cat) + 1
    return v


def decode_jpegll(data: bytes) -> dict:
    """One lossless JPEG stream → ``{"pixels": LE bytes, "width", "height",
    "channels", "bits"}``.  Raises ``ValueError`` on anything malformed."""
    if len(data) < 4 or data[0] != 0xFF or data[1] != _SOI:
        raise ValueError("not a JPEG stream (SOI missing)")
    pos = 2
    precision = width = height = 0
    ncomp = 0
    comp_ids: list[int] = []
    tables: dict[int, _HuffDecoder] = {}
    restart_interval = 0
    scan: tuple[list[tuple[int, int]], int, int] | None = None

    while scan is None:
        if pos + 4 > len(data):
            raise ValueError("JPEG-LL: truncated before SOS")
        if data[pos] != 0xFF:
            raise ValueError(f"JPEG-LL: expected marker at byte {pos}")
        marker = data[pos + 1]
        (seg_len,) = struct.unpack_from(">H", data, pos + 2)
        if seg_len < 2 or pos + 2 + seg_len > len(data):
            raise ValueError(f"JPEG-LL: segment 0x{marker:02x} overruns")
        seg = data[pos + 4:pos + 2 + seg_len]
        pos += 2 + seg_len
        if marker == _SOF3:
            if len(seg) < 6:
                raise ValueError("JPEG-LL: SOF3 too short")
            precision, height, width, ncomp = struct.unpack_from(">BHHB", seg)
            if not (2 <= precision <= 16):
                raise ValueError(f"JPEG-LL: precision {precision} invalid")
            if width == 0 or height == 0:
                raise ValueError("JPEG-LL: zero frame dimensions")
            if ncomp not in (1, 3):
                raise ValueError(
                    f"JPEG-LL: {ncomp} components unsupported (1 or 3)")
            if len(seg) != 6 + 3 * ncomp:
                raise ValueError("JPEG-LL: SOF3 component list truncated")
            for c in range(ncomp):
                cid, hv, _tq = seg[6 + 3 * c:9 + 3 * c]
                if hv != 0x11:
                    raise ValueError(
                        "JPEG-LL: subsampled components unsupported "
                        "(lossless frames are H=V=1)")
                comp_ids.append(cid)
        elif marker == _DHT:
            at = 0
            while at < len(seg):
                if at + 17 > len(seg):
                    raise ValueError("JPEG-LL: DHT truncated")
                tc_th = seg[at]
                tc, th = tc_th >> 4, tc_th & 0x0F
                if tc > 1:
                    raise ValueError(f"JPEG-LL: DHT table class {tc} invalid")
                bits_arr = list(seg[at + 1:at + 17])
                n = sum(bits_arr)
                if at + 17 + n > len(seg):
                    raise ValueError("JPEG-LL: DHT values truncated")
                huffval = list(seg[at + 17:at + 17 + n])
                # lossless scans use DC-class (Tc=0) tables only; an
                # AC-class table with the same id is legal to define but
                # must NOT shadow the DC one (T.81 B.2.4.2 keys by Tc+Th)
                if tc == 0:
                    tables[th] = _HuffDecoder(bits_arr, huffval)
                at += 17 + n
        elif marker == _DRI:
            if len(seg) != 2:
                raise ValueError("JPEG-LL: DRI length invalid")
            (restart_interval,) = struct.unpack(">H", seg)
            if restart_interval:
                raise ValueError(
                    "JPEG-LL: restart intervals unsupported (lossless "
                    "restart prediction state is implementation-defined)")
        elif marker == _SOS:
            if not comp_ids:
                raise ValueError("JPEG-LL: SOS before SOF3")
            ns = seg[0] if seg else 0
            if len(seg) != 1 + 2 * ns + 3 or ns != ncomp:
                raise ValueError("JPEG-LL: SOS header invalid "
                                 "(single interleaved scan expected)")
            comps: list[tuple[int, int]] = []
            for c in range(ns):
                cs, tdta = seg[1 + 2 * c:3 + 2 * c]
                if cs not in comp_ids:
                    raise ValueError(f"JPEG-LL: SOS component {cs} unknown")
                comps.append((cs, tdta >> 4))
            pred_sel, _se, ahal = seg[1 + 2 * ns:4 + 2 * ns]
            pt = ahal & 0x0F
            if not (1 <= pred_sel <= 7):
                raise ValueError(
                    f"JPEG-LL: selection value {pred_sel} out of range 1-7")
            scan = (comps, pred_sel, pt)
        elif marker in _SKIPPABLE:
            pass
        else:
            raise ValueError(
                f"JPEG-LL: unsupported marker 0x{marker:02x} "
                f"(only lossless SOF3 frames decode here)")

    comps, pred_sel, pt = scan
    for _cid, td in comps:
        if td not in tables:
            raise ValueError(f"JPEG-LL: Huffman table {td} undefined")
    r = _BitReader(data, pos)
    nch = len(comps)
    default = 1 << (precision - 1 - pt)
    rows: list[list[list[int]]] = []  # per row: one list per component
    cur = [[0] * width for _ in range(nch)]
    prev = [[default] * width for _ in range(nch)]

    for y in range(height):
        for x in range(width):
            for c in range(nch):
                table = tables[comps[c][1]]
                cat = table.read(r)
                if cat > 16:
                    raise ValueError(f"JPEG-LL: diff category {cat} invalid")
                diff = _extend(r.bits(cat) if 0 < cat < 16 else 0, cat)
                # neighborhood (T.81 H.1.2.1): first sample → default,
                # rest of first line → Ra, line starts → Rb, else the
                # scan's selected predictor over (Ra, Rb, Rc)
                if x == 0 and y == 0:
                    pred = default
                elif x == 0:
                    pred = prev[c][0]
                elif y == 0:
                    pred = cur[c][x - 1]
                else:
                    pred = _predict(pred_sel, cur[c][x - 1], prev[c][x],
                                    prev[c][x - 1])
                cur[c][x] = (pred + diff) & 0xFFFF  # mod-2^16 (H.1.2.1)
        prev = cur
        rows.append(cur)
        cur = [[0] * width for _ in range(nch)]

    # expect EOI after pad bits
    try:
        m = r.align_to_marker()
    except ValueError:
        raise ValueError("JPEG-LL: EOI missing after entropy data") from None
    if m != _EOI:
        raise ValueError(f"JPEG-LL: expected EOI, found marker 0x{m:02x}")
    # after EOI only even-length zero padding may follow — anything else
    # (e.g. a second concatenated frame) must fail loudly, not vanish
    if any(data[r.pos:]):
        raise ValueError(
            f"JPEG-LL: {len(data) - r.pos} trailing bytes after EOI "
            f"(multi-frame streams are not handled)")

    shift = pt
    step = 2 if precision > 8 else 1
    out = bytearray(width * height * nch * step)
    i = 0
    for y in range(height):
        comp_rows = rows[y]
        for x in range(width):
            for c in range(nch):
                v = comp_rows[c][x] << shift
                if step == 2:
                    out[i] = v & 0xFF
                    out[i + 1] = (v >> 8) & 0xFF
                    i += 2
                else:
                    out[i] = v & 0xFF
                    i += 1
    return {"pixels": bytes(out), "width": width, "height": height,
            "channels": nch, "bits": precision}
