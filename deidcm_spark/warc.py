"""WARC (ISO 28500 / WARC/1.0-1.1) web-archive source and sink — the
standard container a 100 TB crawl pipeline ingests (Common Crawl ships
~90k ``.warc.gz`` shards per snapshot).

Pure-Python codec (no warcio — libraries outside the container are
declared scope), same pattern as the DICOM Part-10 codec in ``dcm.py``:

* :func:`parse_warc` / :func:`encode_warc` — bytes ⇄ record dicts,
  round-trip tested (tests/test_warc.py);
* :func:`read_warc_documents` — directory of ``.warc`` / ``.warc.gz``
  files → one row per *response* record, decoded down to the HTTP body
  (status line + headers split off, charset decoded), ready for the
  extraction lane via :func:`warc_to_documents`.

Format essentials implemented (the full public spec's core):

* a record = ``WARC/1.x CRLF`` + named-field headers + ``CRLF`` +
  ``Content-Length`` payload bytes + ``CRLF CRLF`` separator;
* mandatory headers honored: ``WARC-Type``, ``WARC-Date``,
  ``WARC-Record-ID``, ``Content-Length``; ``WARC-Target-URI`` and
  ``Content-Type`` read when present;
* ``.warc.gz`` files are MULTI-MEMBER gzip (one member per record, per
  the spec's recommendation so readers can seek); Python's ``gzip``
  module reads member-concatenated streams natively, so both the
  member-per-record and whole-file-gzip layouts decompress correctly;
* ``response`` records carry an HTTP message as payload: the status
  line / headers are split at the first blank line; the body is decoded
  with the charset from the HTTP ``Content-Type`` (default utf-8,
  errors replaced — crawl data is dirty by construction).

Scale design (matches the ``read_dcm_documents`` lane): ``binaryFile``
enumerates the shard tree distributedly; ONE file = ONE input row = one
task decodes it (WARC shards are written ~1 GB precisely so that a file
is a sane unit of parallelism).  Parsing is ``mapInPandas`` —
zero-shuffle, Arrow-batched; everything downstream (extraction, dedup,
packing) is the engine's normal lanes.  The per-record ``doc_id`` is a
DETERMINISTIC md5 of (target-URI, WARC-Date, record-id) so re-ingesting
a shard is idempotent and dedup keys are stable across runs.
"""

from __future__ import annotations

import gzip
import hashlib
import io
import zlib

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_CRLF = b"\r\n"


# ---------------------------------------------------------------- codec


def parse_warc(data: bytes) -> list[dict]:
    """Parse a (decompressed) WARC stream into record dicts:
    ``{"type", "record_id", "date", "uri", "content_type", "payload"}``.

    Strict on structure (a malformed length or missing version line
    raises ``ValueError`` with the byte offset — loud failure, the module
    convention), lenient on header values (crawl data is dirty)."""
    records = []
    i = 0
    n = len(data)
    while i < n:
        # skip inter-record CRLFs
        while i < n and data[i : i + 2] == _CRLF:
            i += 2
        if i >= n:
            break
        eol = data.find(_CRLF, i)
        if eol < 0 or not data[i:eol].startswith(b"WARC/"):
            raise ValueError(f"expected WARC/x.y version line at byte {i}")
        i = eol + 2
        headers: dict[str, str] = {}
        while True:
            eol = data.find(_CRLF, i)
            if eol < 0:
                raise ValueError(f"unterminated WARC header block at byte {i}")
            line = data[i:eol]
            i = eol + 2
            if line == b"":
                break
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("ascii", "replace")] = (
                v.strip().decode("utf-8", "replace")
            )
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            raise ValueError(f"missing/bad Content-Length at byte {i}")
        if i + length > n:
            raise ValueError(
                f"Content-Length {length} overruns stream at byte {i}"
            )
        records.append(
            {
                "type": headers.get("warc-type", ""),
                "record_id": headers.get("warc-record-id", ""),
                "date": headers.get("warc-date", ""),
                "uri": headers.get("warc-target-uri", ""),
                "content_type": headers.get("content-type", ""),
                "payload": data[i : i + length],
            }
        )
        i += length
    return records


def encode_warc(records: list[dict], gzip_members: bool = False) -> bytes:
    """Record dicts (the :func:`parse_warc` shape) → WARC bytes.
    ``gzip_members=True`` writes the spec-recommended one-gzip-member-per-
    record layout (what ``.warc.gz`` shards look like in the wild)."""
    out = []
    for r in records:
        head = [b"WARC/1.0"]
        for k, v in (
            ("WARC-Type", r.get("type", "response")),
            ("WARC-Record-ID", r.get("record_id", "")),
            ("WARC-Date", r.get("date", "")),
            ("WARC-Target-URI", r.get("uri", "")),
            ("Content-Type", r.get("content_type", "")),
        ):
            if v:
                head.append(f"{k}: {v}".encode("utf-8"))
        payload = r.get("payload", b"")
        head.append(f"Content-Length: {len(payload)}".encode("ascii"))
        rec = _CRLF.join(head) + _CRLF * 2 + payload + _CRLF * 2
        if gzip_members:
            buf = io.BytesIO()
            # mtime pinned: deterministic bytes (module-wide no-wall-clock rule)
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                gz.write(rec)
            rec = buf.getvalue()
        out.append(rec)
    return b"".join(out)


def split_http_response(payload: bytes) -> tuple[int, dict[str, str], bytes]:
    """HTTP message payload → (status, lowercase headers, body bytes).
    A payload without an HTTP status line comes back as (0, {}, payload)."""
    sep = payload.find(b"\r\n\r\n")
    if sep < 0 or not payload.startswith(b"HTTP/"):
        return 0, {}, payload
    head_lines = payload[:sep].split(_CRLF)
    parts = head_lines[0].split(None, 2)
    try:
        status = int(parts[1])
    except (IndexError, ValueError):
        return 0, {}, payload
    headers: dict[str, str] = {}
    for line in head_lines[1:]:
        k, _, v = line.partition(b":")
        headers[k.strip().lower().decode("ascii", "replace")] = (
            v.strip().decode("utf-8", "replace")
        )
    return status, headers, payload[sep + 4 :]


def _dechunk(body: bytes) -> bytes:
    """Decode HTTP/1.1 chunked transfer framing (hex-size lines).  Raises
    on malformed framing — the caller falls back to the raw bytes (crawl
    archives carry whatever the server sent)."""
    out = []
    i = 0
    while True:
        eol = body.index(_CRLF, i)
        size = int(body[i:eol].split(b";")[0], 16)  # chunk extensions ignored
        i = eol + 2
        if size == 0:
            break
        out.append(body[i : i + size])
        i += size + 2  # chunk data + CRLF
    return b"".join(out)


def decode_http_body(body: bytes, headers: dict[str, str]) -> bytes:
    """Undo the transfer/content codings a crawled response was stored
    with (WARC keeps the wire bytes; the consumer decodes): chunked
    framing, then gzip/deflate content encoding.  Every step is
    best-effort — malformed coding falls back to the bytes as stored."""
    if "chunked" in headers.get("transfer-encoding", "").lower():
        try:
            body = _dechunk(body)
        except (ValueError, IndexError):
            pass
    enc = headers.get("content-encoding", "").lower()
    if "gzip" in enc:
        try:
            body = gzip.decompress(body)
        except (OSError, EOFError, zlib.error):
            # truncated members raise EOFError, corrupt deflate inside the
            # gzip wrapper raises zlib.error — both common in real crawls
            pass
    elif "deflate" in enc:
        try:
            body = zlib.decompress(body)
        except zlib.error:
            try:
                body = zlib.decompress(body, -zlib.MAX_WBITS)  # raw deflate
            except zlib.error:
                pass
    return body


def _charset_of(content_type: str) -> str:
    for piece in content_type.split(";"):
        piece = piece.strip()
        if piece.lower().startswith("charset="):
            return piece[8:].strip("\"' ") or "utf-8"
    return "utf-8"


def _decode_body(body: bytes, charset: str) -> str:
    try:
        return body.decode(charset, "replace")
    except LookupError:  # unknown charset label in the wild
        return body.decode("utf-8", "replace")


# ---------------------------------------------------------------- source


WARC_DOC_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("url", StringType(), True),
        StructField("warc_date", StringType(), True),
        StructField("http_status", IntegerType(), True),
        StructField("content_type", StringType(), True),
        StructField("html", StringType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("warc_file", StringType(), True),
    ]
)


def warc_doc_id(uri: str, date: str, record_id: str) -> str:
    """Deterministic per-record id: md5 over the identity triple —
    idempotent re-ingest, stable dedup keys."""
    return hashlib.md5(f"{uri}\n{date}\n{record_id}".encode("utf-8")).hexdigest()


def warc_records(
    binary_df: DataFrame, record_types: tuple[str, ...] = ("response",)
) -> DataFrame:
    """(path, content) binary rows → one row per matching WARC record with
    the HTTP body decoded (WARC_DOC_SCHEMA).  The shared decode stage of
    the batch source (:func:`read_warc_documents`) and the streaming lane
    (``streaming.stream_warc_ingest`` — foreachBatch hands it each
    micro-batch of newly-landed shard files).

    Non-matching record types (warcinfo, request, metadata, ...) are
    skipped; files whose name ends in ``.gz`` are gunzipped first
    (multi-member safe).

    ``n_bytes`` is the DECODED body size — after chunked transfer
    decoding and Content-Encoding (gzip/deflate) decompression — i.e. the
    size of the bytes that produced ``html``, NOT the stored WARC record
    length or the wire Content-Length."""
    import pandas as pd

    types = tuple(record_types)

    def run(batches):
        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                raw = bytes(content)
                if p.endswith(".gz"):
                    raw = gzip.decompress(raw)
                for rec in parse_warc(raw):
                    if rec["type"] not in types:
                        continue
                    status, http_headers, body = split_http_response(
                        rec["payload"]
                    )
                    body = decode_http_body(body, http_headers)
                    ctype = http_headers.get("content-type", rec["content_type"])
                    rows.append(
                        {
                            "doc_id": warc_doc_id(
                                rec["uri"], rec["date"], rec["record_id"]
                            ),
                            "url": rec["uri"],
                            "warc_date": rec["date"],
                            "http_status": status,
                            "content_type": ctype,
                            "html": _decode_body(body, _charset_of(ctype)),
                            "n_bytes": len(body),
                            "warc_file": p.rsplit("/", 1)[-1],
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in WARC_DOC_SCHEMA])

    return binary_df.select("path", "content").mapInPandas(run, WARC_DOC_SCHEMA)


def read_warc_documents(
    spark: SparkSession, path: str, record_types: tuple[str, ...] = ("response",)
) -> DataFrame:
    """Directory/glob of ``.warc`` / ``.warc.gz`` shards → decoded records
    (see :func:`warc_records`); ``binaryFile`` enumerates distributedly,
    one shard = one task."""
    raw = spark.read.format("binaryFile").load(path)
    return warc_records(raw, record_types)


def warc_to_documents(warc_df: DataFrame, keep_url: bool = False) -> DataFrame:
    """WARC rows → the raw-document shape the extraction/scrub/dedup lanes
    take: ``(doc_id, text, lang, source)`` with ``source`` = the URL's
    registrable host (what ``cap_per_source`` balances on).  Keeps OK
    (2xx) HTML responses only — the standard crawl-pipeline gate.
    ``keep_url=True`` carries the record URL through (the URL-keyed
    streaming dedup gate needs it)."""
    cols = [
        F.col("doc_id"),
        F.col("html").alias("text"),
        F.lit("").alias("lang"),
        F.coalesce(
            # scheme matching is case-insensitive (RFC 3986 §3.1) and hosts
            # compare case-insensitively — without the lower(), Example.COM
            # and example.com count as two sources in cap_per_source
            F.lower(F.regexp_extract(
                "url", r"(?i)^[a-z][a-z0-9+.-]*://([^/:?#]+)", 1)),
            F.lit(""),
        ).alias("source"),
    ]
    if keep_url:
        cols.append(F.col("url"))
    return warc_df.filter(
        (F.col("http_status") >= 200)
        & (F.col("http_status") < 300)
        & F.lower(F.coalesce("content_type", F.lit(""))).contains("html")
    ).select(*cols)
