"""WARC source/sink: codec round-trip, hand-built golden bytes, HTTP
payload splitting, the distributed source over synthesized .warc/.warc.gz
shards, and the handoff into the extraction lane."""

import gzip
import hashlib

import pytest

from deidcm_spark.warc import (
    encode_warc,
    parse_warc,
    read_warc_documents,
    split_http_response,
    warc_doc_id,
    warc_to_documents,
)


def _http(body: str, status: int = 200, ctype: str = "text/html; charset=utf-8") -> bytes:
    b = body.encode("utf-8")
    return (
        f"HTTP/1.1 {status} X\r\nContent-Type: {ctype}\r\n"
        f"Content-Length: {len(b)}\r\n\r\n"
    ).encode() + b


def _records(n: int = 6) -> list[dict]:
    recs = [
        {
            "type": "warcinfo",
            "record_id": "<urn:uuid:info>",
            "date": "2024-01-01T00:00:00Z",
            "uri": "",
            "content_type": "application/warc-fields",
            "payload": b"software: synth",
        }
    ]
    for i in range(n):
        recs.append(
            {
                "type": "request",
                "record_id": f"<urn:uuid:req{i}>",
                "date": "2024-01-01T00:00:00Z",
                "uri": f"https://site{i % 3}.example/page{i}",
                "content_type": "application/http; msgtype=request",
                "payload": b"GET /page HTTP/1.1\r\n\r\n",
            }
        )
        status = 404 if i == 4 else 200
        ctype = "image/png" if i == 5 else "text/html; charset=utf-8"
        body = f"<html><body><p>doc {i} body text</p></body></html>"
        recs.append(
            {
                "type": "response",
                "record_id": f"<urn:uuid:resp{i}>",
                "date": "2024-01-01T00:00:00Z",
                "uri": f"https://site{i % 3}.example/page{i}",
                "content_type": "application/http; msgtype=response",
                "payload": _http(body, status, ctype),
            }
        )
    return recs


# ---------- codec ----------

def test_roundtrip_plain_and_gzip_members():
    recs = _records()
    for gz in (False, True):
        data = encode_warc(recs, gzip_members=gz)
        back = parse_warc(gzip.decompress(data) if gz else data)
        assert back == recs


def test_encode_deterministic():
    assert encode_warc(_records(), gzip_members=True) == encode_warc(
        _records(), gzip_members=True
    )


def test_parse_golden_literal():
    raw = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Record-ID: <urn:uuid:abc>\r\n"
        b"WARC-Date: 2023-06-15T12:00:00Z\r\n"
        b"WARC-Target-URI: http://example.org/\r\n"
        b"Content-Type: application/http; msgtype=response\r\n"
        b"Content-Length: 5\r\n"
        b"\r\n"
        b"hello\r\n\r\n"
    )
    (r,) = parse_warc(raw)
    assert r == {
        "type": "response",
        "record_id": "<urn:uuid:abc>",
        "date": "2023-06-15T12:00:00Z",
        "uri": "http://example.org/",
        "content_type": "application/http; msgtype=response",
        "payload": b"hello",
    }


def test_parse_loud_failures():
    with pytest.raises(ValueError, match="version line"):
        parse_warc(b"NOTWARC\r\n\r\n")
    with pytest.raises(ValueError, match="Content-Length"):
        parse_warc(b"WARC/1.0\r\nWARC-Type: response\r\n\r\n")
    with pytest.raises(ValueError, match="overruns"):
        parse_warc(b"WARC/1.0\r\nContent-Length: 99\r\n\r\nshort")


def test_split_http_response():
    status, headers, body = split_http_response(_http("abc", 301, "text/html"))
    assert (status, headers["content-type"], body) == (301, "text/html", b"abc")
    # non-HTTP payload passes through untouched
    assert split_http_response(b"raw bytes") == (0, {}, b"raw bytes")


def test_charset_decode_latin1():
    body = "caf\xe9".encode("latin-1")
    payload = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=latin-1\r\n\r\n"
        + body
    )
    _, headers, raw = split_http_response(payload)
    from deidcm_spark.warc import _charset_of, _decode_body

    assert _decode_body(raw, _charset_of(headers["content-type"])) == "caf\xe9"
    # unknown charset label falls back to utf-8-with-replacement
    assert _decode_body(b"ok", "definitely-not-a-charset") == "ok"


# ---------- distributed source ----------

@pytest.fixture(scope="module")
def warc_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("warcs")
    recs = _records()
    (d / "shard0.warc").write_bytes(encode_warc(recs[: len(recs) // 2]))
    (d / "shard1.warc.gz").write_bytes(
        encode_warc(recs[len(recs) // 2 :], gzip_members=True)
    )
    return str(d)


def test_read_warc_documents(spark, warc_dir):
    df = read_warc_documents(spark, warc_dir)
    rows = {r.url: r for r in df.collect()}
    assert len(rows) == 6  # responses only; warcinfo/request skipped
    r0 = rows["https://site0.example/page0"]
    assert r0.http_status == 200 and "doc 0 body text" in r0.html
    assert "<p>" in r0.html  # body only, headers stripped, tags intact
    assert r0.doc_id == warc_doc_id(
        "https://site0.example/page0", "2024-01-01T00:00:00Z", "<urn:uuid:resp0>"
    )
    assert rows["https://site1.example/page4"].http_status == 404
    assert rows["https://site2.example/page5"].content_type.startswith("image/")
    assert {r.warc_file for r in rows.values()} == {"shard0.warc", "shard1.warc.gz"}


def test_read_warc_record_types(spark, warc_dir):
    df = read_warc_documents(spark, warc_dir, record_types=("request", "response"))
    assert df.count() == 12


def test_warc_to_documents_gates_and_source(spark, warc_dir):
    docs = warc_to_documents(read_warc_documents(spark, warc_dir))
    rows = {r.doc_id: r for r in docs.collect()}
    # 6 responses - 1 404 - 1 image = 4 OK html documents
    assert len(rows) == 4
    assert set(docs.columns) == {"doc_id", "text", "lang", "source"}
    assert {r.source for r in rows.values()} <= {
        "site0.example", "site1.example", "site2.example"
    }


def test_warc_to_documents_source_is_case_folded(spark):
    """Hosts compare case-insensitively: 'Example.COM', 'example.com' and
    an uppercase-scheme spelling are ONE source for cap_per_source, not
    three (quota evasion otherwise)."""
    rows = [
        ("d1", "http://Example.COM/a", "<html>a</html>", 200, "text/html"),
        ("d2", "http://example.com/b", "<html>b</html>", 200, "text/html"),
        ("d3", "HTTP://EXAMPLE.com/c", "<html>c</html>", 200, "text/html"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id string, url string, html string, "
              "http_status int, content_type string",
    )
    docs = warc_to_documents(df)
    assert {r.source for r in docs.collect()} == {"example.com"}


def test_warc_feeds_extraction_lane(spark, warc_dir):
    from deidcm_spark.operators.extract import extract_main_content

    warc = read_warc_documents(spark, warc_dir).filter("http_status = 200")
    out = extract_main_content(warc.select("doc_id", "html"))
    spans = {r.doc_id: r.spans for r in out.collect()}
    assert len(spans) >= 4
    assert all(len(s) >= 1 for s in spans.values())


def test_cli_warc_ingest(tmp_path, capsys, spark, warc_dir):
    import json as _json

    from deidcm_spark.__main__ import main as _main

    out = str(tmp_path / "warc_out")
    _main(["warc", "--input", warc_dir, "--output", out,
           "--shuffle-partitions", "4"])
    r = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r == {"records": 6, "documents": 4}
    docs = spark.read.parquet(out + "/documents")
    assert set(docs.columns) == {"doc_id", "text", "lang", "source"}


def test_stream_warc_ingest_bloom_gated(spark, tmp_path):
    """Two shard drops through the streaming source: the second shard's
    re-crawled page (same content, new URL) is bloom-dropped; its new
    page lands.  Plain (ungated) mode appends everything."""
    from deidcm_spark.streaming import stream_warc_ingest

    def http(body):
        return (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                + body.encode())

    def rec(i, uri, body):
        return {
            "type": "response", "record_id": f"<urn:uuid:{i}>",
            "date": "2024-01-01T00:00:00Z", "uri": uri,
            "content_type": "application/http; msgtype=response",
            "payload": http(body),
        }

    in_dir = tmp_path / "landing"
    in_dir.mkdir()
    out = str(tmp_path / "docs")
    ckpt = str(tmp_path / "ckpt")
    flt = str(tmp_path / "filter")
    (in_dir / "s0.warc.gz").write_bytes(encode_warc([
        rec(0, "https://a.example/x", "<p>first page body</p>"),
        rec(1, "https://a.example/y", "<p>second page body</p>"),
    ], gzip_members=True))
    q = stream_warc_ingest(spark, str(in_dir), out, ckpt, filter_dir=flt,
                           n_bits=1 << 16)
    q.awaitTermination(120)
    got = {r.text for r in spark.read.parquet(out).collect()}
    assert got == {"<p>first page body</p>", "<p>second page body</p>"}
    # drop 2: a re-crawl of the first page at a NEW url + one new page
    (in_dir / "s1.warc").write_bytes(encode_warc([
        rec(2, "https://mirror.example/x", "<p>first page body</p>"),
        rec(3, "https://a.example/z", "<p>third page body</p>"),
    ]))
    q = stream_warc_ingest(spark, str(in_dir), out, ckpt, filter_dir=flt,
                           n_bits=1 << 16)
    q.awaitTermination(120)
    rows = spark.read.parquet(out).collect()
    assert {r.text for r in rows} == {
        "<p>first page body</p>", "<p>second page body</p>",
        "<p>third page body</p>",
    }
    # the re-crawl (same content, mirror.example) was bloom-dropped
    assert "mirror.example" not in {r.source for r in rows}
    # ungated mode: everything (including the re-crawl) appends
    out2 = str(tmp_path / "docs_plain")
    q = stream_warc_ingest(spark, str(in_dir), out2, str(tmp_path / "ckpt2"))
    q.awaitTermination(120)
    assert spark.read.parquet(out2).count() == 4


def test_decode_http_body_codings():
    """Chunked framing + gzip/deflate content codings undone; malformed
    codings fall back to the stored bytes."""
    import zlib

    from deidcm_spark.warc import decode_http_body

    # chunked: "Wiki" + "pedia" + terminator
    chunked = b"4\r\nWiki\r\n5\r\npedia\r\n0\r\n\r\n"
    assert decode_http_body(chunked, {"transfer-encoding": "chunked"}) == b"Wikipedia"
    # chunk extensions ignored
    ext = b"4;name=v\r\nWiki\r\n0\r\n\r\n"
    assert decode_http_body(ext, {"transfer-encoding": "chunked"}) == b"Wiki"
    # gzip + deflate (zlib-wrapped AND raw)
    body = b"<html>compressed page</html>"
    assert decode_http_body(gzip.compress(body), {"content-encoding": "gzip"}) == body
    assert decode_http_body(zlib.compress(body), {"content-encoding": "deflate"}) == body
    raw_deflate = zlib.compressobj(wbits=-zlib.MAX_WBITS)
    rd = raw_deflate.compress(body) + raw_deflate.flush()
    assert decode_http_body(rd, {"content-encoding": "deflate"}) == body
    # chunked THEN gzip (transfer coding wraps content coding)
    gz = gzip.compress(body)
    framed = hex(len(gz))[2:].encode() + b"\r\n" + gz + b"\r\n0\r\n\r\n"
    assert decode_http_body(
        framed, {"transfer-encoding": "chunked", "content-encoding": "gzip"}
    ) == body
    # malformed fall-backs
    assert decode_http_body(b"nonsense", {"transfer-encoding": "chunked"}) == b"nonsense"
    assert decode_http_body(b"notgzip", {"content-encoding": "gzip"}) == b"notgzip"
    assert decode_http_body(body, {}) == body
    # truncated gzip member raises EOFError (not OSError) — extremely
    # common in real crawls; must fall back, not crash the shard's task
    trunc = gzip.compress(body)[:-5]
    assert decode_http_body(trunc, {"content-encoding": "gzip"}) == trunc
    # valid gzip header, corrupt deflate stream inside -> zlib.error
    corrupt = bytearray(gzip.compress(body))
    corrupt[14] ^= 0xFF
    assert decode_http_body(bytes(corrupt), {"content-encoding": "gzip"}) \
        == bytes(corrupt)


def test_read_warc_gzip_encoded_response(spark, tmp_path):
    """A response stored with Content-Encoding: gzip decodes to readable
    html through the distributed source."""
    body = b"<html><p>compressed crawl page</p></html>"
    payload = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Content-Encoding: gzip\r\n\r\n" + gzip.compress(body)
    )
    rec = {
        "type": "response", "record_id": "<urn:uuid:gz>",
        "date": "2024-01-01T00:00:00Z", "uri": "https://gz.example/p",
        "content_type": "application/http; msgtype=response",
        "payload": payload,
    }
    d = tmp_path / "w"
    d.mkdir()
    (d / "s.warc").write_bytes(encode_warc([rec]))
    (row,) = read_warc_documents(spark, str(d)).collect()
    assert row.html == body.decode() and row.n_bytes == len(body)


def test_stream_warc_ingest_url_keyed(spark, tmp_path):
    """dedup_by='url': the gate keys on the CANONICAL URL — a re-fetch of
    the same canonical URL with CHANGED content is dropped (content gate
    would admit it), while a new URL carrying identical content is
    admitted (content gate would drop it)."""
    from deidcm_spark.streaming import stream_warc_ingest

    def http(body):
        return (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                + body.encode())

    def rec(i, uri, body):
        return {
            "type": "response", "record_id": f"<urn:uuid:{i}>",
            "date": "2024-01-01T00:00:00Z", "uri": uri,
            "content_type": "application/http; msgtype=response",
            "payload": http(body),
        }

    in_dir = tmp_path / "landing"
    in_dir.mkdir()
    out = str(tmp_path / "docs")
    ckpt = str(tmp_path / "ckpt")
    flt = str(tmp_path / "filter")
    (in_dir / "s0.warc.gz").write_bytes(encode_warc([
        rec(0, "https://a.example/x?utm_source=feed", "<p>version one</p>"),
    ], gzip_members=True))
    q = stream_warc_ingest(spark, str(in_dir), out, ckpt, filter_dir=flt,
                           n_bits=1 << 16, dedup_by="url")
    q.awaitTermination(120)
    rows = spark.read.parquet(out).collect()
    assert {r.text for r in rows} == {"<p>version one</p>"}
    assert {r.canonical_url for r in rows} == {"https://a.example/x"}
    # drop 2: same canonical url (cosmetic variants), NEW content -> gate
    # drops it; plus a NEW url with the batch-1 content -> gate admits it
    (in_dir / "s1.warc").write_bytes(encode_warc([
        rec(1, "https://A.example/x#frag", "<p>version two</p>"),
        rec(2, "https://b.example/y", "<p>version one</p>"),
    ]))
    q = stream_warc_ingest(spark, str(in_dir), out, ckpt, filter_dir=flt,
                           n_bits=1 << 16, dedup_by="url")
    q.awaitTermination(120)
    rows = spark.read.parquet(out).collect()
    assert {(r.canonical_url, r.text) for r in rows} == {
        ("https://a.example/x", "<p>version one</p>"),
        ("https://b.example/y", "<p>version one</p>"),
    }
    with pytest.raises(ValueError, match="filter_dir"):
        stream_warc_ingest(spark, str(in_dir), out, ckpt, dedup_by="url")
    with pytest.raises(ValueError, match="dedup_by"):
        stream_warc_ingest(spark, str(in_dir), out, ckpt, filter_dir=flt,
                           dedup_by="bogus")
