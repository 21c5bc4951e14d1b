"""WARC source (sources/warc.py): record framing (plain +
gzip-per-record), HTTP response unwrapping, corrupt-archive quarantine,
and the WARC -> HTML -> text pipeline end to end."""

from __future__ import annotations

import gzip

import pytest

from thewhisperdb_spark.sources.warc import parse_warc, read_warc


def _record(warc_type: str, payload: bytes, uri: str | None = None,
            content_type: str = "application/http; msgtype=response",
            extra: bytes = b"") -> bytes:
    hdr = (f"WARC/1.0\r\nWARC-Type: {warc_type}\r\n"
           f"WARC-Date: 2026-08-16T00:00:00Z\r\n").encode()
    if uri:
        hdr += f"WARC-Target-URI: {uri}\r\n".encode()
    hdr += f"Content-Type: {content_type}\r\n".encode() + extra
    hdr += f"Content-Length: {len(payload)}\r\n\r\n".encode()
    return hdr + payload + b"\r\n\r\n"


def _http_response(body: bytes, ctype: str = "text/html",
                   status: int = 200) -> bytes:
    return (f"HTTP/1.1 {status} OK\r\nContent-Type: {ctype}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n").encode() + body


HTML = (b"<html><head><title>T1</title></head>"
        b"<body><p>Crawled body text.</p></body></html>")


def make_warc() -> bytes:
    info = _record("warcinfo", b"robots: classic\r\n",
                   content_type="application/warc-fields")
    resp = _record("response", _http_response(HTML),
                   uri="https://example.com/a")
    missing = _record("response", _http_response(b"gone", status=404),
                      uri="https://example.com/b")
    return info + resp + missing


def test_parse_warc_plain_and_gzip_per_record():
    recs = parse_warc(make_warc())
    assert [r["warc_type"] for r in recs] == ["warcinfo", "response",
                                              "response"]
    assert recs[0]["http_status"] is None
    assert recs[0]["content_type"] == "application/warc-fields"
    assert recs[1]["target_uri"] == "https://example.com/a"
    assert recs[1]["http_status"] == 200
    assert recs[1]["content_type"] == "text/html"
    assert recs[1]["payload"] == HTML            # HTTP headers consumed
    assert recs[2]["http_status"] == 404 and recs[2]["payload"] == b"gone"
    # gzip with ONE MEMBER PER RECORD (the crawl framing)
    r1 = _record("warcinfo", b"x: y\r\n",
                 content_type="application/warc-fields")
    r2 = _record("response", _http_response(HTML), uri="https://e.com")
    gz = gzip.compress(r1) + gzip.compress(r2)
    recs2 = parse_warc(gz)
    assert [r["warc_type"] for r in recs2] == ["warcinfo", "response"]
    assert recs2[1]["payload"] == HTML
    # corrupt framings are the ValueError taxonomy
    with pytest.raises(ValueError, match="missing version line"):
        parse_warc(b"NOT A WARC")
    trunc = _record("warcinfo", b"x" * 50,
                    content_type="application/warc-fields")[:-30]
    with pytest.raises(ValueError, match="payload overruns"):
        parse_warc(trunc)
    with pytest.raises(ValueError, match="truncated gzip"):
        parse_warc(gzip.compress(r1)[:-4])


def test_read_warc_pipeline_to_html_text(spark, tmp_path):
    """binaryFile -> read_warc -> filter html responses -> html_extract:
    the standard crawl ingest, executor-side throughout; a corrupt
    archive quarantines as one status row."""
    from pyspark.sql import functions as F

    from thewhisperdb_spark.operators.htmltext import html_extract

    (tmp_path / "a.warc").write_bytes(make_warc())
    (tmp_path / "b.warc.gz").write_bytes(
        gzip.compress(_record("response",
                              _http_response(b"<p>Second doc</p>"),
                              uri="https://example.com/c")))
    (tmp_path / "bad.warc").write_bytes(b"garbage bytes")
    recs = read_warc(spark, str(tmp_path))
    rows = recs.collect()
    bad = [r for r in rows if r["status"] != "ok"]
    assert len(bad) == 1 and bad[0]["path"].endswith("bad.warc")
    assert bad[0]["status"].startswith("ValueError")
    html_rows = (recs.filter((F.col("warc_type") == "response")
                             & (F.col("http_status") == 200)
                             & F.col("content_type").startswith("text/html"))
                 .select(F.col("target_uri").alias("doc_id"),
                         F.decode("payload", "utf-8").alias("html")))
    out = {r["doc_id"]: r for r in html_extract(html_rows).collect()}
    assert out["https://example.com/a"]["text"] == "Crawled body text."
    assert out["https://example.com/a"]["title"] == "T1"
    assert out["https://example.com/c"]["text"] == "Second doc"


def test_parse_warc_corrupt_bytes_taxonomy():
    """Byte-level fuzz: every mutation of a valid archive parses or
    raises ValueError — never KeyError/IndexError/UnicodeDecodeError
    (the quarantine contract read_warc relies on)."""
    import random

    base = make_warc()
    gz = gzip.compress(base)
    for seed, data in ((1, base), (2, gz)):
        rng = random.Random(seed)
        for case in range(150):
            buf = bytearray(data)
            mode = case % 3
            if mode == 0:
                del buf[rng.randrange(1, len(buf)):]
            elif mode == 1:
                for _ in range(rng.randrange(1, 6)):
                    buf[rng.randrange(len(buf))] = rng.randrange(256)
            else:
                buf = bytearray(data[:10]) + bytearray(
                    rng.randrange(256) for _ in range(rng.randrange(4, 90)))
            try:
                recs = parse_warc(bytes(buf))
                assert isinstance(recs, list)
            except ValueError:
                pass


def test_chunked_body_dechunked():
    """Transfer-Encoding: chunked bodies are reassembled (RFC 9112 §7.1);
    a truncated chunk keeps the raw framing instead of quarantining."""
    chunked = b"4\r\nWiki\r\n5\r\npedia\r\n0\r\n\r\n"
    http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n"
            b"Transfer-Encoding: chunked\r\n\r\n" + chunked)
    recs = parse_warc(_record("response", http, uri="https://e.com/c"))
    assert recs[0]["payload"] == b"Wikipedia"
    # truncated mid-chunk -> raw body preserved, archive still parses
    bad = chunked[:-9]  # drop the 0-terminator
    http = (b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" + bad)
    recs = parse_warc(_record("response", http, uri="https://e.com/d"))
    assert recs[0]["payload"] == bad


def test_archive_size_cap(monkeypatch):
    """A gzip bomb / oversized archive raises (-> quarantine row) instead
    of materializing multi-GB per task."""
    import thewhisperdb_spark.sources.warc as w

    monkeypatch.setattr(w, "MAX_ARCHIVE_BYTES", 256)
    data = make_warc()
    with pytest.raises(ValueError, match="cap"):
        w.parse_warc(data)
    with pytest.raises(ValueError, match="cap"):
        w.parse_warc(gzip.compress(data))


def test_single_member_bomb_aborts_early():
    """ADVICE r10: a SINGLE-member gzip bomb must abort as soon as its
    output crosses the cap — not after materializing the whole member.
    A 256 MiB-of-zeros member against a 1 MiB cap must peak well under
    the full expansion (tracemalloc-pinned)."""
    import tracemalloc

    from thewhisperdb_spark.sources.warc import _gunzip_members

    bomb = gzip.compress(b"\x00" * (256 << 20), compresslevel=9)
    tracemalloc.start()
    try:
        with pytest.raises(ValueError, match="cap"):
            _gunzip_members(bomb, max_bytes=1 << 20)
        _cur, peak = tracemalloc.get_traced_memory()
    finally:
        tracemalloc.stop()
    # cap (1 MiB) + one 16 MiB inflate step + the compressed input,
    # with generous slack — far below the 256 MiB full expansion
    assert peak < 128 << 20


def test_build_warc_roundtrip_and_explode(spark):
    """Synthesis helpers round-trip through parse_warc (plain and
    gzip-per-record) and through the DataFrame explode entry point."""
    from thewhisperdb_spark.sources.warc import (
        build_http_response,
        build_warc,
        build_warc_record,
        explode_warc,
    )

    recs = [
        build_warc_record("warcinfo", b"crawler: t\r\n",
                          content_type="application/warc-fields"),
        build_warc_record("response",
                          build_http_response(b"<p>hi</p>"),
                          target_uri="https://e.com/a"),
    ]
    for gz in (False, True):
        out = parse_warc(build_warc(recs, gzip_per_record=gz))
        assert [r["warc_type"] for r in out] == ["warcinfo", "response"]
        assert out[1]["payload"] == b"<p>hi</p>"
        assert out[1]["http_status"] == 200
    df = spark.createDataFrame(
        [("mem://a", build_warc(recs, gzip_per_record=True))],
        "path string, content binary")
    rows = explode_warc(df).orderBy("record_idx").collect()
    assert [r["warc_type"] for r in rows] == ["warcinfo", "response"]
    assert rows[1]["target_uri"] == "https://e.com/a"
    assert rows[0]["status"] == "ok"
