"""WARC (Web ARChive, ISO 28500) source: the container format web crawls
actually arrive in (Common Crawl et al.) — one file holds many records
(request/response/metadata/warcinfo), each a block of WARC headers plus a
Content-Length-delimited payload; response records nest an HTTP message
whose body is the document. Crawl WARCs are usually gzipped with ONE GZIP
MEMBER PER RECORD so readers can split without decompressing the world —
the stdlib-zlib member walk here honors that framing.

``read_warc`` is binaryFile -> Arrow ``mapInPandas``: each executor task
parses its own archives and explodes them into typed record rows (never a
driver-side loop), feeding straight into the rest of the pipeline —
``htmltext.html_extract`` for the bodies, quality filters, dedup. Parsing
is bounds-checked with the standard taxonomy (ValueError = corrupt
bytes); one corrupt archive quarantines as a single status row instead of
aborting the scan.

The reference has no archive ingestion (attachment bytes on disk only,
``src/server/FileStorage.cpp``); north-star extension surface.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)


# Decompressed-size guard: a standard ~1 GB Common Crawl WARC expands to
# several GB, and parse_warc materializes the archive per task — without a
# cap one pathological archive (or a gzip bomb) OOMs its executor. The cap
# quarantines the archive (ValueError -> status row) instead (ADVICE r9).
MAX_ARCHIVE_BYTES = 4 << 30


def _gunzip_members(data: bytes, max_bytes: int = MAX_ARCHIVE_BYTES) -> bytes:
    """Concatenate every gzip member (record-per-member crawl framing).

    The size cap is enforced INSIDE each member via ``max_length``-bounded
    ``decompress`` calls, so a single-member bomb aborts as soon as its
    output crosses the cap rather than after materializing fully
    (ADVICE r10 — the between-member check alone never fired for the
    one-member adversarial case it was added for).
    """
    out = bytearray()
    i, n = 0, len(data)
    # Inflate in bounded steps; 16 MiB keeps the Python-loop overhead
    # negligible for real archives while bounding bomb exposure.
    step = 16 << 20
    while i < n:
        d = zlib.decompressobj(wbits=31)
        chunk = data[i:]
        try:
            while True:
                out += d.decompress(chunk, step)
                if len(out) > max_bytes:
                    raise ValueError(
                        f"WARC decompresses past the {max_bytes}-byte cap")
                if d.eof or not d.unconsumed_tail:
                    break
                chunk = d.unconsumed_tail
        except zlib.error as e:                  # corrupt deflate stream
            raise ValueError(f"corrupt gzip member in WARC: {e}") from e
        if not d.eof:
            raise ValueError("truncated gzip member in WARC")
        consumed = (n - i) - len(d.unused_data)
        if consumed <= 0:
            raise ValueError("gzip member consumed no bytes")
        i += consumed
    return bytes(out)


def _dechunk(body: bytes) -> bytes:
    """Reassemble a Transfer-Encoding: chunked HTTP body (RFC 9112 §7.1):
    hex-size line (chunk extensions ignored) -> chunk bytes -> CRLF, until
    the 0-size terminator (trailers dropped). Crawl captures are routinely
    truncated mid-chunk; framing errors raise and the CALLER keeps the raw
    body (best-effort, never quarantines the whole archive)."""
    out = bytearray()
    i, n = 0, len(body)
    while i < n:
        eol = body.find(b"\r\n", i)
        if eol < 0:
            raise ValueError("chunked body: missing size line terminator")
        size_tok = body[i:eol].split(b";", 1)[0].strip()
        size = int(size_tok, 16)                 # ValueError on junk
        if size == 0:
            return bytes(out)                    # trailers ignored
        start = eol + 2
        if start + size > n:
            raise ValueError("chunked body: chunk overruns payload")
        out += body[start:start + size]
        if body[start + size:start + size + 2] != b"\r\n":
            raise ValueError("chunked body: missing chunk terminator")
        i = start + size + 2
    raise ValueError("chunked body: missing 0-size terminator")


def _parse_headers(block: bytes) -> dict[str, str]:
    """Header block (WARC or HTTP): 'Name: value' lines, latin-1 view,
    names case-folded; continuation lines folded per RFC 822."""
    headers: dict[str, str] = {}
    last = None
    for line in block.split(b"\r\n"):
        if not line:
            continue
        if line[:1] in (b" ", b"\t") and last:
            headers[last] += " " + line.strip().decode("latin-1")
            continue
        name, sep, value = line.partition(b":")
        if not sep:
            raise ValueError("malformed WARC/HTTP header line")
        last = name.strip().decode("latin-1").lower()
        headers[last] = value.strip().decode("latin-1")
    return headers


def parse_warc(data: bytes) -> list[dict]:
    """Parse one WARC file (plain or gzip-per-record) into record dicts:
    ``{"record_idx", "warc_type", "target_uri", "warc_date",
    "content_type", "http_status", "payload"}``. For HTTP response
    records the nested HTTP headers are consumed — ``payload`` is the
    BODY and ``content_type``/``http_status`` come from the HTTP message;
    for every other record type the payload is the raw WARC block and
    ``content_type`` is the WARC-level one. Chunked-transfer response
    bodies are dechunked (best-effort; a truncated chunk keeps the raw
    body). Archives decompressing past ``max_bytes`` raise (quarantine
    row upstream) rather than OOM the executor."""
    data = bytes(data)
    if len(data) > MAX_ARCHIVE_BYTES:
        raise ValueError(
            f"WARC exceeds the {MAX_ARCHIVE_BYTES}-byte archive cap")
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    records = []
    i, n, idx = 0, len(data), 0
    while i < n:
        while i < n and data[i:i + 2] == b"\r\n":   # inter-record blanks
            i += 2
        if i >= n:
            break
        if not data.startswith(b"WARC/", i):
            raise ValueError(f"WARC record {idx}: missing version line")
        ver_end = data.find(b"\r\n", i)
        hdr_end = data.find(b"\r\n\r\n", i)
        if ver_end < 0 or hdr_end < 0:
            raise ValueError(f"WARC record {idx}: truncated header block")
        headers = _parse_headers(data[ver_end + 2:hdr_end])
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError) as e:
            raise ValueError(
                f"WARC record {idx}: missing/invalid Content-Length") from e
        body_start = hdr_end + 4
        if body_start + length > n:
            raise ValueError(f"WARC record {idx}: payload overruns file")
        block = data[body_start:body_start + length]
        i = body_start + length
        rec = {
            "record_idx": idx,
            "warc_type": headers.get("warc-type"),
            "target_uri": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "content_type": headers.get("content-type"),
            "http_status": None,
            "payload": block,
        }
        ctype = (headers.get("content-type") or "").lower()
        if rec["warc_type"] == "response" and \
                ctype.startswith("application/http"):
            split = block.find(b"\r\n\r\n")
            if split < 0:
                raise ValueError(
                    f"WARC record {idx}: response without HTTP header end")
            status_line, _, hdr_block = block[:split].partition(b"\r\n")
            parts = status_line.split(None, 2)
            if len(parts) < 2 or not parts[0].startswith(b"HTTP/"):
                raise ValueError(
                    f"WARC record {idx}: malformed HTTP status line")
            http = _parse_headers(hdr_block)
            rec["http_status"] = int(parts[1])
            rec["content_type"] = http.get("content-type")
            body = block[split + 4:]
            if "chunked" in (http.get("transfer-encoding") or "").lower():
                try:
                    body = _dechunk(body)
                except ValueError:
                    pass          # truncated capture: keep the raw framing
            rec["payload"] = body
        records.append(rec)
        idx += 1
    return records


def build_http_response(body: bytes, content_type: str = "text/html",
                        status: int = 200) -> bytes:
    """HTTP/1.1 response bytes for embedding in a WARC response record
    (synthesis counterpart of the parse path; test/pipeline fixture
    builder, not a web server)."""
    return (f"HTTP/1.1 {status} OK\r\nContent-Type: {content_type}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n").encode() + body


def build_warc_record(warc_type: str, payload: bytes,
                      target_uri: str | None = None,
                      content_type: str = "application/http; "
                                          "msgtype=response",
                      warc_date: str = "2026-01-01T00:00:00Z") -> bytes:
    """One WARC/1.0 record with correct Content-Length framing."""
    hdr = (f"WARC/1.0\r\nWARC-Type: {warc_type}\r\n"
           f"WARC-Date: {warc_date}\r\n")
    if target_uri:
        hdr += f"WARC-Target-URI: {target_uri}\r\n"
    hdr += (f"Content-Type: {content_type}\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n")
    return hdr.encode() + payload + b"\r\n\r\n"


def build_warc(records: list[bytes], gzip_per_record: bool = False) -> bytes:
    """Concatenate records into one archive, optionally with the
    crawl-standard gzip-member-per-record framing."""
    if gzip_per_record:
        import gzip as _gzip

        return b"".join(_gzip.compress(r) for r in records)
    return b"".join(records)


WARC_SCHEMA = StructType([
    StructField("path", StringType()),
    StructField("record_idx", IntegerType()),
    StructField("warc_type", StringType()),
    StructField("target_uri", StringType()),
    StructField("warc_date", StringType()),
    StructField("content_type", StringType()),
    StructField("http_status", IntegerType()),
    StructField("payload", BinaryType()),
    StructField("status", StringType()),
])

_COLS = [f.name for f in WARC_SCHEMA.fields]


def read_warc(spark: SparkSession, path: str,
              glob: str | None = None) -> DataFrame:
    """binaryFile scan -> one row per WARC record, parsed executor-side.
    A corrupt archive yields a single quarantine row (NULL record fields,
    taxonomy in ``status``) — a million-archive scan must not abort on
    one bad file. Chain ``filter(warc_type = 'response' AND content_type
    LIKE 'text/html%')`` -> ``htmltext.html_extract`` for the standard
    crawl pipeline."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return explode_warc(reader.load(path).select("path", "content"))


def explode_warc(files: DataFrame) -> DataFrame:
    """(path, content) archives -> one row per WARC record (the
    record-explosion stage of ``read_warc``, exposed for archives that
    are already a DataFrame column — streaming payloads, synthesized
    fixtures, object-store readers)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {c: [] for c in _COLS}
            for fpath, content in zip(pdf["path"], pdf["content"]):
                try:
                    recs = parse_warc(bytes(content))
                except Exception as e:  # noqa: BLE001 — quarantined
                    recs = None
                    err = f"{type(e).__name__}: {str(e)[:160]}"
                if recs is None:
                    for c in _COLS:
                        rows[c].append(fpath if c == "path"
                                       else err if c == "status" else None)
                    continue
                for r in recs:
                    rows["path"].append(fpath)
                    rows["status"].append("ok")
                    for c in _COLS:
                        if c not in ("path", "status"):
                            rows[c].append(r[c])
            out = pd.DataFrame({c: rows[c] for c in _COLS})
            out["record_idx"] = pd.array(rows["record_idx"], dtype="Int32")
            out["http_status"] = pd.array(rows["http_status"],
                                          dtype="Int32")
            yield out

    return files.mapInPandas(run, WARC_SCHEMA)
