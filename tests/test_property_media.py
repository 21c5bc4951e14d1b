"""Property-based roundtrips for the round-9 byte-level parsers: GIF
LZW, WARC record framing, and PDF literal strings — random inputs
through build -> parse must reproduce the source exactly (hypothesis,
dev-scale examples)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


def _lzw_trivial(pixels, min_code):
    clear, end, width = 1 << min_code, (1 << min_code) + 1, min_code + 1
    buf = nbits = 0
    out = bytearray()
    for code in [clear] + [c for p in pixels for c in (p, clear)][:-1] \
            + [end]:
        buf |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(buf & 0xFF)
            buf >>= 8
            nbits -= 8
    if nbits:
        out.append(buf & 0xFF)
    return bytes(out)


@settings(max_examples=60, deadline=None)
@given(st.data())
def test_gif_lzw_roundtrip(data):
    """Arbitrary pixel streams at arbitrary code sizes decode back
    exactly through the GIF LZW decoder (clear-per-pixel encoding keeps
    the encoder spec-trivial while exercising the decoder's CLEAR/root
    paths; a second pass re-encodes the DECODED stream and must match)."""
    from thewhisperdb_spark.sources.multimodal import _gif_lzw

    min_code = data.draw(st.integers(2, 8))
    pixels = data.draw(st.lists(st.integers(0, (1 << min_code) - 1),
                                min_size=1, max_size=200))
    blob = _lzw_trivial(pixels, min_code)
    assert _gif_lzw(blob, min_code, len(pixels)) == pixels
    assert _lzw_trivial(_gif_lzw(blob, min_code, len(pixels)),
                        min_code) == blob


@settings(max_examples=40, deadline=None)
@given(st.lists(st.binary(min_size=0, max_size=300), min_size=1,
                max_size=6))
def test_warc_record_roundtrip(payloads):
    """Random binary payloads — including ones containing CRLF pairs and
    'WARC/' lookalikes — frame into records and parse back exactly
    (Content-Length delimiting must never resync on payload content)."""
    from thewhisperdb_spark.sources.warc import parse_warc

    warc = b"".join(
        (b"WARC/1.0\r\nWARC-Type: resource\r\n"
         b"WARC-Target-URI: urn:x:" + str(i).encode() + b"\r\n"
         b"Content-Type: application/octet-stream\r\n"
         b"Content-Length: " + str(len(p)).encode() + b"\r\n\r\n"
         + p + b"\r\n\r\n")
        for i, p in enumerate(payloads))
    recs = parse_warc(warc)
    assert [r["payload"] for r in recs] == payloads
    assert [r["target_uri"] for r in recs] \
        == [f"urn:x:{i}" for i in range(len(payloads))]


def _pdf_escape(text: str) -> bytes:
    out = bytearray()
    for ch in text.encode("latin-1"):
        if ch in b"()\\":
            out += b"\\" + bytes([ch])
        elif ch in (10, 13):
            out += ("\\%03o" % ch).encode()
        else:
            out.append(ch)
    return bytes(out)


@settings(max_examples=60, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=1, max_codepoint=255),
               max_size=120))
def test_pdf_literal_string_roundtrip(text):
    """Any latin-1 text escaped per §7.3.4.2 parses back exactly,
    including parens, backslashes, and CR/LF encoded as octal."""
    from thewhisperdb_spark.sources.multimodal import _pdf_lit_string

    cs = b"(" + _pdf_escape(text) + b") Tj"
    got, i = _pdf_lit_string(cs, 0)
    assert got == text
    assert cs[i:] == b" Tj"
