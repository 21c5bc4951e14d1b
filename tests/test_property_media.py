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


# ---------------------------------------------------------------------------
# r10 parsers: WARC dechunk, AVI container, charset cascade, robots regex
# ---------------------------------------------------------------------------

from hypothesis import given, settings as hyp_settings
from hypothesis import strategies as st


@given(chunks=st.lists(st.binary(min_size=0, max_size=64), min_size=0,
                       max_size=8))
@hyp_settings(max_examples=40, deadline=None)
def test_dechunk_roundtrip(chunks):
    """Any chunk sequence framed per RFC 9112 §7.1 dechunks back to the
    concatenation (chunk extensions tolerated via split discipline)."""
    from thewhisperdb_spark.sources.warc import _dechunk

    framed = b"".join(b"%x\r\n" % len(c) + c + b"\r\n"
                      for c in chunks if c) + b"0\r\n\r\n"
    assert _dechunk(framed) == b"".join(c for c in chunks if c)


@given(rasters=st.lists(
    st.lists(st.lists(st.integers(0, 255), min_size=8, max_size=8),
             min_size=8, max_size=8), min_size=1, max_size=4),
    usec=st.integers(1, 10_000_000))
@hyp_settings(max_examples=20, deadline=None)
def test_avi_container_roundtrip(rasters, usec):
    """encode_mjpeg_avi -> decode_avi_frames preserves frame count,
    timestamps, and per-frame JPEG payload decode (tolerance via the
    committed codec, exactness of framing via frame identity)."""
    import numpy as np

    from thewhisperdb_spark.sources.jpegenc import (
        encode_gray_baseline,
        encode_mjpeg_avi,
    )
    from thewhisperdb_spark.sources.multimodal import (
        _decode_jpeg,
        decode_avi_frames,
    )

    frames = [encode_gray_baseline(np.array(r, dtype=np.float64))
              for r in rasters]
    avi = encode_mjpeg_avi(frames, usec_per_frame=usec, width=8, height=8)
    out = decode_avi_frames(avi, max_frames=16)
    assert [i for i, _, _ in out] == list(range(len(frames)))
    assert [ms for _, ms, _ in out] == [i * usec // 1000
                                        for i in range(len(frames))]
    for (_, _, raster), fr in zip(out, frames):
        assert raster == _decode_jpeg(fr)   # framing is byte-lossless
    # idx1 entries must land on the '00dc' fourcc even for the frame
    # wrapped in a 'rec ' LIST (ADVICE r10: third-party idx1-seeking
    # readers, which our movi walk doesn't emulate, read via these).
    import struct as _struct
    movi_at = avi.find(b"movi")
    idx_at = avi.find(b"idx1")
    assert movi_at > 0 and idx_at > movi_at
    n_entries = _struct.unpack("<I", avi[idx_at + 4:idx_at + 8])[0] // 16
    assert n_entries == len(frames)
    for e in range(n_entries):
        ent = avi[idx_at + 8 + 16 * e:idx_at + 8 + 16 * (e + 1)]
        fourcc, _flags, off, size = _struct.unpack("<4sIII", ent)
        assert fourcc == b"00dc"
        at = movi_at + off                 # offset is from 'movi' fourcc
        assert avi[at:at + 4] == b"00dc"
        assert _struct.unpack("<I", avi[at + 4:at + 8])[0] == size
        assert avi[at + 8:at + 8 + size] == frames[e]


@given(text=st.text(max_size=80),
       enc=st.sampled_from(["utf-8", "utf-16-le", "utf-16-be", "cp1251",
                            "shift_jis", "latin-1"]))
@hyp_settings(max_examples=60, deadline=None)
def test_sniff_decode_declared_roundtrip(text, enc):
    """Encodable text + an honest transport declaration round-trips for
    every supported family (BOM added for the UTF-16 flavors)."""
    import codecs as _codecs

    from thewhisperdb_spark.operators.encoding import sniff_decode

    try:
        data = text.encode(enc)
    except (UnicodeEncodeError, ValueError):
        return                     # text not representable in enc: skip
    if enc.startswith("utf-16"):
        bom = (_codecs.BOM_UTF16_LE if enc.endswith("le")
               else _codecs.BOM_UTF16_BE)
        got, e, s, fb = sniff_decode(bom + data, None)
        # BOM chars inside the text itself can legally shift the verdict;
        # the decode must still round-trip when no fallback fired
        if not fb and s == "bom":
            assert got == text
        return
    got, e, s, fb = sniff_decode(data, f"text/plain; charset={enc}")
    if not fb:
        assert got == text and s == "header"


@given(pattern=st.text(
    alphabet=st.sampled_from(list("abc/*.$?[](){}+^|\\")),
    min_size=1, max_size=12),
    path=st.text(alphabet=st.sampled_from(list("abc/.z")), max_size=16))
@hyp_settings(max_examples=80, deadline=None)
def test_robots_pattern_regex_matches_reference(pattern, path):
    """_pattern_regex agrees with a direct REP matcher (greedy * over
    literal segments, optional $ anchor) on arbitrary metacharacter
    soup — regex escaping can't change the match relation."""
    import re as _re

    from thewhisperdb_spark.operators.robots import _pattern_regex

    def ref_match(pat: str, p: str) -> bool:
        # reference matcher: anchored-at-0 literal segments joined by
        # greedy wildcards, optional end anchor — regex .* semantics
        anchored = pat.endswith("$")
        segs = (pat[:-1] if anchored else pat).split("*")
        if not p.startswith(segs[0]):
            return False
        pos, rest = len(segs[0]), segs[1:]

        def rec(segs, pos):
            if not segs:
                return pos == len(p) if anchored else True
            first, rest2 = segs[0], segs[1:]
            i = p.find(first, pos)
            while i != -1:
                if rec(rest2, i + len(first)):
                    return True
                i = p.find(first, i + 1)
            return False

        return rec(rest, pos) if rest else (
            (pos == len(p)) if anchored else True)

    rx = _pattern_regex(pattern)
    got = _re.search(rx, path) is not None
    assert got == ref_match(pattern, path), (pattern, path, rx)
