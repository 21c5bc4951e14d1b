"""Container-metadata probes: duration / resolution / bitrate / EXIF from
MEDIA HEADERS ALONE — no entropy decode.

At 100 TB the first pass over a media corpus is triage (drop the 4-hour
videos, bucket by resolution, fix EXIF rotation) and none of that needs a
codec: MP4 declares duration and track geometry in its ``moov`` box tree,
MP3 declares bitrate/samplerate in every frame header (and exact frame
counts in a Xing/VBRI tag), JPEG carries orientation and camera fields in
the EXIF APP1 segment. These parsers are pure stdlib, bounds-checked
byte-walks, so the probe stage runs at scan speed — the expensive decoders
(:mod:`multimodal`) only ever see rows the probe kept.

Same error taxonomy as the decoders: ``ValueError`` = corrupt bytes,
``NotImplementedError`` = recognizable-but-ungated format. The reference
has no media probing (its only binary handling is attachment storage,
``src/server/FileStorage.cpp``); this is north-star extension surface.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

# ---- MP4 / ISO-BMFF ---------------------------------------------------------

_MP4_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts"}


def _mp4_boxes(data: bytes, start: int, end: int) -> Iterator[tuple[bytes,
                                                                    int, int]]:
    """Yield (type, payload_start, payload_end) for each box in
    [start, end); bounds-checked per ISO 14496-12 §4.2 (size 1 = 64-bit
    largesize, size 0 = to end of enclosing box)."""
    i = start
    while i < end:
        if i + 8 > end:
            raise ValueError("truncated MP4 box header")
        size = int.from_bytes(data[i:i + 4], "big")
        typ = data[i + 4:i + 8]
        payload = i + 8
        if size == 1:
            if i + 16 > end:
                raise ValueError("truncated MP4 largesize box")
            size = int.from_bytes(data[i + 8:i + 16], "big")
            payload = i + 16
        elif size == 0:
            size = end - i
        if size < payload - i or i + size > end:
            raise ValueError(f"MP4 box {typ!r} overruns its container")
        yield typ, payload, i + size
        i += size


def probe_mp4(content: bytes) -> dict:
    """ftyp brand + mvhd duration + per-trak tkhd geometry and hdlr kind:
    ``{"container": "mp4", "brand", "duration_s", "width", "height",
    "n_tracks", "n_video", "n_audio"}``. Width/height come from the first
    VIDEO track's tkhd (16.16 fixed point)."""
    data = bytes(content)
    out = {"container": "mp4", "brand": None, "duration_s": None,
           "width": None, "height": None, "n_tracks": 0,
           "n_video": 0, "n_audio": 0}
    saw_moov = False
    for typ, s, e in _mp4_boxes(data, 0, len(data)):
        if typ == b"ftyp":
            if e - s < 4:
                raise ValueError("truncated MP4 ftyp payload")
            out["brand"] = data[s:s + 4].decode("ascii", "replace").strip()
        elif typ == b"moov":
            saw_moov = True
            for t2, s2, e2 in _mp4_boxes(data, s, e):
                if t2 == b"mvhd":
                    ver = data[s2] if e2 > s2 else 255
                    if ver == 0 and e2 - s2 >= 20:
                        ts = int.from_bytes(data[s2 + 12:s2 + 16], "big")
                        dur = int.from_bytes(data[s2 + 16:s2 + 20], "big")
                    elif ver == 1 and e2 - s2 >= 32:
                        ts = int.from_bytes(data[s2 + 20:s2 + 24], "big")
                        dur = int.from_bytes(data[s2 + 24:s2 + 32], "big")
                    else:
                        raise ValueError("truncated or unknown MP4 mvhd")
                    if ts == 0:
                        raise ValueError("MP4 mvhd timescale is zero")
                    out["duration_s"] = dur / ts
                elif t2 == b"trak":
                    out["n_tracks"] += 1
                    kind, w, h = None, None, None
                    for t3, s3, e3 in _mp4_boxes(data, s2, e2):
                        if t3 == b"tkhd":
                            # width/height close the box: after ver/flags,
                            # times/ids, layer/volume, and the 36-byte
                            # matrix — offset 76 (v0) / 88 (v1)
                            ver = data[s3] if e3 > s3 else 255
                            base = s3 + (88 if ver == 1 else 76)
                            if e3 - base >= 8:
                                w = int.from_bytes(
                                    data[base:base + 4], "big") / 65536.0
                                h = int.from_bytes(
                                    data[base + 4:base + 8], "big") / 65536.0
                        elif t3 == b"mdia":
                            for t4, s4, e4 in _mp4_boxes(data, s3, e3):
                                if t4 == b"hdlr" and e4 - s4 >= 12:
                                    kind = data[s4 + 8:s4 + 12]
                    if kind == b"vide":
                        out["n_video"] += 1
                        if out["width"] is None and w:
                            out["width"] = int(round(w))
                            out["height"] = int(round(h))
                    elif kind == b"soun":
                        out["n_audio"] += 1
    if not saw_moov:
        raise ValueError("MP4 stream has no moov box (fragmented or "
                         "truncated before the index)")
    return out


# ---- MP3 --------------------------------------------------------------------

# bitrate kbps by [version-group][layer][index]; V2/V2.5 share a table
_MP3_BITRATE = {
    (1, 3): [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256,
             320],
    (1, 2): [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320,
             384],
    (1, 1): [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384,
             416, 448],
    (2, 3): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    (2, 2): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    (2, 1): [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224,
             256],
}
_MP3_RATE = {3: [44100, 48000, 32000], 2: [22050, 24000, 16000],
             0: [11025, 12000, 8000]}                     # version bits -> Hz


def _mp3_frame(data: bytes, i: int) -> tuple[int, int, int, int] | None:
    """Parse the 4-byte frame header at i: (frame_len, bitrate_kbps,
    sample_rate, samples_per_frame), or None if not a valid header."""
    if i + 4 > len(data) or data[i] != 0xFF or (data[i + 1] & 0xE0) != 0xE0:
        return None
    vbits = (data[i + 1] >> 3) & 0x03                     # 0=2.5,2=2,3=1
    layer = 4 - ((data[i + 1] >> 1) & 0x03)               # 1..3; 4=invalid
    if vbits == 1 or layer == 4:
        return None
    br_idx = (data[i + 2] >> 4) & 0x0F
    sr_idx = (data[i + 2] >> 2) & 0x03
    pad = (data[i + 2] >> 1) & 0x01
    if br_idx in (0, 15) or sr_idx == 3:
        return None
    group = 1 if vbits == 3 else 2
    kbps = _MP3_BITRATE[(group, layer)][br_idx]
    rate = _MP3_RATE[vbits][sr_idx]
    if layer == 1:
        spf, length = 384, (12000 * kbps // rate + pad) * 4
    else:
        spf = 1152 if (layer == 2 or group == 1) else 576
        length = spf // 8 * 1000 * kbps // rate + pad
    return length, kbps, rate, spf


def probe_mp3(content: bytes) -> dict:
    """First-frame header (+ Xing/Info frame count when present):
    ``{"container": "mp3", "bitrate_kbps", "sample_rate", "vbr",
    "duration_s"}``. Duration is EXACT for Xing-tagged files
    (frames x samples/frame / rate) and a CBR estimate otherwise
    (audio bytes x 8 / bitrate). A candidate sync is only accepted if
    the next frame lands on another valid header (or end-of-data) —
    false 0xFFEx syncs inside ID3 text fail that check."""
    data = bytes(content)
    i = 0
    if data[:3] == b"ID3":                                # skip ID3v2
        if len(data) < 10:
            raise ValueError("truncated ID3v2 header")
        i = 10 + sum(b << (7 * k)
                     for k, b in enumerate(reversed(data[6:10])))
    end = len(data)
    while i + 4 <= end:
        parsed = _mp3_frame(data, i)
        if parsed:
            nxt = i + parsed[0]
            if parsed[0] > 4 and (nxt >= end or _mp3_frame(data, nxt)):
                break
        i += 1
    else:
        raise ValueError("no MP3 frame sync found")
    length, kbps, rate, spf = parsed
    # Xing/Info header: offset past the side info, which depends on
    # version/channel-mode (ISO 11172-3 §2.4.1.7)
    mono = ((data[i + 3] >> 6) & 0x03) == 3
    mpeg1 = ((data[i + 1] >> 3) & 0x03) == 3
    xing_off = i + 4 + ((17 if mono else 32) if mpeg1 else (9 if mono else
                                                            17))
    vbr, duration = False, None
    if data[xing_off:xing_off + 4] in (b"Xing", b"Info"):
        vbr = data[xing_off:xing_off + 4] == b"Xing"
        flags = int.from_bytes(data[xing_off + 4:xing_off + 8], "big")
        if flags & 0x01:                                  # frame count
            n_frames = int.from_bytes(data[xing_off + 8:xing_off + 12],
                                      "big")
            duration = n_frames * spf / rate
    if duration is None:
        duration = (end - i) * 8 / (kbps * 1000)
    return {"container": "mp3", "bitrate_kbps": kbps, "sample_rate": rate,
            "vbr": vbr, "duration_s": duration}


# ---- WAV --------------------------------------------------------------------


def probe_wav(content: bytes) -> dict:
    """RIFF chunk walk — fmt (rate/channels/bits) + data size, duration =
    data bytes / byte rate. Header-only: no sample ever leaves the page
    cache, unlike :func:`multimodal.decode_wav` which materializes PCM."""
    data = bytes(content)
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    i, rate, channels, bits, byte_rate, data_len = 12, None, None, None, \
        None, None
    while i + 8 <= len(data):
        cid = data[i:i + 4]
        ln = int.from_bytes(data[i + 4:i + 8], "little")
        if cid == b"fmt ":
            if ln < 16 or i + 8 + 16 > len(data):
                raise ValueError("truncated WAV fmt chunk")
            channels, rate, byte_rate, _, bits = struct.unpack_from(
                "<HIIHH", data, i + 10)
        elif cid == b"data":
            data_len = ln
        i += 8 + ln + (ln & 1)                   # chunks are word-aligned
    if rate is None or data_len is None:
        raise ValueError("WAV stream missing fmt or data chunk")
    if byte_rate == 0:
        raise ValueError("WAV fmt byte rate is zero")
    return {"container": "wav", "sample_rate": rate, "channels": channels,
            "bits": bits, "duration_s": data_len / byte_rate,
            "bitrate_kbps": byte_rate * 8 // 1000}


# ---- JPEG EXIF --------------------------------------------------------------

_EXIF_TAGS = {0x0112: "orientation", 0x010F: "make", 0x0110: "model"}


def probe_jpeg_exif(content: bytes) -> dict:
    """Marker walk for SOF dimensions + APP1/EXIF IFD0 fields:
    ``{"container": "jpeg", "width", "height", "progressive",
    "orientation", "make", "model"}``. The TIFF IFD parse honors both
    byte orders (II/MM) and never follows offsets outside the APP1
    payload. Orientation defaults to None (absent EXIF), never 1 — the
    caller distinguishes "declared upright" from "undeclared"."""
    data = bytes(content)
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream")
    out = {"container": "jpeg", "width": None, "height": None,
           "progressive": None, "orientation": None, "make": None,
           "model": None}
    i = 2
    while i + 4 <= len(data):
        if data[i] != 0xFF:
            raise ValueError("JPEG marker desync in header walk")
        while data[i + 1] == 0xFF and i + 4 < len(data):
            i += 1                               # T.81 B.1.1.2 fill bytes
        marker = data[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        seg_len = int.from_bytes(data[i + 2:i + 4], "big")
        if seg_len < 2 or i + 2 + seg_len > len(data):
            raise ValueError("truncated JPEG segment")
        seg = data[i + 4:i + 2 + seg_len]
        if marker in (0xC0, 0xC1, 0xC2):                  # SOF0/1/2
            if len(seg) < 5:
                raise ValueError("truncated JPEG SOF")
            out["height"] = int.from_bytes(seg[1:3], "big")
            out["width"] = int.from_bytes(seg[3:5], "big")
            out["progressive"] = marker == 0xC2
            break                                          # EXIF precedes SOF
        if marker == 0xE1 and seg[:6] == b"Exif\x00\x00":
            _parse_exif_ifd0(seg[6:], out)
        if marker == 0xDA:
            break
        i += 2 + seg_len
    if out["height"] is None:
        raise ValueError("JPEG stream has no SOF marker")
    return out


def _parse_exif_ifd0(tiff: bytes, out: dict) -> None:
    if len(tiff) < 8:
        raise ValueError("truncated EXIF TIFF header")
    if tiff[:2] == b"II":
        bo = "<"
    elif tiff[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("EXIF TIFF header has unknown byte order")
    if struct.unpack_from(bo + "H", tiff, 2)[0] != 42:
        raise ValueError("EXIF TIFF magic is not 42")
    ifd = struct.unpack_from(bo + "I", tiff, 4)[0]
    if ifd + 2 > len(tiff):
        raise ValueError("EXIF IFD0 offset out of bounds")
    n = struct.unpack_from(bo + "H", tiff, ifd)[0]
    for k in range(n):
        e = ifd + 2 + 12 * k
        if e + 12 > len(tiff):
            raise ValueError("EXIF IFD0 entry out of bounds")
        tag, typ, cnt = struct.unpack_from(bo + "HHI", tiff, e)
        name = _EXIF_TAGS.get(tag)
        if name is None:
            continue
        if name == "orientation" and typ == 3 and cnt == 1:   # SHORT
            out[name] = struct.unpack_from(bo + "H", tiff, e + 8)[0]
        elif typ == 2:                                         # ASCII
            off = e + 8 if cnt <= 4 else struct.unpack_from(
                bo + "I", tiff, e + 8)[0]
            if off + cnt > len(tiff):
                raise ValueError("EXIF ASCII value out of bounds")
            out[name] = tiff[off:off + cnt].split(b"\x00")[0].decode(
                "ascii", "replace")


# ---- the probe operator -----------------------------------------------------

PROBE_SCHEMA = StructType([
    StructField("path", StringType()),
    StructField("container", StringType()),
    StructField("duration_s", DoubleType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("n_tracks", IntegerType()),
    StructField("sample_rate", IntegerType()),
    StructField("bitrate_kbps", IntegerType()),
    StructField("orientation", IntegerType()),
    StructField("detail", StringType()),       # brand / make+model / vbr
    StructField("status", StringType()),
])

_COLS = [f.name for f in PROBE_SCHEMA.fields]


def _probe_one(content: bytes) -> dict:
    data = bytes(content)
    if len(data) >= 12 and data[4:8] == b"ftyp":
        m = probe_mp4(data)
        return {"container": "mp4", "duration_s": m["duration_s"],
                "width": m["width"], "height": m["height"],
                "n_tracks": m["n_tracks"], "detail": m["brand"]}
    if data[:2] == b"\xff\xd8":
        m = probe_jpeg_exif(data)
        detail = " ".join(x for x in (m["make"], m["model"]) if x) or None
        return {"container": "jpeg", "width": m["width"],
                "height": m["height"], "orientation": m["orientation"],
                "detail": detail}
    if data[:3] == b"ID3" or (len(data) > 1 and data[0] == 0xFF
                              and (data[1] & 0xE0) == 0xE0):
        m = probe_mp3(data)
        return {"container": "mp3", "duration_s": m["duration_s"],
                "sample_rate": m["sample_rate"],
                "bitrate_kbps": m["bitrate_kbps"],
                "detail": "vbr" if m["vbr"] else "cbr"}
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        m = probe_wav(data)
        return {"container": "wav", "duration_s": m["duration_s"],
                "sample_rate": m["sample_rate"],
                "bitrate_kbps": m["bitrate_kbps"],
                "n_tracks": m["channels"]}
    raise NotImplementedError(
        "no built-in metadata probe for this container (mp4/jpeg/mp3/wav "
        "are built in; inject a prober for the rest)")


def probe_media(media: DataFrame) -> DataFrame:
    """One metadata row per media file, from HEADERS ONLY (no decode):
    MP4 duration/resolution/track counts, MP3 duration/bitrate/rate,
    JPEG dimensions/EXIF orientation/camera. Always quarantining — a
    triage pass over a 100 TB crawl must never abort on one corrupt
    header — with the standard taxonomy in ``status``
    (``NotImplementedError`` = unprobed container, ``ValueError`` =
    corrupt bytes). Arrow-batched ``mapInPandas`` over the binary
    column; the scan prunes to (path, content)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {c: [] for c in _COLS}
            for path, content in zip(pdf["path"], pdf["content"]):
                try:
                    got = _probe_one(content)
                    got["status"] = "ok"
                except Exception as e:  # noqa: BLE001 — quarantined per row
                    got = {"status": _quarantine(e)}
                got["path"] = path
                for c in _COLS:
                    rows[c].append(got.get(c))
            yield pd.DataFrame(rows)

    return media.select("path", "content").mapInPandas(run, PROBE_SCHEMA)


def _quarantine(exc: Exception) -> str:
    return f"{type(exc).__name__}: {str(exc)[:160]}"
