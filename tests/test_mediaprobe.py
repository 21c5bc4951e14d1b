"""Header-only media metadata probes (sources/mediaprobe.py): MP4 box
walk, MP3 frame/Xing headers, JPEG EXIF IFD0, RIFF/WAVE chunks — all on
hand-built byte streams with every declared value pinned, plus the
probe_media quarantine pipeline end-to-end."""

from __future__ import annotations

import os
import struct

import pytest

from thewhisperdb_spark.sources.mediaprobe import (
    probe_jpeg_exif,
    probe_media,
    probe_mp3,
    probe_mp4,
    probe_wav,
)

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def _box(typ: bytes, payload: bytes) -> bytes:
    return (len(payload) + 8).to_bytes(4, "big") + typ + payload


def make_mp4(duration_s: float = 90.0, timescale: int = 1000,
             w: int = 320, h: int = 240) -> bytes:
    ftyp = _box(b"ftyp", b"isom" + b"\x00" * 4 + b"isom")
    mvhd = _box(b"mvhd", b"\x00" * 12 + timescale.to_bytes(4, "big")
                + int(duration_s * timescale).to_bytes(4, "big")
                + b"\x00" * 80)
    tkhd_v = _box(b"tkhd", b"\x00" * 76 + (w << 16).to_bytes(4, "big")
                  + (h << 16).to_bytes(4, "big"))
    hdlr_v = _box(b"hdlr", b"\x00" * 8 + b"vide" + b"\x00" * 13)
    trak_v = _box(b"trak", tkhd_v + _box(b"mdia", hdlr_v))
    tkhd_a = _box(b"tkhd", b"\x00" * 84)
    hdlr_a = _box(b"hdlr", b"\x00" * 8 + b"soun" + b"\x00" * 13)
    trak_a = _box(b"trak", tkhd_a + _box(b"mdia", hdlr_a))
    moov = _box(b"moov", mvhd + trak_v + trak_a)
    return ftyp + moov + _box(b"mdat", b"\x00" * 16)


def test_probe_mp4_duration_resolution_tracks():
    m = probe_mp4(make_mp4())
    assert m["brand"] == "isom"
    assert m["duration_s"] == 90.0
    assert (m["width"], m["height"]) == (320, 240)
    assert (m["n_tracks"], m["n_video"], m["n_audio"]) == (2, 1, 1)
    # 64-bit mvhd (version 1)
    mvhd1 = _box(b"mvhd", b"\x01" + b"\x00" * 19
                 + (600).to_bytes(4, "big") + (45_000).to_bytes(8, "big")
                 + b"\x00" * 80)
    one = _box(b"ftyp", b"mp42" + b"\x00" * 4) + _box(b"moov", mvhd1)
    assert probe_mp4(one)["duration_s"] == 75.0
    # corrupt: child box overruns its container
    bad = _box(b"moov", (999).to_bytes(4, "big") + b"mvhd" + b"\x00" * 8)
    with pytest.raises(ValueError, match="overruns"):
        probe_mp4(bad)
    with pytest.raises(ValueError, match="no moov"):
        probe_mp4(_box(b"ftyp", b"isom" + b"\x00" * 4))
    with pytest.raises(ValueError, match="timescale is zero"):
        probe_mp4(_box(b"moov", _box(b"mvhd", b"\x00" * 100)))


def make_mp3_frame(fill: bytes = b"\x00", xing_frames: int | None = None,
                   kbps_idx: int = 9) -> bytes:
    # MPEG1 Layer III, 44100 Hz, joint stereo; idx 9 = 128 kbps
    hdr = bytes([0xFF, 0xFB, (kbps_idx << 4) | 0x00, 0x40])
    length = 144 * [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
                    224, 256, 320][kbps_idx] * 1000 // 44100
    body = bytearray(fill * length)[:length]
    if xing_frames is not None:
        off = 4 + 32                       # MPEG1, non-mono side info
        body[off:off + 12] = (b"Xing" + (1).to_bytes(4, "big")
                              + xing_frames.to_bytes(4, "big"))
    body[:4] = hdr
    return bytes(body)


def test_probe_mp3_cbr_xing_and_id3_skip():
    cbr = make_mp3_frame() * 3
    m = probe_mp3(cbr)
    assert (m["bitrate_kbps"], m["sample_rate"], m["vbr"]) == (128, 44100,
                                                               False)
    assert abs(m["duration_s"] - len(cbr) * 8 / 128_000) < 1e-9
    # Xing: duration from the EXACT frame count, flagged vbr
    x = probe_mp3(make_mp3_frame(xing_frames=100) + make_mp3_frame())
    assert x["vbr"] is True
    assert abs(x["duration_s"] - 100 * 1152 / 44100) < 1e-9
    # ID3v2 skipped via its syncsafe size — including a false 0xFFE0
    # sync INSIDE the tag, rejected because no valid frame follows it
    id3 = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 10]) + b"\xff\xee" + b"x" * 8
    m2 = probe_mp3(id3 + cbr)
    assert m2["bitrate_kbps"] == 128
    assert abs(m2["duration_s"] - len(cbr) * 8 / 128_000) < 1e-9
    with pytest.raises(ValueError, match="no MP3 frame sync"):
        probe_mp3(b"ID3\x04\x00\x00" + bytes([0, 0, 0, 4]) + b"\x00" * 64)


def make_exif_app1(orientation: int = 6, make: bytes = b"AcmeCorp",
                   model: bytes = b"X1") -> bytes:
    # little-endian TIFF, IFD0 with orientation + make (offset) + model
    entries = b""
    make_z, model_z = make + b"\x00", model + b"\x00"
    val_off = 8 + 2 + 12 * 3 + 4            # after IFD0 + next-IFD pointer
    entries += struct.pack("<HHI", 0x010F, 2, len(make_z)) \
        + struct.pack("<I", val_off)
    entries += struct.pack("<HHIHH", 0x0110, 2, len(model_z), 0, 0) \
        if len(model_z) > 4 else \
        struct.pack("<HHI", 0x0110, 2, len(model_z)) \
        + model_z.ljust(4, b"\x00")
    entries += struct.pack("<HHIHH", 0x0112, 3, 1, orientation, 0)
    tiff = (b"II" + struct.pack("<HI", 42, 8)
            + struct.pack("<H", 3) + entries + struct.pack("<I", 0)
            + make_z)
    payload = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + (len(payload) + 2).to_bytes(2, "big") + payload


def test_probe_jpeg_exif_orientation_camera_dims():
    base = open(os.path.join(FIXTURES, "tiny.jpg"), "rb").read()
    # no EXIF: dims from SOF, orientation stays None (undeclared)
    plain = probe_jpeg_exif(base)
    assert (plain["width"], plain["height"]) == (24, 20)
    assert plain["orientation"] is None and plain["progressive"] is False
    # inject an APP1 right after SOI
    tagged = base[:2] + make_exif_app1() + base[2:]
    m = probe_jpeg_exif(tagged)
    assert (m["width"], m["height"], m["orientation"]) == (24, 20, 6)
    assert (m["make"], m["model"]) == ("AcmeCorp", "X1")
    # big-endian TIFF: same fields through the MM path
    mm_tiff = (b"MM" + struct.pack(">HI", 42, 8) + struct.pack(">H", 1)
               + struct.pack(">HHIHH", 0x0112, 3, 1, 3, 0)
               + struct.pack(">I", 0))
    payload = b"Exif\x00\x00" + mm_tiff
    app1 = b"\xff\xe1" + (len(payload) + 2).to_bytes(2, "big") + payload
    assert probe_jpeg_exif(base[:2] + app1 + base[2:])["orientation"] == 3
    # progressive flag from SOF2
    prog = open(os.path.join(FIXTURES, "tiny_prog.jpg"), "rb").read()
    assert probe_jpeg_exif(prog)["progressive"] is True
    # corrupt: IFD offset beyond the APP1 payload must not be followed
    bad_tiff = b"II" + struct.pack("<HI", 42, 99999)
    payload = b"Exif\x00\x00" + bad_tiff
    app1 = b"\xff\xe1" + (len(payload) + 2).to_bytes(2, "big") + payload
    with pytest.raises(ValueError, match="out of bounds"):
        probe_jpeg_exif(base[:2] + app1 + base[2:])
    with pytest.raises(ValueError, match="no SOF"):
        probe_jpeg_exif(b"\xff\xd8\xff\xd9")


def test_probe_wav_header_only():
    m = probe_wav(open(os.path.join(FIXTURES, "tiny.wav"), "rb").read())
    assert m["sample_rate"] > 0 and m["channels"] >= 1
    assert m["duration_s"] > 0
    # duration must agree with the full PCM decode
    from thewhisperdb_spark.sources.multimodal import decode_wav
    rate, pcm = decode_wav(open(os.path.join(FIXTURES, "tiny.wav"),
                                "rb").read())
    assert abs(m["duration_s"] - len(pcm) / rate / m["channels"]) < 1e-9
    with pytest.raises(ValueError, match="missing fmt or data"):
        probe_wav(b"RIFF\x04\x00\x00\x00WAVE")


def test_probe_media_pipeline_quarantine(spark, tmp_path):
    """binaryFile -> probe_media: one metadata row per file, corrupt and
    unprobed containers quarantined in status, probes never decode."""
    from thewhisperdb_spark.sources.multimodal import (
        read_binary_files,
        with_media_metadata,
    )

    (tmp_path / "clip.mp4").write_bytes(make_mp4(duration_s=12.5))
    (tmp_path / "song.mp3").write_bytes(make_mp3_frame() * 4)
    (tmp_path / "broken.mp4").write_bytes(
        _box(b"ftyp", b"isom" + b"\x00" * 4) + b"\x00\x00\x09\x99moov")
    (tmp_path / "blob.bin").write_bytes(b"\x01\x02\x03\x04" * 8)
    import shutil
    shutil.copy(os.path.join(FIXTURES, "tiny.jpg"), tmp_path / "tiny.jpg")
    shutil.copy(os.path.join(FIXTURES, "tiny.wav"), tmp_path / "tiny.wav")

    media = with_media_metadata(read_binary_files(spark, str(tmp_path)))
    rows = {r["path"].rsplit("/", 1)[-1]: r
            for r in probe_media(media).collect()}
    assert rows["clip.mp4"]["status"] == "ok"
    assert rows["clip.mp4"]["container"] == "mp4"
    assert rows["clip.mp4"]["duration_s"] == 12.5
    assert (rows["clip.mp4"]["width"], rows["clip.mp4"]["height"]) == (320,
                                                                       240)
    assert rows["song.mp3"]["container"] == "mp3"
    assert rows["song.mp3"]["bitrate_kbps"] == 128
    assert rows["tiny.jpg"]["container"] == "jpeg"
    assert (rows["tiny.jpg"]["width"], rows["tiny.jpg"]["height"]) == (24,
                                                                       20)
    assert rows["tiny.wav"]["container"] == "wav"
    assert rows["broken.mp4"]["status"].startswith("ValueError")
    assert rows["blob.bin"]["status"].startswith("NotImplementedError")


def test_probe_media_corrupt_bytes_taxonomy():
    """Byte-level fuzz over valid probe inputs: every mutation either
    probes to a dict or raises ValueError/NotImplementedError — never
    KeyError/IndexError/struct.error/NameError (the taxonomy contract
    that quarantine mode relies on)."""
    import random

    from thewhisperdb_spark.sources.mediaprobe import _probe_one

    base_jpg = open(os.path.join(FIXTURES, "tiny.jpg"), "rb").read()
    seeds = [make_mp4(), make_mp3_frame() * 3,
             base_jpg[:2] + make_exif_app1() + base_jpg[2:],
             open(os.path.join(FIXTURES, "tiny.wav"), "rb").read()]
    rng = random.Random(99)
    for seed in seeds:
        for case in range(120):
            buf = bytearray(seed)
            mode = case % 3
            if mode == 0:
                del buf[rng.randrange(1, len(buf)):]
            elif mode == 1:
                for _ in range(rng.randrange(1, 6)):
                    buf[rng.randrange(len(buf))] = rng.randrange(256)
            else:
                buf = bytearray(seed[:12]) + bytearray(
                    rng.randrange(256) for _ in range(rng.randrange(2, 60)))
            try:
                got = _probe_one(bytes(buf))
                assert isinstance(got, dict)
            except (ValueError, NotImplementedError):
                pass


def test_probe_jpeg_fill_bytes_before_marker():
    """T.81 B.1.1.2: markers may be preceded by any number of 0xFF fill
    bytes — the header walk must skip them, not desync."""
    base = open(os.path.join(FIXTURES, "tiny.jpg"), "rb").read()
    m = probe_jpeg_exif(base[:2] + b"\xff\xff\xff" + base[2:])
    assert (m["width"], m["height"]) == (24, 20)


def test_orient_raster_all_eight():
    """EXIF orientations 1..8 on an asymmetric 2x3 raster, each pinned
    to its hand-derived result, plus the involution/rotation identities
    (2,3,4,5,7 self-inverse; 6 then 8 = identity)."""
    from thewhisperdb_spark.sources.multimodal import orient_raster

    r = [[1, 2, 3], [4, 5, 6]]
    assert orient_raster(r, None) == r and orient_raster(r, 1) == r
    assert orient_raster(r, 2) == [[3, 2, 1], [6, 5, 4]]
    assert orient_raster(r, 3) == [[6, 5, 4], [3, 2, 1]]
    assert orient_raster(r, 4) == [[4, 5, 6], [1, 2, 3]]
    assert orient_raster(r, 5) == [[1, 4], [2, 5], [3, 6]]
    assert orient_raster(r, 6) == [[4, 1], [5, 2], [6, 3]]
    assert orient_raster(r, 7) == [[6, 3], [5, 2], [4, 1]]
    assert orient_raster(r, 8) == [[3, 6], [2, 5], [1, 4]]
    for o in (2, 3, 4, 5, 7):
        assert orient_raster(orient_raster(r, o), o) == r
    assert orient_raster(orient_raster(r, 6), 8) == r
    with pytest.raises(ValueError, match="1..8"):
        orient_raster(r, 9)
