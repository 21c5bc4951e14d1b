"""Baseline JPEG encoder (egress): the JPEG counterpart of the PNG
encoder in ``multimodal.py`` — grayscale ITU-T T.81 baseline (Annex K
quant + huffman tables, restart-interval support), stdlib + numpy only.

Used for thumbnail/raster egress where downstream tooling expects .jpg,
for MJPEG-in-AVI synthesis (``encode_mjpeg_avi``), and by the committed
fixture generators (tools/make_jpeg_fixture.py, tools/make_avi_fixture.py
are thin wrappers so fixture bytes stay generator-gated). The decoder
twin is ``multimodal._decode_jpeg``; round-trip error is bounded by the
Annex-K quality-50 quantizer, exact tables pinned by the committed
fixtures.

Public-spec provenance: ITU-T T.81 (JPEG), Annex K tables; Microsoft
AVI RIFF form for the container writer.
"""

from __future__ import annotations

import struct

import numpy as np

from thewhisperdb_spark.sources.multimodal import _ZIGZAG

# Annex K.1 luminance quantization table (quality 50), zigzag order applied
# at write time
QTAB = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99]], dtype=np.float64)

# Annex K.3.1 luminance DC: BITS then HUFFVAL
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))
# Annex K.3.2 luminance AC
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]


def _codes(bits, vals):
    out, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc, self.n = 0, 0

    def put(self, code: int, length: int):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                if self.acc == 0xFF:
                    self.buf.append(0x00)      # byte stuffing
                self.acc, self.n = 0, 0

    def align(self):                            # pad with 1s (spec F.1.2.3)
        while self.n:
            self.put(1, 1)


def make_pattern(h: int = 20, w: int = 24) -> np.ndarray:
    """Deterministic gradient x checkerboard test card in [0, 255]."""
    y, x = np.mgrid[0:h, 0:w]
    img = 32 + 8 * ((x // 4 + y // 4) % 2) * 16 + x * 4 + y * 2
    return np.clip(img, 0, 255).astype(np.float64)


def make_block_raster(seed: str, gh: int = 8, gw: int = 9,
                      cell: int = 4) -> np.ndarray:
    """Deterministic BLOCKY test raster (gh*cell x gw*cell): one of four
    well-separated gray levels per dHash-grid-aligned cell, derived from
    sha256(seed). Block structure makes the dHash robust to JPEG
    re-encode noise (adjacent-cell level gaps of 64 dwarf quantization
    error) — the property video-clip dedup contracts need; the smooth
    ``make_pattern`` card and noise rasters both sit on gradient
    knife-edges where a re-encode flips ~half the hash."""
    import hashlib

    d = hashlib.sha256(seed.encode("utf-8")).digest()
    need = gh * gw
    d = (d * (need // len(d) + 1))[:need]
    lv = np.array([32 + (b % 4) * 64 for b in d],
                  dtype=np.float64).reshape(gh, gw)
    return np.kron(lv, np.ones((cell, cell)))


def encode_gray_baseline(img: np.ndarray, dri: int = 2,
                         qscale: float = 1.0) -> bytes:
    """``qscale`` scales the quantization table (T.81 leaves the table
    to the encoder): >1 = coarser = lower quality. Used to synthesize
    RE-ENCODED copies (generation loss) for clip-dedup contracts; the
    scaled table is written to the DQT segment so any decoder
    reconstructs correctly."""
    h, w = img.shape
    qtab = np.clip(np.round(QTAB * qscale), 1, 255)
    dc_c, ac_c = _codes(DC_BITS, DC_VALS), _codes(AC_BITS, AC_VALS)
    u = np.arange(8)
    x = np.arange(8)
    M = np.cos((2 * x[:, None] + 1) * u[None, :] * np.pi / 16) / 2.0
    M[:, 0] *= 1 / np.sqrt(2)
    by, bx = (h + 7) // 8, (w + 7) // 8
    padded = np.pad(img, ((0, by * 8 - h), (0, bx * 8 - w)), mode="edge")

    out = bytearray(b"\xff\xd8")                       # SOI
    zz_q = bytes(int(qtab.flat[z]) for z in _ZIGZAG)
    out += b"\xff\xdb" + (2 + 1 + 64).to_bytes(2, "big") + b"\x00" + zz_q
    out += (b"\xff\xc0" + (8 + 3).to_bytes(2, "big") + b"\x08"
            + h.to_bytes(2, "big") + w.to_bytes(2, "big")
            + b"\x01" + b"\x01\x11\x00")               # 1 comp, 1x1, q0
    for tc, bits, vals in ((0, DC_BITS, DC_VALS), (1, AC_BITS, AC_VALS)):
        seg = bytes([tc << 4]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + (2 + len(seg)).to_bytes(2, "big") + seg
    if dri:
        out += b"\xff\xdd\x00\x04" + dri.to_bytes(2, "big")
    out += b"\xff\xda\x00\x08\x01\x01\x00\x00\x3f\x00"  # SOS

    wtr = _BitWriter()
    pred, mcu, rst = 0, 0, 0
    for r in range(by):
        for c in range(bx):
            if dri and mcu and mcu % dri == 0:
                wtr.align()
                out += wtr.buf
                wtr = _BitWriter()
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                pred = 0
            blk = padded[r * 8:r * 8 + 8, c * 8:c * 8 + 8] - 128.0
            coef = M.T @ blk @ M                       # forward DCT
            q = np.round(coef / qtab).astype(int)
            zz = [int(q.flat[z]) for z in _ZIGZAG]
            diff = zz[0] - pred
            pred = zz[0]
            s = int(diff).bit_length() if diff else 0
            code, ln = dc_c[s]
            wtr.put(code, ln)
            if s:
                v = diff if diff > 0 else diff + (1 << s) - 1
                wtr.put(v & ((1 << s) - 1), s)
            k, run = 1, 0
            last = max((i for i in range(1, 64) if zz[i]), default=0)
            while k <= last:
                if zz[k] == 0:
                    run += 1
                    k += 1
                    continue
                while run > 15:
                    code, ln = ac_c[0xF0]
                    wtr.put(code, ln)
                    run -= 16
                v = zz[k]
                s = int(abs(v)).bit_length()
                code, ln = ac_c[(run << 4) | s]
                wtr.put(code, ln)
                vv = v if v > 0 else v + (1 << s) - 1
                wtr.put(vv & ((1 << s) - 1), s)
                run = 0
                k += 1
            if last < 63:
                code, ln = ac_c[0x00]                  # EOB
                wtr.put(code, ln)
            mcu += 1
    wtr.align()
    out += wtr.buf
    out += b"\xff\xd9"                                 # EOI
    return bytes(out)


def encode_mjpeg_avi(frames: list[bytes], usec_per_frame: int = 40_000,
                     width: int | None = None,
                     height: int | None = None) -> bytes:
    """Wrap pre-encoded JPEG frames in a spec-complete AVI RIFF form
    (LIST hdrl {avih, LIST strl {strh 'vids'/'MJPG', strf}}, LIST movi
    with one ``00dc`` chunk per frame — the third inside a ``rec ``
    grouping list, exercising readers' recursive walks — and an idx1
    index). Decoder twin: ``multimodal.decode_avi_frames``."""
    if not frames:
        raise ValueError("encode_mjpeg_avi needs at least one frame")
    if width is None or height is None:
        from thewhisperdb_spark.sources.multimodal import _decode_jpeg

        raster = _decode_jpeg(frames[0])
        height, width = len(raster), len(raster[0])

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) & 1 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    def lst(list_type: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", list_type + payload)

    avih = struct.pack("<14I", usec_per_frame, 0, 0, 0x10, len(frames),
                       0, 1, 0, width, height, 0, 0, 0, 0)
    strh = (b"vids" + b"MJPG"
            + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1,
                          max(1, round(1_000_000 / usec_per_frame)), 0,
                          len(frames), 0, 0xFFFFFFFF, 0)
            + struct.pack("<4H", 0, 0, width, height))
    strf = struct.pack("<IiiHH4sIiiII", 40, width, height, 1, 24,
                       b"MJPG", width * height * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_payload = b""
    for k, fr in enumerate(frames):
        c = chunk(b"00dc", fr)
        movi_payload += lst(b"rec ", c) if k == 2 else c
    movi = lst(b"movi", movi_payload)
    # idx1 offsets are relative to the 'movi' fourcc; frame 2 sits
    # inside a 12-byte 'rec ' LIST header ('LIST' + size + 'rec ') that
    # must be counted BOTH in its own offset and in every later frame's
    # (ADVICE r10 — third-party idx1-seeking readers hit garbage
    # otherwise; the in-repo movi walk never noticed).
    idx, off = b"", 4
    for k, fr in enumerate(frames):
        if k == 2:
            off += 12
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(fr))
        off += 8 + len(fr) + (len(fr) & 1)
    body = b"AVI " + hdrl + movi + chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(body)) + body
