"""Perceptual audio dedup (operators/audiodedup.py): fingerprint
determinism + gain invariance, signal discrimination, and the quarantine
pipeline with the shared Hamming band join."""

from __future__ import annotations

import math
import os
import struct

import pytest

from thewhisperdb_spark.operators.audiodedup import (
    audio_fingerprint,
    audio_fingerprint64,
    audio_near_dup_pairs,
)

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def make_wav(samples, rate: int = 8000) -> bytes:
    pcm = b"".join(struct.pack("<h", max(-32768, min(32767,
                                                     int(s * 32767))))
                   for s in samples)
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    chunks = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", len(pcm)) + pcm)
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def _tone(freq, n=2048, rate=8000, gain=1.0):
    return [gain * math.sin(2 * math.pi * freq * k / rate)
            for k in range(n)]


def test_audio_fingerprint_gain_invariant_and_discriminative():
    low = _tone(440)
    # gain scales every band energy by g^2 -> identical fingerprint
    assert audio_fingerprint64(low) == audio_fingerprint64(
        [0.25 * s for s in low])
    # 16-bit quantization round-trip stays within a few bits
    from thewhisperdb_spark.sources.multimodal import decode_wav
    _, pcm = decode_wav(make_wav(low))
    ham = bin(audio_fingerprint64(low)
              ^ audio_fingerprint64(pcm)).count("1")
    assert ham <= 4
    # a chirp occupies different bands per frame -> far from the tone
    chirp = [math.sin(2 * math.pi * (200 + k) * k / 8000 / 2)
             for k in range(2048)]
    assert bin(audio_fingerprint64(low)
               ^ audio_fingerprint64(chirp)).count("1") > 4
    with pytest.raises(ValueError, match="needs >= 16 samples"):
        audio_fingerprint64([0.1] * 8)


def test_audio_fingerprint_pipeline_quarantine(spark, tmp_path):
    """binaryFile -> audio_fingerprint -> audio_near_dup_pairs: a gain-
    scaled re-encode of the same tone pairs at Hamming <= 4, a different
    signal doesn't, and a truncated WAV quarantines."""
    from thewhisperdb_spark.sources.multimodal import (
        read_binary_files,
        with_media_metadata,
    )

    tone = _tone(440)
    (tmp_path / "a.wav").write_bytes(make_wav(tone))
    (tmp_path / "a_quiet.wav").write_bytes(
        make_wav([0.3 * s for s in tone]))
    (tmp_path / "chirp.wav").write_bytes(make_wav(
        [math.sin(2 * math.pi * (200 + k) * k / 8000 / 2)
         for k in range(2048)]))
    (tmp_path / "broken.wav").write_bytes(b"RIFF\x10\x00\x00\x00WAVEjunk")
    media = with_media_metadata(read_binary_files(spark, str(tmp_path)))
    fps = {r["path"].rsplit("/", 1)[-1]: r
           for r in audio_fingerprint(media).collect()}
    assert fps["broken.wav"]["afp"] is None
    assert fps["broken.wav"]["status"].startswith("ValueError")
    assert all(fps[k]["status"] == "ok"
               for k in ("a.wav", "a_quiet.wav", "chirp.wav"))
    pairs = {tuple(sorted((r["a"].rsplit("/", 1)[-1],
                           r["b"].rsplit("/", 1)[-1]))): r["hamming"]
             for r in audio_near_dup_pairs(
                 audio_fingerprint(media), max_hamming=4).collect()}
    assert ("a.wav", "a_quiet.wav") in pairs
    assert not any("chirp.wav" in p for p in pairs)


def test_audio_clip_dedup_trimmed_and_reencoded(spark):
    """Segment sequences + the packed-window kernel pair a TRIMMED,
    gain-scaled re-encode with its source recording; an unrelated
    signal doesn't; too-short audio quarantines visibly."""
    import pyspark.sql.functions as F

    from thewhisperdb_spark.operators.audiodedup import (
        audio_clip_near_dup_pairs,
        audio_segment_fingerprints,
    )

    rate = 8000
    # 6 s recording: 1 s tone blocks at distinct frequencies
    freqs = [300, 523, 880, 1247, 660, 415]
    src = sum((_tone(f, n=rate, rate=rate) for f in freqs), [])
    # copy: drop the first 1.5 s, scale gain (re-encode analog)
    copy = [0.4 * s for s in src[int(1.5 * rate):]]
    other = _tone(1000, n=6 * rate, rate=rate)
    media = spark.createDataFrame(
        [("orig", make_wav(src, rate), "audio"),
         ("trimcopy", make_wav(copy, rate), "audio"),
         ("other", make_wav(other, rate), "audio"),
         ("short", make_wav(_tone(440, n=100, rate=rate), rate),
          "audio"),
         ("corrupt", b"RIFFnope", "audio")],
        "path string, content binary, modality string")
    segs = audio_segment_fingerprints(media)
    st = {r["path"]: r["status"]
          for r in segs.filter(F.col("afp").isNull()).collect()}
    assert set(st) == {"short", "corrupt"}
    assert "too short" in st["short"]
    pairs = {(r["a"], r["b"]): r["containment"]
             for r in audio_clip_near_dup_pairs(segs).collect()}
    assert ("orig", "trimcopy") in pairs
    assert all("other" not in p for pair in pairs for p in pair)
