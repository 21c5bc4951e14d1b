"""Perceptual audio dedup: spectrogram-gradient fingerprints over decoded
PCM + the shared Hamming-banded near-dup pairing.

The audio counterpart of :mod:`imagededup`: a 100 TB crawl carries the
same recording re-encoded at different gains/containers, so byte-level
dedup misses it. The fingerprint is a dHash-over-the-spectrogram — split
the mono PCM into 8 time frames, measure energy in 9 frequency bands per
frame (rfft magnitude-squared means), and take each frame's
band-to-band gradient signs: 64 bits. Global gain scales every energy by
g^2, so the comparisons — and the fingerprint — are GAIN-INVARIANT by
construction (pinned in test), and numpy f8 math keeps it deterministic
across executors.

Pairing reuses :func:`imagededup.hamming_near_dup_pairs` — the same
lossless pigeonhole band join, never all-pairs. No reference counterpart;
north-star extension surface.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from thewhisperdb_spark.operators.imagededup import hamming_near_dup_pairs

AudioDecoder = Callable[[bytes], tuple[int, list]]

AUDIO_FP_SCHEMA = StructType([
    StructField("path", StringType()),
    StructField("afp", LongType()),
    StructField("status", StringType()),
])


def audio_fingerprint64(samples, n_frames: int = 8, n_bands: int = 9) -> int:
    """64-bit spectrogram-gradient fingerprint of a mono PCM sequence:
    bit (t, b) = 1 iff band b+1 carries more energy than band b in time
    frame t (row-major MSB-first). Needs at least 2 samples per frame
    so every frame has a non-degenerate spectrum."""
    a = np.asarray(samples, dtype=np.float64).ravel()
    if a.size < 2 * n_frames:
        raise ValueError(
            f"audio fingerprint needs >= {2 * n_frames} samples, "
            f"got {a.size}")
    frame_len = a.size // n_frames
    energies = np.empty((n_frames, n_bands))
    for t in range(n_frames):
        spec = np.abs(np.fft.rfft(a[t * frame_len:(t + 1) * frame_len])) ** 2
        nbins = spec.size
        for b in range(n_bands):
            lo = b * nbins // n_bands
            hi = min(max((b + 1) * nbins // n_bands, lo + 1), nbins)
            lo = min(lo, hi - 1)
            energies[t, b] = spec[lo:hi].mean()
    bits = 0
    for t in range(n_frames):
        for b in range(n_bands - 1):
            bits = (bits << 1) | int(energies[t, b + 1] > energies[t, b])
    return bits


def audio_fingerprint(media: DataFrame,
                      decoder: AudioDecoder | None = None) -> DataFrame:
    """One (path, afp, status) row per audio file: decode via the
    injectable codec hook (None = the stdlib :func:`multimodal.decode_wav`)
    and fingerprint the PCM. Always quarantining, signed-long hash,
    nullable-Int64 column build (same float64-coercion hazard as
    :func:`imagededup.image_dhash`)."""
    from thewhisperdb_spark.sources.multimodal import decode_wav

    dec = decoder or decode_wav

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"path": [], "afp": [], "status": []}
            for path, content in zip(pdf["path"], pdf["content"]):
                try:
                    _, pcm = dec(bytes(content))
                    bits = audio_fingerprint64(pcm)
                    status = "ok"
                except Exception as e:  # noqa: BLE001 — quarantined per row
                    bits = None
                    status = f"{type(e).__name__}: {str(e)[:160]}"
                rows["path"].append(path)
                rows["afp"].append(bits - (1 << 64)
                                   if bits is not None and bits >= 1 << 63
                                   else bits)
                rows["status"].append(status)
            out = pd.DataFrame({"path": rows["path"],
                                "status": rows["status"]})
            out["afp"] = pd.array(rows["afp"], dtype="Int64")
            yield out[["path", "afp", "status"]]

    aud = media.filter(F.col("modality") == "audio").select("path", "content")
    return aud.mapInPandas(run, AUDIO_FP_SCHEMA)


def audio_near_dup_pairs(fingerprints: DataFrame, max_hamming: int = 4,
                         bands: int | None = None) -> DataFrame:
    """(a, b, hamming) over audio fingerprints — the shared lossless
    pigeonhole band join (:func:`imagededup.hamming_near_dup_pairs`)."""
    return hamming_near_dup_pairs(fingerprints, max_hamming=max_hamming,
                                  bands=bands, hash_col="afp")


AUDIO_SEG_SCHEMA = StructType([
    StructField("path", StringType()),
    StructField("segment_idx", IntegerType()),
    StructField("afp", LongType()),
    StructField("status", StringType()),
])


def audio_segment_fingerprints(media: DataFrame,
                               decoder: AudioDecoder | None = None,
                               segment_seconds: float = 1.0,
                               hop_seconds: float = 0.5,
                               max_segments: int = 64) -> DataFrame:
    """One (path, segment_idx, afp, status) row per SLIDING SEGMENT of
    each audio file — the temporal fingerprint sequence clip-level
    dedup consumes (the audio twin of ``imagededup.video_frame_dhash``).
    A whole-file hash misses trimmed or partially-overlapping copies;
    the segment sequence feeds :func:`audio_clip_near_dup_pairs`, which
    pairs RECORDINGS on shared windows of consecutive segments.

    Decode via the injectable codec hook (None = stdlib
    :func:`multimodal.decode_wav`); segments of ``segment_seconds``
    every ``hop_seconds`` (50% overlap by default, so a copy trimmed by
    any offset still aligns within half a segment); ``max_segments``
    caps per-file rows. Always quarantining: decode failure or audio
    too short for ONE segment yields one null-fp status row (visible,
    never silently dropped)."""
    from thewhisperdb_spark.sources.multimodal import decode_wav

    dec = decoder or decode_wav

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"path": [], "segment_idx": [], "afp": [],
                    "status": []}

            def emit(path, idx, fp, status):
                rows["path"].append(path)
                rows["segment_idx"].append(idx)
                rows["afp"].append(fp - (1 << 64)
                                   if fp is not None and fp >= 1 << 63
                                   else fp)
                rows["status"].append(status)

            for path, content in zip(pdf["path"], pdf["content"]):
                try:
                    rate, pcm = dec(bytes(content))
                    seg = max(16, int(rate * segment_seconds))
                    hop = max(1, int(rate * hop_seconds))
                    if len(pcm) < seg:
                        raise ValueError(
                            f"audio too short for one segment "
                            f"({len(pcm)} < {seg} samples)")
                    starts = range(0, len(pcm) - seg + 1, hop)
                    for idx, s0 in enumerate(starts):
                        if idx >= max_segments:
                            break
                        emit(path, idx,
                             audio_fingerprint64(pcm[s0:s0 + seg]), "ok")
                except Exception as e:  # noqa: BLE001 — quarantined
                    emit(path, None, None,
                         f"{type(e).__name__}: {str(e)[:160]}")
            out = pd.DataFrame({"path": rows["path"],
                                "status": rows["status"]})
            out["segment_idx"] = pd.array(rows["segment_idx"],
                                          dtype="Int32")
            out["afp"] = pd.array(rows["afp"], dtype="Int64")
            yield out[["path", "segment_idx", "afp", "status"]]

    aud = media.filter(F.col("modality") == "audio").select("path", "content")
    return aud.mapInPandas(run, AUDIO_SEG_SCHEMA)


def audio_clip_near_dup_pairs(segments: DataFrame, k: int = 3,
                              bands: int = 4, max_hamming: int = 8,
                              min_containment: float = 0.35,
                              max_bucket_df: int = 50,
                              block_cols: list[str] | None = None
                              ) -> DataFrame:
    """RECORDING-level near-dup pairs over segment-fingerprint
    sequences — the packed-window hamming kernel is modality-agnostic
    (``imagededup.video_clip_near_dup_pairs`` with audio column names):
    trimmed/re-encoded copies pair on overlapping windows of ``k``
    consecutive segments, unrelated recordings share ~nothing."""
    from thewhisperdb_spark.operators.imagededup import (
        video_clip_near_dup_pairs)

    return video_clip_near_dup_pairs(
        segments, k=k, bands=bands, max_hamming=max_hamming,
        min_containment=min_containment, max_bucket_df=max_bucket_df,
        id_col="path", hash_col="afp", idx_col="segment_idx",
        block_cols=block_cols)
