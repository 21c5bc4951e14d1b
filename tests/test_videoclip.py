"""Clip-level (temporal) video dedup: packed-window fingerprints and
the hamming-tolerant pair join (operators/imagededup.py, VERDICT r10
#4)."""
from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from thewhisperdb_spark.operators.imagededup import (
    band_hashes,
    video_clip_fingerprints,
    video_clip_near_dup_pairs,
)


def _frames(spark, rows):
    df = spark.createDataFrame(rows, "path string, frame_idx int, "
                                     "dhash long")
    return df.withColumn("status", F.lit("ok"))


def test_fingerprint_packing(spark):
    # bands=4 -> 16-bit slices; k=2 -> fp = slice(t) << 16 | slice(t+1)
    h0, h1, h2 = 0x1111222233334444, 0x5555666677778888, 0x0
    df = _frames(spark, [("v", 0, h0), ("v", 1, h1), ("v", 2, h2)])
    fps = video_clip_fingerprints(df, k=2, bands=4)
    got = {(r["band"], r["shingle_idx"]): r["fp"]
           for r in fps.collect()}
    # band 0 = low 16 bits
    assert got[(0, 0)] == (0x4444 << 16) | 0x8888
    assert got[(0, 1)] == (0x8888 << 16) | 0x0
    assert got[(3, 0)] == (0x1111 << 16) | 0x5555
    n_sh = {r["n_shingles"] for r in fps.collect()}
    assert n_sh == {2}
    assert fps.count() == 4 * 2


def test_fingerprint_max_frames_guard(spark):
    """VERDICT r11 #4: the per-(video, band) collect_list is bounded at
    the operator boundary — frames past max_frames (decode order) are
    dropped BEFORE banding, surviving rows flag the truncation, videos
    under the cap are untouched, and a truncated copy still pairs with
    its full-length original (prefix truncation + shift-tolerant
    containment)."""
    import random
    rng = random.Random(7)
    full = [("long", i, rng.getrandbits(63)) for i in range(40)]
    short = [("short", i, rng.getrandbits(63)) for i in range(6)]
    df = _frames(spark, full + short)
    fps = video_clip_fingerprints(df, k=3, bands=4, max_frames=10)
    by_id = {}
    for r in fps.collect():
        by_id.setdefault(r["id"], r)
    # 10 kept frames -> 8 shingles/band; 6 frames -> 4 shingles/band
    assert by_id["long"]["n_shingles"] == 8
    assert by_id["long"]["frames_truncated"] is True
    assert by_id["short"]["n_shingles"] == 4
    assert by_id["short"]["frames_truncated"] is False
    # cap below the window length is refused
    with pytest.raises(ValueError, match="max_frames"):
        video_clip_fingerprints(df, k=3, max_frames=2)
    # truncation == physical prefix: capping at 10 emits exactly the
    # fingerprints of the first-10-frame clip, so a capped copy still
    # pairs with its original through the shift-tolerant containment
    prefix = video_clip_fingerprints(
        _frames(spark, full[:10]), k=3, bands=4, max_frames=None)
    capped = {(r["band"], r["shingle_idx"], r["fp"])
              for r in fps.filter(F.col("id") == "long").collect()}
    assert capped == {(r["band"], r["shingle_idx"], r["fp"])
                      for r in prefix.collect()}


def test_fingerprint_short_video_and_overflow(spark):
    df = _frames(spark, [("v", 0, 1), ("v", 1, 2)])
    assert video_clip_fingerprints(df, k=3, bands=4).count() == 0
    with pytest.raises(ValueError, match="overflow"):
        video_clip_fingerprints(df, k=4, bands=4)  # 4*16 = 64 > 63
    with pytest.raises(ValueError, match="k must"):
        video_clip_fingerprints(df, k=0)


def test_band_hashes_width(spark):
    df = spark.createDataFrame([(1, (0xABC << 36) | 0x5,)],
                               "id long, h long")
    # width=48, 3 bands -> 16-bit slices of the LOW 48 bits
    got = {r["band"]: r["slice"]
           for r in band_hashes(df, 3, width=48).collect()}
    assert got[0] == 0x5
    assert got[1] == 0      # bits 16..31
    assert got[2] == (0xABC << 36) >> 32 & 0xFFFF
    with pytest.raises(ValueError, match="width"):
        band_hashes(df, 3, width=65)


def test_clip_pairs_exact_copy_and_distinct(spark):
    import random

    rng = random.Random(7)
    rows = []
    for v in range(6):
        hs = [rng.getrandbits(63) for _ in range(6)]
        rows += [(f"v{v}", i, h) for i, h in enumerate(hs)]
        if v < 2:  # bit-perfect copy
            rows += [(f"v{v}copy", i, h) for i, h in enumerate(hs)]
    pairs = video_clip_near_dup_pairs(_frames(spark, rows)).collect()
    got = {(r["a"], r["b"]): r["containment"] for r in pairs}
    assert set(got) == {("v0", "v0copy"), ("v1", "v1copy")}
    assert all(c == 1.0 for c in got.values())


def test_clip_pairs_reencode_drift_and_shift(spark):
    import random

    rng = random.Random(11)

    def drift(h, flips):
        for b in rng.sample(range(63), flips):
            h ^= 1 << b
        return h

    hs = [rng.getrandbits(63) for _ in range(8)]
    rows = [("orig", i, h) for i, h in enumerate(hs)]
    # re-encode: 3 random bit flips per frame (within the window budget)
    rows += [("drifted", i, drift(h, 3)) for i, h in enumerate(hs)]
    # trimmed copy: frames 2..7, identical hashes at shifted indices
    rows += [("trimmed", i, h) for i, h in enumerate(hs[2:])]
    # unrelated
    rows += [("other", i, rng.getrandbits(63)) for i in range(8)]
    pairs = video_clip_near_dup_pairs(_frames(spark, rows)).collect()
    got = {(r["a"], r["b"]): r["containment"] for r in pairs}
    assert ("drifted", "orig") in got
    assert ("orig", "trimmed") in got
    assert got[("orig", "trimmed")] == 1.0   # exact sub-sequence
    assert not any("other" in k for pair in got for k in pair)


def test_clip_pairs_block_cols(spark):
    # identical hash sequences but different duration buckets must NOT
    # pair when blocked on the bucket
    hs = [0x0F0F0F0F0F0F0F0, 0x123456789ABCDE, 0x7EDCBA987654321]
    rows = [("a", i, h, "short") for i, h in enumerate(hs)] + \
           [("b", i, h, "long") for i, h in enumerate(hs)] + \
           [("c", i, h, "short") for i, h in enumerate(hs)]
    df = spark.createDataFrame(
        rows, "path string, frame_idx int, dhash long, dur string") \
        .withColumn("status", F.lit("ok"))
    blocked = video_clip_near_dup_pairs(df, block_cols=["dur"])
    got = {(r["a"], r["b"]) for r in blocked.collect()}
    assert got == {("a", "c")}
    unblocked = video_clip_near_dup_pairs(df)
    assert {(r["a"], r["b"]) for r in unblocked.collect()} == \
        {("a", "b"), ("a", "c"), ("b", "c")}
