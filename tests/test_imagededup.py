"""Perceptual image dedup (operators/imagededup.py): dHash determinism,
cross-codec invariance on the committed fixtures, banded near-dup pairing
losslessness vs brute force, and the quarantine pipeline."""

from __future__ import annotations

import os
import random

import numpy as np
import pytest

from thewhisperdb_spark.operators.imagededup import (
    dhash64,
    image_dhash,
    image_near_dup_pairs,
)

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def test_dhash64_known_bits():
    # grid-sized raster: cells are the pixels themselves
    inc = [[c / 10 for c in range(9)] for _ in range(8)]
    assert dhash64(inc) == (1 << 64) - 1        # every gradient rises
    dec = [[(9 - c) / 10 for c in range(9)] for _ in range(8)]
    assert dhash64(dec) == 0                    # every gradient falls
    # one row rising, rest falling -> exactly that row's 8 bits set
    mix = [row[:] for row in dec]
    mix[2] = inc[0][:]
    got = dhash64(mix)
    assert got == 0xFF << (8 * 5)               # row 2, MSB-first rows
    # scale invariance: 2x2 block-upsampled raster hashes identically
    big = [[v for v in row for _ in range(2)] for row in mix for _ in range(2)]
    assert dhash64(big) == got
    # rasters smaller than the grid still hash (pixel repetition)
    assert isinstance(dhash64([[0.1, 0.9]]), int)
    with pytest.raises(ValueError, match="at least 1x2"):
        dhash64([[0.5]])


def test_dhash64_cross_codec_invariance():
    """The SAME 20x24 test card through three committed encodings — exact
    GIF, Annex-K-Q50 baseline JPEG, ImageIO-q0.7 progressive JPEG — must
    collide within a small Hamming distance (the whole point of a
    perceptual hash), while a DIFFERENT image stays far away."""
    from thewhisperdb_spark.sources.multimodal import decode_ppm_bmp

    h = {name: dhash64(decode_ppm_bmp(
        open(os.path.join(FIXTURES, name), "rb").read()))
        for name in ("tiny.gif", "tiny.jpg", "tiny_prog.jpg",
                     "tiny_inter.gif")}
    ham = lambda a, b: bin(a ^ b).count("1")  # noqa: E731
    assert ham(h["tiny.gif"], h["tiny.jpg"]) <= 4
    assert ham(h["tiny.gif"], h["tiny_prog.jpg"]) <= 4
    assert ham(h["tiny.jpg"], h["tiny_prog.jpg"]) <= 4
    # different image (the interlaced color card): far from all three
    assert ham(h["tiny.gif"], h["tiny_inter.gif"]) > 10


def test_image_near_dup_pairs_lossless_vs_bruteforce(spark):
    """Pigeonhole banding must return EXACTLY the brute-force pair set:
    40 random 64-bit hashes plus perturbed copies (1..6 bit flips), all
    pairs within max_hamming=4 found, none beyond, signed longs intact."""
    rng = random.Random(7)
    hashes = []
    for i in range(40):
        h = rng.getrandbits(64)
        hashes.append((f"img{i:03d}", h))
        if i % 3 == 0:                          # perturbed near-dup copy
            flips = rng.sample(range(64), rng.randint(1, 6))
            h2 = h
            for b in flips:
                h2 ^= 1 << b
            hashes.append((f"img{i:03d}_copy", h2))
    signed = [(p, h - (1 << 64) if h >= 1 << 63 else h) for p, h in hashes]
    df = spark.createDataFrame(signed + [("img_bad", None)],
                               "path string, dhash long")
    got = {(r["a"], r["b"]): r["hamming"]
           for r in image_near_dup_pairs(df, max_hamming=4).collect()}
    exp = {}
    for i, (pa, ha) in enumerate(hashes):
        for pb, hb in hashes[i + 1:]:
            d = bin(ha ^ hb).count("1")
            if d <= 4:
                k = (pa, pb) if pa < pb else (pb, pa)
                exp[k] = d
    assert got == exp and len(exp) >= 5
    with pytest.raises(ValueError, match="pigeonhole"):
        image_near_dup_pairs(df, max_hamming=8, bands=8)


def test_image_dhash_pipeline_quarantine(spark, tmp_path):
    """binaryFile -> image_dhash over real fixture bytes: decodable
    images hash, a corrupt image quarantines with the taxonomy status,
    and near-dup pairing over the result finds the cross-codec pair."""
    import shutil

    from thewhisperdb_spark.sources.multimodal import (
        read_binary_files,
        with_media_metadata,
    )

    for name in ("tiny.gif", "tiny.jpg", "tiny_inter.gif"):
        shutil.copy(os.path.join(FIXTURES, name), tmp_path / name)
    (tmp_path / "broken.png").write_bytes(b"\x89PNG\r\n\x1a\n" + b"junk")
    media = with_media_metadata(read_binary_files(spark, str(tmp_path)))
    rows = {r["path"].rsplit("/", 1)[-1]: r
            for r in image_dhash(media).collect()}
    assert rows["broken.png"]["dhash"] is None
    assert rows["broken.png"]["status"].startswith("ValueError")
    ok = {k: v for k, v in rows.items() if v["status"] == "ok"}
    assert set(ok) == {"tiny.gif", "tiny.jpg", "tiny_inter.gif"}
    pairs = image_near_dup_pairs(
        image_dhash(media), max_hamming=4).collect()
    names = {tuple(sorted((r["a"].rsplit("/", 1)[-1],
                           r["b"].rsplit("/", 1)[-1]))) for r in pairs}
    assert ("tiny.gif", "tiny.jpg") in names
    assert not any("tiny_inter.gif" in p for pair in names for p in pair)


def test_image_near_dup_plan_is_equi_join(spark):
    """The banded candidate join must compile to a hash equi-join —
    never a nested-loop product (the all-pairs shape the banding
    exists to avoid)."""
    df = spark.createDataFrame([(f"p{i}", i * 7919) for i in range(32)],
                               "path string, dhash long")
    plan = image_near_dup_pairs(df)._jdf.queryExecution().executedPlan() \
        .toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_drop_near_duplicate_images_end_to_end(spark, tmp_path):
    """dHash -> pairs -> CC -> one survivor per duplicate group: the
    cross-codec trio (gif/jpg = same card at hamming <= 4, transitively
    chained through prog-jpg) collapses to ONE survivor, the distinct
    card survives, and an undecodable file always survives (it was never
    shown to be a duplicate)."""
    import shutil

    from thewhisperdb_spark.operators.imagededup import (
        drop_near_duplicate_images,
    )
    from thewhisperdb_spark.sources.multimodal import (
        read_binary_files,
        with_media_metadata,
    )

    for name in ("tiny.gif", "tiny.jpg", "tiny_prog.jpg", "tiny_inter.gif"):
        shutil.copy(os.path.join(FIXTURES, name), tmp_path / name)
    (tmp_path / "broken.png").write_bytes(b"\x89PNG\r\n\x1a\n" + b"junk")
    media = with_media_metadata(read_binary_files(spark, str(tmp_path)))
    out = {r["path"].rsplit("/", 1)[-1]: r
           for r in drop_near_duplicate_images(media).collect()}
    card_survivors = {n for n in out
                      if n in ("tiny.gif", "tiny.jpg", "tiny_prog.jpg")}
    assert len(card_survivors) == 1              # the trio collapsed
    assert "tiny_inter.gif" in out               # distinct image survives
    assert "broken.png" in out                   # quarantined row survives
    assert out["broken.png"]["dhash"] is None


def test_hamming_pairs_block_cols_and_band_widths(spark):
    """block_cols restricts pairing to equal-key blocks (the production
    blocking lever), and the balanced band widths stay lossless for a
    bands count that does not divide 64."""
    from thewhisperdb_spark.operators.imagededup import (
        hamming_near_dup_pairs,
    )

    rows = [("a1", 0b1010, "cc"), ("a2", 0b1011, "cc"),  # ham 1, same block
            ("b1", 0b1010, "dd"), ("b2", 0b1000, None)]  # cross-block only
    df = spark.createDataFrame(rows, "path string, dhash long, src string")
    got = {(r["a"], r["b"]) for r in hamming_near_dup_pairs(
        df, max_hamming=2, block_cols=["src"]).collect()}
    assert got == {("a1", "a2")}                 # b1 ~ a1 blocked by src
    # null block keys pair with each other (eqNullSafe), not with non-null
    rows2 = rows + [("b3", 0b1001, None)]        # ham(b2, b3) = 1
    df2 = spark.createDataFrame(rows2, "path string, dhash long, src string")
    got2 = {(r["a"], r["b"]) for r in hamming_near_dup_pairs(
        df2, max_hamming=2, block_cols=["src"]).collect()}
    assert got2 == {("a1", "a2"), ("b2", "b3")}
    # balanced widths (bands=5 -> 12/13/13/13/13): brute-force lossless
    import random
    rng = random.Random(11)
    hs = [(f"h{i:02d}", rng.getrandbits(64)) for i in range(30)]
    hs += [(p + "_c", h ^ (1 << rng.randrange(64)) ^ (1 << rng.randrange(64)))
           for p, h in hs[::4]]
    hdf = spark.createDataFrame(
        [(p, h - (1 << 64) if h >= 1 << 63 else h) for p, h in hs],
        "path string, dhash long")
    got3 = {(r["a"], r["b"]) for r in hamming_near_dup_pairs(
        hdf, max_hamming=4, bands=5).collect()}
    exp3 = {tuple(sorted((pa, pb)))
            for i, (pa, ha) in enumerate(hs) for pb, hb in hs[i + 1:]
            if bin(ha ^ hb).count("1") <= 4}
    assert got3 == exp3 and len(exp3) >= 4


def test_hamming_pairs_single_band_exact_equality(spark):
    """max_hamming=0 -> one full-width band: the join key is the whole
    hash (no 64-bit mask literal — that overflows a Java long; caught by
    the bench run) and only exact-equal hashes pair."""
    from thewhisperdb_spark.operators.imagededup import (
        hamming_near_dup_pairs,
    )

    rows = [("x1", -1), ("x2", -1),              # all-ones hash, equal
            ("y1", -2), ("z1", 7)]               # ham(x, y) = 1: no pair
    df = spark.createDataFrame(rows, "path string, dhash long")
    got = {(r["a"], r["b"]): r["hamming"]
           for r in hamming_near_dup_pairs(df, max_hamming=0).collect()}
    assert got == {("x1", "x2"): 0}


def test_video_frame_dedup_cross_video(spark, tmp_path):
    """video_frame_dhash -> banded hamming join: a re-encode sharing one
    frame with the committed fixture surfaces exactly that frame pair;
    a non-MJPEG file quarantines to a single null-hash row."""
    import os
    import shutil

    import numpy as np

    from thewhisperdb_spark.operators.imagededup import (
        hamming_near_dup_pairs,
        video_frame_dhash,
    )
    from thewhisperdb_spark.sources.multimodal import (
        read_binary_files,
        with_media_metadata,
    )
    from tools.make_avi_fixture import H, W, make_avi, make_pattern
    from tools.make_jpeg_fixture import encode_gray_baseline

    root = os.path.join(os.path.dirname(__file__), "fixtures")
    shutil.copy(os.path.join(root, "tiny.avi"), tmp_path / "a.avi")
    # b.avi: frame 0 = a.avi's frame 0 (same encoder, same raster ->
    # identical dHash); frame 1 = unrelated noise
    base = make_pattern(H, W)
    rng = np.random.RandomState(11)
    noise = rng.randint(0, 256, size=(H, W)).astype(np.float64)
    (tmp_path / "b.avi").write_bytes(make_avi(
        [encode_gray_baseline(base), encode_gray_baseline(noise)]))
    (tmp_path / "c.avi").write_bytes(b"RIFFzzzznope")

    from pyspark.sql import functions as F

    media = with_media_metadata(read_binary_files(spark, str(tmp_path)))
    hashes = video_frame_dhash(media).cache()
    ok = hashes.filter("status = 'ok'")
    assert ok.count() == 5            # 3 + 2 frames
    assert hashes.filter("status != 'ok'").count() == 1  # c.avi quarantined

    keyed = ok.select(
        F.concat_ws("#", F.col("path"), F.col("frame_idx")).alias("id"),
        F.col("dhash").alias("h"))
    pairs = hamming_near_dup_pairs(keyed, max_hamming=2, id_col="id",
                                   hash_col="h").collect()
    shared = [p for p in pairs
              if {os.path.basename(p["a"].split("#")[0]),
                  os.path.basename(p["b"].split("#")[0])} == {"a.avi",
                                                              "b.avi"}]
    assert any(p["a"].endswith("#0") and p["b"].endswith("#0")
               for p in shared), "shared frame 0 must pair at hamming 0"
    # the noise frame pairs with nothing
    assert not any("b.avi#1" in (p["a"], p["b"]) for p in pairs
                   if "noise" not in p)
