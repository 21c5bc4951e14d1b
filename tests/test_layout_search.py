"""Round-2 additions: BPE trainer, phrase search, Bloom semi-join, SCD2
point-in-time join, token entropy, and Z-order layout clustering."""

from __future__ import annotations

import math
import shutil
import tempfile

from pyspark.sql import functions as F

from thewhisperdb_spark.operators import layout as LY
from thewhisperdb_spark.operators import relational as REL
from thewhisperdb_spark.operators import text as TX


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "doc_id long, text string")


# ---------------------------------------------------------------------------
# BPE
# ---------------------------------------------------------------------------

def test_bpe_pair_counts_weighted_by_word_freq(spark):
    df = _docs(spark, ["aaab aaab", "aaab", "xy"])
    got = {r["pair"]: r["cnt"]
           for r in TX.bpe_pair_counts(df).collect()}
    # "aaab" x3: pairs aa, aa, ab per occurrence -> aa=6, ab=3; "xy" x1
    assert got == {"aa": 6, "ab": 3, "xy": 1}


def test_bpe_train_merges_greedy_order(spark):
    # "low low low lower" — most frequent pair is 'lo' (x4), then merged
    # 'lo'+'w' (x4) wins the next round
    df = _docs(spark, ["low low low lower"])
    merges = TX.bpe_train_merges(df, n_merges=2)
    assert merges[0] == ("l", "o")
    assert merges[1] == ("lo", "w")


def test_bpe_merge_overlap_left_to_right(spark):
    # "aaa": greedy left-to-right merge of ('a','a') produces ['aa','a'],
    # so the second round's top pair is ('aa','a')
    df = _docs(spark, ["aaa"])
    merges = TX.bpe_train_merges(df, n_merges=2)
    assert merges == [("a", "a"), ("aa", "a")]


# ---------------------------------------------------------------------------
# phrase search
# ---------------------------------------------------------------------------

def test_phrase_match_adjacency_not_substring(spark):
    df = _docs(spark, [
        "big data pipelines",          # match
        "bigger database pipelines",   # substring 'big data' but NOT tokens
        "big shiny data",              # words present but not adjacent
        "data big",                    # wrong order
        "big data",                    # exact doc
    ])
    got = sorted(r["doc_id"] for r in
                 df.filter(TX.phrase_match(F.col("text"), "big data")).collect())
    assert got == [0, 4]


def test_phrase_match_short_doc_and_single_word(spark):
    df = _docs(spark, ["big", ""])
    assert df.filter(TX.phrase_match(F.col("text"), "big data")).count() == 0
    assert df.filter(TX.phrase_match(F.col("text"), "big")).count() == 1


# ---------------------------------------------------------------------------
# token entropy
# ---------------------------------------------------------------------------

def test_token_entropy_known_values(spark):
    df = _docs(spark, ["a a a a", "a b c d"])
    got = {r["doc_id"]: (r["n_tokens"], r["entropy"])
           for r in TX.token_entropy(df).collect()}
    assert got[0] == (4, 0.0)          # degenerate: single repeated token
    assert got[1] == (4, 2.0)          # uniform over 4 tokens = log2(4)
    mixed = _docs(spark, ["a a b"])    # H = 1/3*log2(3) + 2/3*log2(3/2)
    h = TX.token_entropy(mixed).collect()[0]["entropy"]
    expect = (1 / 3) * math.log2(3) + (2 / 3) * math.log2(1.5)
    assert abs(h - expect) < 1e-3


# ---------------------------------------------------------------------------
# Bloom semi-join
# ---------------------------------------------------------------------------

def test_bloom_semi_join_exact_vs_plain_semi(spark):
    fact = spark.range(0, 5000).select((F.col("id") % 997).alias("k"),
                                       F.col("id").alias("v"))
    keys = spark.range(0, 80).select((F.col("id") * 13).alias("k"))
    got = REL.bloom_semi_join(fact, keys, "k")
    want = fact.join(keys.distinct(), "k", "left_semi")
    assert sorted(got.collect()) == sorted(want.collect())


def test_bloom_bitmap_no_false_negatives(spark):
    keys = spark.range(0, 1000).select(F.col("id").alias("k"))
    # every build key must pass its own filter (Bloom has no false negatives)
    assert REL.bloom_semi_join(keys, keys, "k").count() == 1000


# ---------------------------------------------------------------------------
# SCD2 point-in-time join
# ---------------------------------------------------------------------------

def test_scd2_picks_containing_version(spark):
    dim = spark.createDataFrame(
        [(1, "2020-01-01", "2021-01-01", "bronze"),
         (1, "2021-01-01", None, "gold"),
         (2, "2020-06-01", None, "silver")],
        "k long, valid_from string, valid_to string, tier string",
    ).select("k", F.col("valid_from").cast("timestamp").alias("valid_from"),
             F.col("valid_to").cast("timestamp").alias("valid_to"), "tier")
    fact = spark.createDataFrame(
        [(1, "2020-07-04"), (1, "2021-07-04"), (2, "2021-01-01"),
         (2, "2020-01-01")],  # last one predates every rev -> dropped
        "k long, ts string").select("k", F.col("ts").cast("timestamp").alias("ts"))
    got = sorted((r["k"], str(r["ts"])[:10], r["tier"])
                 for r in REL.scd2_point_in_time_join(fact, dim, "k", "ts").collect())
    assert got == [(1, "2020-07-04", "bronze"), (1, "2021-07-04", "gold"),
                   (2, "2021-01-01", "silver")]


# ---------------------------------------------------------------------------
# Z-order layout
# ---------------------------------------------------------------------------

def test_zvalue_interleaves_bits(spark):
    df = spark.createDataFrame([(3, 0), (0, 3), (3, 3), (0, 0), (1, 2)],
                               "x long, y long")
    got = {(r["x"], r["y"]): r["z"] for r in df.select(
        "x", "y", LY.zvalue(F.col("x"), F.col("y"), bits=4).alias("z")).collect()}
    # x bits at even positions, y at odd: (3,0)->0b0101=5, (0,3)->0b1010=10,
    # (3,3)->15, (1,2)->1 + 2*4 = 0b1001=9
    assert got == {(3, 0): 5, (0, 3): 10, (3, 3): 15, (0, 0): 0, (1, 2): 9}


def test_zorder_write_prunes_better_than_single_sort(spark):
    # 64x64 uniform grid; 16 files. The pruning observable: expected number
    # of files a point filter on ONE column hits = Σ_files extent-fraction of
    # that column. x-sorted layout: ~1 for x but ~16 for y (no pruning).
    # Z-order: ~4 for BOTH. Assert the worst-dimension cost is far lower.
    n = 64
    grid = spark.range(0, n * n).select(
        (F.col("id") % n).alias("x"), (F.col("id") / n).cast("long").alias("y"))
    zdir = tempfile.mkdtemp(prefix="zorder_")
    sdir = tempfile.mkdtemp(prefix="sorted_")

    def files_hit(path):
        bb = LY.file_bounding_boxes(spark, path, "x", "y")
        r = bb.agg(
            F.sum((F.col("hi1") - F.col("lo1") + 1) / n).alias("fx"),
            F.sum((F.col("hi2") - F.col("lo2") + 1) / n).alias("fy")).collect()[0]
        return max(r["fx"], r["fy"])

    try:
        LY.zorder_write(grid, zdir, "x", "y", n_files=16)
        (grid.repartitionByRange(16, "x").sortWithinPartitions("x")
         .write.mode("overwrite").parquet(sdir))
        z_worst, s_worst = files_hit(zdir), files_hit(sdir)
        assert z_worst < 0.5 * s_worst, (z_worst, s_worst)
    finally:
        shutil.rmtree(zdir, ignore_errors=True)
        shutil.rmtree(sdir, ignore_errors=True)


def test_phrase_match_randomized_vs_python_reference(spark):
    """200 random token sequences, one DataFrame pass, compared against a
    plain-Python adjacency scan."""
    import random

    rng = random.Random(42)
    vocab = ["big", "data", "fast", "table"]
    docs = [" ".join(rng.choice(vocab) for _ in range(rng.randint(0, 8)))
            for _ in range(200)]
    phrase = ["big", "data"]

    def ref(text):
        t = [w for w in text.split() if w]
        return any(t[i:i + 2] == phrase for i in range(len(t) - 1))

    df = _docs(spark, docs)
    got = {r["doc_id"] for r in
           df.filter(TX.phrase_match(F.col("text"), "big data")).collect()}
    want = {i for i, d in enumerate(docs) if ref(d)}
    assert got == want


def test_token_entropy_randomized_vs_python_reference(spark):
    import math
    import random
    from collections import Counter

    rng = random.Random(7)
    vocab = ["a", "b", "c", "d", "e"]
    docs = [" ".join(rng.choice(vocab) for _ in range(rng.randint(1, 30)))
            for _ in range(100)]

    def ref(text):
        c = Counter(text.split())
        n = sum(c.values())
        return sum(-(v / n) * math.log2(v / n) for v in c.values())

    got = {r["doc_id"]: r["entropy"]
           for r in TX.token_entropy(_docs(spark, docs)).collect()}
    want = {i: ref(d) for i, d in enumerate(docs)}
    assert got.keys() == want.keys()
    # the engine quantizes per-token contributions to 9 dp (order-independent
    # decimal sum), so agreement is to rounding, not bit-exact
    assert all(abs(got[i] - want[i]) < 1e-3 for i in got), (got, want)


def test_fuzzy_vocab_pairs_matches_naive(spark):
    """Deletion-neighborhood blocking is lossless vs the naive quadratic
    edit-distance join (includes insert/delete/substitute and transposed-ish
    cases at distance 2)."""
    import itertools

    words = ["spark", "spak", "sprk", "shark", "spork", "query", "queries",
             "table", "cable", "fable", "zzz", "z"]
    df = _docs(spark, [" ".join(words)])
    got = sorted((r["wa"], r["wb"], r["dist"]) for r in
                 TX.fuzzy_vocab_pairs(df, max_dist=2).collect())

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                         prev + (ca != cb))
        return dp[len(b)]

    want = sorted((a, b, lev(a, b))
                  for a, b in itertools.combinations(sorted(set(words)), 2)
                  if lev(a, b) <= 2)
    assert got == want


def test_zorder_extreme_and_negative_ranges(spark):
    # full-long-range and negative inputs must not overflow ANSI longs
    rows = [(-(2 ** 62), -(2 ** 61)), (0, 0), (2 ** 62, 2 ** 61), (17, -42)]
    df = spark.createDataFrame(rows, "x long, y long")
    out = LY.zorder_by(df, "x", "y", n_partitions=2).collect()
    assert len(out) == len(rows)
    assert {(r["x"], r["y"]) for r in out} == set(rows)


def test_bpe_train_then_encode_roundtrip(spark):
    df = _docs(spark, ["low low low lower lowest"])
    merges = TX.bpe_train_merges(df, n_merges=3)
    # ('l','o'), ('lo','w'), then ('low','e') — the (low,e) pair appears in
    # both 'lower' and 'lowest'
    assert merges == [("l", "o"), ("lo", "w"), ("low", "e")]
    enc = df.select(F.explode(TX.tokens(F.col("text"))).alias("w")).select(
        "w", TX.bpe_apply_merges(F.col("w"), merges).alias("syms")).collect()
    got = {r["w"]: list(r["syms"]) for r in enc}
    assert got["low"] == ["low"]
    assert got["lower"] == ["lowe", "r"]
    # encoding preserves content: concat of symbols == the word
    assert all("".join(r["syms"]) == r["w"] for r in enc)


def test_pick_survivors_prefers_quality(spark):
    from thewhisperdb_spark.operators.dedup import near_dup_groups, pick_survivors

    df = spark.createDataFrame(
        [(1, "aa", 10.0), (2, "aa!", 99.0), (3, "aa?", 99.0),
         (4, "zz", 1.0)],
        "doc_id long, text string, quality double")
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "a long, b long")
    groups = near_dup_groups(df, pairs)
    kept = sorted(r["doc_id"] for r in
                  pick_survivors(df, groups, "quality").collect())
    # group {1,2,3}: max quality 99 held by 2 and 3 -> min id 2 wins;
    # singleton 4 survives untouched
    assert kept == [2, 4]
