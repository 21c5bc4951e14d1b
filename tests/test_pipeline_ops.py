"""Round-2 training-pipeline surface: deterministic sampling, skew-safe
aggregation, decontamination, repetition stats."""

from __future__ import annotations

from pyspark.sql import functions as F

from thewhisperdb_spark.operators import sampling as SM
from thewhisperdb_spark.operators import text as TX
from thewhisperdb_spark.operators.dedup import cross_split_contamination


def _docs(spark):
    rows = [
        (0, "a b c a b c a b c"),          # heavy repetition
        (1, "one two three four five six seven eight nine ten"),
        (2, "one two three four five six seven eight different tail"),
        (3, "short"),
        (10, "one two three four five six seven eight nine ten"),  # = doc 1
        (20, "totally unique words here nothing shared at all ok"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hash_sample_deterministic_and_sized(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    s1 = sorted(r.doc_id for r in SM.hash_sample(df, 0x28).collect())
    s2 = sorted(r.doc_id for r in SM.hash_sample(df, 0x28).collect())
    assert s1 == s2                      # reproducible
    frac = len(s1) / 2000
    assert 0.10 < frac < 0.22            # ~40/256 = 15.6%
    # nested property: a tighter cut is a subset of a looser one
    s_small = set(r.doc_id for r in SM.hash_sample(df, 0x10).collect())
    assert s_small <= set(s1)


def test_stratified_sample_bounds(spark):
    df = (spark.range(0, 300).withColumnRenamed("id", "doc_id")
          .withColumn("lang", F.when(F.col("doc_id") % 7 == 0, "rare")
                      .otherwise("common")))
    out = SM.stratified_sample(df, "lang", 5).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append(r.doc_id)
    assert set(by_lang) == {"rare", "common"}
    assert all(len(v) == 5 for v in by_lang.values())
    again = SM.stratified_sample(df, "lang", 5).collect()
    assert sorted((r.lang, r.doc_id) for r in out) == sorted(
        (r.lang, r.doc_id) for r in again)


def test_skew_safe_count_distinct_matches_direct(spark):
    ev = spark.createDataFrame(
        [(i, "hot" if i % 10 else "cold", i % 17) for i in range(400)],
        "event_id long, event_type string, user_id long")
    direct = {r.event_type: r.n for r in
              ev.groupBy("event_type")
              .agg(F.countDistinct("user_id").alias("n")).collect()}
    rewritten = {r.event_type: r.n_users for r in
                 SM.skew_safe_count_distinct(ev, "event_type", "user_id",
                                             "n_users").collect()}
    assert direct == rewritten


def test_salted_sum_matches_direct(spark):
    ev = spark.createDataFrame(
        [(i, i % 13, float(i % 7) + 0.25) for i in range(500)],
        "event_id long, user_id long, value double")
    dec = F.col("value").cast("decimal(18,6)")
    direct = {r.user_id: (float(r.s), r.c) for r in
              ev.groupBy("user_id")
              .agg(F.sum(dec).cast("double").alias("s"),
                   F.count(F.lit(1)).alias("c")).collect()}
    salted = {r.user_id: (float(r.s), r.c) for r in
              SM.salted_sum(ev, "user_id", dec, F.col("event_id"), 8,
                            "s", "c")
              .select("user_id", F.col("s").cast("double").alias("s"), "c")
              .collect()}
    assert direct == salted


def test_cross_split_contamination(spark):
    d = _docs(spark)
    # test split = ids divisible by 10; doc 10 duplicates train doc 1, doc 0
    # and 20 share no 8-gram with any train doc
    flagged = sorted(r.doc_id for r in cross_split_contamination(
        d, F.col("doc_id") % 10 == 0, n=8).collect())
    assert flagged == [10]


def test_repetition_ratio_values(spark):
    d = _docs(spark)
    out = {r.doc_id: r.rep for r in
           d.select("doc_id", TX.repetition_ratio(F.col("text"), 3)
                    .alias("rep")).collect()}
    # doc 0: 9 tokens -> 7 trigrams, 3 distinct ("a b c","b c a","c a b")
    assert abs(out[0] - (1 - 3 / 7)) < 1e-12
    assert out[1] == 0.0                  # all-distinct trigrams
    assert out[3] == 0.0                  # short doc: single whole-doc gram


def test_mixture_sample_rates_and_nesting(spark):
    df = (spark.range(0, 3000).withColumnRenamed("id", "doc_id")
          .withColumn("src", F.element_at(
              F.array(F.lit("a"), F.lit("b"), F.lit("c")),
              (F.col("doc_id") % 3 + 1).cast("int"))))
    out = SM.mixture_sample(df, {"a": 1.0, "b": 0.5}, "src",
                            default_rate=0.25).collect()
    by = {}
    for r in out:
        by.setdefault(r.src, set()).add(r.doc_id)
    assert len(by["a"]) == 1000                      # rate 1.0 keeps all
    assert 0.4 < len(by["b"]) / 1000 < 0.6
    assert 0.17 < len(by["c"]) / 1000 < 0.33
    # nested: raising c's rate only ADDS rows, never swaps them
    wider = SM.mixture_sample(df, {"a": 1.0, "b": 0.5}, "src",
                              default_rate=0.5).collect()
    c_wide = {r.doc_id for r in wider if r.src == "c"}
    assert by["c"] <= c_wide and len(c_wide) > len(by["c"])


def test_unit_dedup_drops_repeats_keeps_first(spark):
    from thewhisperdb_spark.operators.dedup import unit_dedup

    docs = spark.createDataFrame(
        [(1, "a b c d e f"),       # units (size 3): "a b c", "d e f"
         (2, "a b c x y z"),       # first unit repeats doc 1 -> dropped
         (3, "x y z")],            # repeats doc 2's second unit -> dropped
        "doc_id long, text string")
    out = {r.doc_id: r for r in unit_dedup(docs, unit_tokens=3).collect()}
    assert out[1].clean_text == "a b c d e f"
    assert (out[1].n_units, out[1].n_kept) == (2, 2)
    assert out[2].clean_text == "x y z"      # survivor units re-joined in order
    assert (out[2].n_units, out[2].n_kept) == (2, 1)
    assert out[3].clean_text == ""           # everything seen before
    assert (out[3].n_units, out[3].n_kept) == (1, 0)


def test_cms_overestimates_within_bound_and_merges(spark):
    from thewhisperdb_spark.operators.aggregates import (
        cms_build, cms_estimate, cms_merge,
    )

    words = (["apple"] * 50 + ["banana"] * 20 + ["pear"] * 5
             + [f"noise{i}" for i in range(200)])
    df = spark.createDataFrame([(w,) for w in words], "term string")
    sketch = cms_build(df, "term", depth=4, width=256)
    terms = spark.createDataFrame(
        [("apple",), ("banana",), ("pear",), ("absent",)], "term string")
    est = {r.term: r.est for r in cms_estimate(sketch, terms,
                                               depth=4, width=256).collect()}
    true = {"apple": 50, "banana": 20, "pear": 5, "absent": 0}
    n = len(words)
    for t, tc in true.items():
        assert est[t] >= tc                      # CMS never underestimates
        assert est[t] <= tc + (2.718 * n) / 256 + 1  # eps*N slack
    # sketch of disjoint shards merged == sketch of whole (mergeability)
    shard_pred = F.col("term").startswith("noise")
    a = cms_build(df.filter(shard_pred), "term", depth=4, width=256)
    b = cms_build(df.filter(~shard_pred), "term", depth=4, width=256)
    merged = {(r.row_idx, r.bucket): r.cnt
              for r in cms_merge(a, b).collect()}
    whole = {(r.row_idx, r.bucket): r.cnt for r in sketch.collect()}
    assert merged == whole


def test_three_way_split_deterministic_and_stable(spark):
    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    s1 = {r.doc_id: r.split for r in SM.three_way_split(df).collect()}
    s2 = {r.doc_id: r.split
          for r in SM.three_way_split(df.repartition(7)).collect()}
    assert s1 == s2  # pure function of the row: partitioning-independent
    frac_train = sum(v == "train" for v in s1.values()) / 500
    assert 0.7 < frac_train < 0.9
    assert set(s1.values()) == {"train", "val", "test"}
    # growing the corpus never moves an existing row between splits
    bigger = spark.createDataFrame([(i,) for i in range(1000)], "doc_id long")
    s3 = {r.doc_id: r.split for r in SM.three_way_split(bigger).collect()}
    assert all(s3[k] == v for k, v in s1.items())


# ---- round-4 wave: Gopher rules, mixture planning, graded contamination ----

def test_gopher_quality_flags_rules(spark):
    rows = [
        # 60 words incl. 2 required stopwords, mean len 237/60 = 3.95 -> keep
        (1, "the of " + " ".join(["word"] * 58)),
        # word-count failure (10 words), other stats still computed
        (2, "the of word word word word word word word word"),
        # only 1 required stopword -> stopword-rule failure
        (3, "the " + " ".join(["word"] * 59)),
        # digits only -> alpha-word-ratio failure
        (4, " ".join(["12345"] * 60)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in TX.gopher_quality_flags(df).collect()}
    assert out[1].keep and out[1].n_words == 60
    assert abs(out[1].mean_word_len - round(237 / 60, 6)) < 1e-12
    assert out[1].n_required_stop == 2 and out[1].alpha_word_ratio == 1.0
    assert not out[2].keep and out[2].n_words == 10
    assert not out[3].keep and out[3].n_required_stop == 1
    assert not out[4].keep and out[4].alpha_word_ratio == 0.0
    assert out[4].mean_word_len == 5.0


def test_top_ngram_char_stats_known_doc(spark):
    df = spark.createDataFrame([(7, "a b a b a b")], "doc_id long, text string")
    got = {r.n: r for r in TX.top_ngram_char_stats(df).collect()}
    # len("a b a b a b") = 11; 2-grams: "a b" x3; 3-grams tie 2-2 broken
    # lexicographically to "a b a"; 4-grams: "a b a b" x2
    assert (got[2].top_gram, got[2].top_cnt) == ("a b", 3)
    assert got[2].char_frac == round(3 * 3 / 11, 6)
    assert (got[3].top_gram, got[3].top_cnt) == ("a b a", 2)
    assert got[3].char_frac == round(2 * 5 / 11, 6)
    assert (got[4].top_gram, got[4].top_cnt) == ("a b a b", 2)
    assert got[4].char_frac == round(2 * 7 / 11, 6)


def test_dup_ngram_char_fraction_values(spark):
    rows = [(1, "a b a b a b"),                    # both 5-grams unique -> 0
            (2, "x y x y x y x y x y x y"),       # every 5-gram duplicated
            (3, "totally distinct words only")]   # shorter than n -> 1 gram
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.dup_frac
           for r in TX.dup_ngram_char_fraction(df, n=5).collect()}
    assert got[1] == 0.0 and got[3] == 0.0
    # 12 tokens -> 8 5-gram occurrences, 2 distinct grams (len 9) x4 each:
    # (4*9 + 4*9) / len("x y ... y") = 72/23 — the score may exceed 1
    assert got[2] == round(72 / 23, 6)


def test_mixture_weights_uniform_target(spark):
    rows = [(1, "t1 t2 t3", "a"), (2, "t4 t5 t6", "a"), (3, "t7 t8", "b")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r.source: r for r in SM.mixture_weights(df).collect()}
    assert got["a"].n_docs == 2 and got["a"].n_tokens == 6
    assert got["b"].n_docs == 1 and got["b"].n_tokens == 2
    assert got["a"].token_share == 0.75 and got["b"].token_share == 0.25
    # uniform target 0.5 -> downweight a, upweight b
    assert got["a"].mix_weight == round(0.5 / 0.75, 6)
    assert got["b"].mix_weight == 2.0
    # explicit targets override the uniform default
    t = {r.source: r.mix_weight
         for r in SM.mixture_weights(df, targets={"a": 0.9, "b": 0.1})
         .collect()}
    assert t["a"] == round(0.9 / 0.75, 6) and t["b"] == round(0.1 / 0.25, 6)


def test_contamination_overlap_scores_graded(spark):
    from thewhisperdb_spark.operators.dedup import contamination_overlap_scores

    d = _docs(spark)
    got = {r.doc_id: r for r in contamination_overlap_scores(
        d, F.col("doc_id") % 10 == 0, n=8).collect()}
    assert set(got) == {0, 10, 20}        # every test doc scored, even clean
    # doc 10 duplicates train doc 1: all 3 of its 8-gram shingles leak
    assert got[10].n_shingles == 3 and got[10].n_hit == 3
    assert got[10].overlap_frac == 1.0
    assert got[0].n_hit == 0 and got[0].overlap_frac == 0.0
    assert got[20].n_hit == 0 and got[20].overlap_frac == 0.0


def test_dataset_release_report_small_corpus(spark):
    import __spark_entry__ as entrymod

    row = entrymod.queries()["dataset_release_report"](
        spark, "/root/testdata/sf0.001").collect()[0]
    assert row.n_docs == 500 and row.n_langs > 0 and row.n_sources > 0
    assert row.n_tokens > row.n_docs          # multi-token docs
    assert 0 <= row.n_exact_dup_docs <= row.n_docs
    assert 0 <= row.n_gopher_keep <= row.n_docs
    assert 0 <= row.n_test_contaminated <= row.n_docs // 10 + 1


def test_mixture_weights_rejects_unknown_targets(spark):
    import pytest

    rows = [(1, "t1 t2", "a"), (2, "t3", "b")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    # validation is lazy (raise_error inside the plan, not an eager
    # plan-construction-time collect) — it fires at action time
    with pytest.raises(Exception, match="webb"):
        SM.mixture_weights(df, targets={"webb": 0.5, "b": 0.5}).collect()
    # observed strata absent from targets get the explicit 0.0 weight
    got = {r.source: r.mix_weight
           for r in SM.mixture_weights(df, targets={"b": 1.0}).collect()}
    assert got["a"] == 0.0 and got["b"] > 0


def test_sample_quantiles_exact_below_k_and_stable(spark):
    """Below k the sample is the whole group, so quantiles are the exact
    discrete quantiles; and the result is invariant under repartitioning
    (the md5-keyed sample is a pure function of the ids)."""
    from pyspark.sql import functions as F

    from thewhisperdb_spark.operators.sampling import sample_quantiles

    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate([10, 20, 30, 40, 50, 60,
                                              70, 80, 90, 100])],
        "id long, v double")
    got = sample_quantiles(df, "v", ["id"], qs=(0.25, 0.5, 0.75),
                           k=512).collect()[0]
    # discrete convention: value at rank ceil(q*10) -> ranks 3, 5, 8
    assert (got["n_sample"], got["q_25"], got["q_50"], got["q_75"]) \
        == (10, 30.0, 50.0, 80.0)
    again = sample_quantiles(
        df.repartition(7).sortWithinPartitions(F.desc("v")),
        "v", ["id"], qs=(0.25, 0.5, 0.75), k=512).collect()[0]
    assert tuple(again) == tuple(got)
    # k smaller than the group: estimates stay within the sample's value
    # range and the sample size is exactly k
    big = spark.range(0, 5000).select(
        F.col("id"), (F.col("id") % 1000).cast("double").alias("v"))
    est = sample_quantiles(big, "v", ["id"], qs=(0.5,), k=256).collect()[0]
    assert est["n_sample"] == 256
    assert abs(est["q_50"] - 500.0) < 150  # ~±6 pct points at k=256, 3 sigma


def test_compression_ratio_signal(spark):
    """deflate-ratio quality signal (operators/dq.py): repetition
    compresses far below prose, empty text is NULL, ratio/level are
    deterministic, original columns pass through."""
    from thewhisperdb_spark.operators.dq import compression_ratio

    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog " * 10),
         (2, "ab" * 220),
         (3, "")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in compression_ratio(df).collect()}
    assert out[2]["deflate_ratio"] < out[1]["deflate_ratio"] < 1.0
    assert out[2]["deflate_ratio"] < 0.1
    assert out[3]["deflate_ratio"] is None and out[3]["n_raw"] == 0
    assert out[1]["n_raw"] == len("the quick brown fox jumps over the lazy dog " * 10)
    # determinism across invocations
    again = {r["doc_id"]: r["deflate_ratio"]
             for r in compression_ratio(df).collect()}
    assert all(again[k] == out[k]["deflate_ratio"] for k in (1, 2))


def test_epoch_schedule_cap_and_fractional(spark):
    """Budget/cap arithmetic: a heavy-target small domain hits the
    max_epochs cap (capped, realized < target); a light-target domain
    runs fractional epochs uncapped; realized shares sum to 1."""
    from thewhisperdb_spark.operators.sampling import epoch_schedule

    # web: 100 tokens available, wiki: 100 available
    rows = [(i, "web", "w " * 10) for i in range(10)]       # 100 tokens
    rows += [(100 + i, "wiki", "k " * 10) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {r["source"]: r for r in
           epoch_schedule(df, budget_tokens=1000,
                          targets={"web": 0.9, "wiki": 0.1},
                          max_epochs=2.0).collect()}
    web, wiki = got["web"], got["wiki"]
    assert web["tokens_requested"] == 900 and web["n_tokens"] == 100
    assert web["epochs_uncapped"] == 9.0
    assert web["capped"] and web["tokens_planned"] == 200
    assert web["epochs"] == 2.0
    assert wiki["tokens_requested"] == 100 and not wiki["capped"]
    assert wiki["epochs"] == 1.0
    assert round(web["realized_share"] + wiki["realized_share"], 6) == 1.0
    # uncapped variant: planned == requested everywhere
    un = {r["source"]: r for r in
          epoch_schedule(df, budget_tokens=50,
                         targets={"web": 0.5, "wiki": 0.5}).collect()}
    assert un["web"]["tokens_planned"] == 25
    assert un["web"]["epochs"] == 0.25 and not un["web"]["capped"]


def test_epoch_schedule_unknown_target_raises(spark):
    from thewhisperdb_spark.operators.sampling import epoch_schedule
    import pytest

    df = spark.createDataFrame([(1, "web", "a b c")],
                               "doc_id long, source string, text string")
    with pytest.raises(Exception, match="targets name strata"):
        epoch_schedule(df, 100, targets={"web": 0.5, "nope": 0.5}).collect()
