"""Profile-based char-trigram language ID (operators/langid.py):
linguistic accuracy on held-out sentences across 17 languages and 8
scripts, integer-exact profile derivation, degenerate-input posture,
and the out-of-profile confidence signal."""
from __future__ import annotations

import pyspark.sql.functions as F

from thewhisperdb_spark.operators.langid import (
    LANGID_HOLDOUT,
    LANGID_LANGS,
    LANGID_SEED,
    langid_profiles,
    language_id_profile,
)


def test_holdout_sentences_classify_correctly(spark):
    """Every held-out sentence (text DISJOINT from the seed) must come
    back as its own language — the linguistic bar the r11 VERDICT set,
    including the non-Latin scripts (ar, el, hi, ja, ko, ru, zh)."""
    df = spark.createDataFrame(LANGID_HOLDOUT, "doc_id string, text string")
    got = {r["doc_id"]: r for r in language_id_profile(df).collect()}
    misses = {l: got[l]["predicted_lang"] for l, _ in LANGID_HOLDOUT
              if got[l]["predicted_lang"] != l}
    assert not misses, f"misclassified: {misses}"
    assert all(got[l]["n_trigrams"] > 0 for l, _ in LANGID_HOLDOUT)


def test_profiles_are_integer_exact_and_bounded(spark):
    """Profile derivation is pure integer Python: counts are exact,
    ranking is (cnt DESC, tri ASC), top_k bounds every language, tot
    sums the KEPT rows, V counts distinct kept trigrams — and a
    second derivation is bit-identical (determinism)."""
    rows, tots, v = langid_profiles(top_k=50)
    rows2, tots2, v2 = langid_profiles(top_k=50)
    assert rows == rows2 and tots == tots2 and v == v2
    langs = {l for l, _, _ in rows}
    assert langs == set(LANGID_LANGS) and len(LANGID_LANGS) == 17
    for lang in langs:
        mine = [(t, c) for ll, t, c in rows if ll == lang]
        assert len(mine) <= 50
        assert sum(c for _, c in mine) == tots[lang]
        # ranking invariant: counts non-increasing
        cnts = [c for _, c in mine]
        assert cnts == sorted(cnts, reverse=True)
    assert v == len({t for _, t, _ in rows})
    # an unbounded top_k keeps every seed trigram: tot == n_chars - 2
    rows_full, tots_full, _ = langid_profiles(top_k=10**9)
    assert all(tots_full[l] == len(dict(LANGID_SEED)[l]) - 2
               for l in langs)


def test_degenerate_inputs_explicit_rows(spark):
    """Contract posture: NULL / empty / sub-trigram texts return
    explicit rows with NULL prediction and n_trigrams 0 — never
    dropped by the explode."""
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "ab"), (4, "hello world this text")],
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in language_id_profile(df).collect()}
    assert len(got) == 4
    for d in (1, 2, 3):
        assert got[d]["predicted_lang"] is None
        assert got[d]["n_trigrams"] == 0
        assert got[d]["bits_per_trigram"] is None
    assert got[4]["predicted_lang"] == "en"


def test_out_of_profile_text_scores_high_bits(spark):
    """bits_per_trigram doubles as confidence: in-profile prose scores
    well under the uniform-unseen ceiling, pure digit noise scores at
    or near it (no profile contains digit trigrams)."""
    df = spark.createDataFrame(
        [("prose", "the children walked to the old school near the "
                   "market and read their books together"),
         ("noise", "9382 4750 1123 9945 0817 6634 2209 8841 5057")],
        "doc_id string, text string")
    got = {r["doc_id"]: r for r in language_id_profile(df).collect()}
    assert got["noise"]["bits_per_trigram"] > \
        got["prose"]["bits_per_trigram"] + 1.0


def test_scoring_plan_is_broadcast_and_doc_keyed(spark):
    """Plan shape: the profile join is a BroadcastHashJoin and the
    plan carries no cartesian product / nested-loop join — the only
    shuffles are doc-keyed aggregates."""
    df = spark.createDataFrame(LANGID_HOLDOUT, "doc_id string, text string")
    out = language_id_profile(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    from thewhisperdb_spark.plans.doctor import plan_lints
    assert plan_lints(out) == []


def test_perplexity_buckets_tercile_semantics(spark):
    """percentile_disc cut rule on a constructed distribution: 6 docs in
    one lang with scores 1..6 (n=6, ceil(n/3)=2, ceil(2n/3)=4) ->
    scores {1,2} head, {3,4} middle, {5,6} tail; NULL score ->
    'unscored'; a second lang buckets independently."""
    from thewhisperdb_spark.operators.langid import perplexity_buckets

    rows = [(i, "aa", float(i)) for i in range(1, 7)]
    rows += [(10, "bb", 5.0), (11, "bb", 5.0), (12, "bb", 9.0)]
    rows += [(13, None, None)]
    df = spark.createDataFrame(
        rows, "doc_id long, predicted_lang string, bits_per_trigram double")
    got = {r["doc_id"]: r["bucket"]
           for r in perplexity_buckets(df).collect()}
    assert [got[i] for i in range(1, 7)] == [
        "head", "head", "middle", "middle", "tail", "tail"]
    # ties share a bucket: both 5.0 docs reach the head cut (cum 2 >=
    # ceil(3/3)=1 at score 5.0) -> head; 9.0 -> cum 3 >= 2 -> middle cut
    # is also 5.0? n=3: third=1, two_thirds=2 -> head_cut=5.0 (cum 2),
    # tail_cut=5.0 -> 9.0 > tail_cut -> tail
    assert got[10] == "head" and got[11] == "head" and got[12] == "tail"
    assert got[13] == "unscored"


def test_perplexity_buckets_plan_shape(spark):
    """The corpus-sized input is touched by one groupBy only; the cut
    join-back is broadcast and the window runs over the compressed
    histogram (plan lints clean — no single-partition window over the
    corpus, no cartesian)."""
    from thewhisperdb_spark.operators.langid import perplexity_buckets

    df = spark.createDataFrame(
        [(i, "en" if i % 2 else "fr", float(i % 7)) for i in range(100)],
        "doc_id long, predicted_lang string, bits_per_trigram double")
    out = perplexity_buckets(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" not in plan
    from thewhisperdb_spark.plans.doctor import plan_lints
    assert plan_lints(out) == []
