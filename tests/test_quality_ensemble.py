"""Quality-ensemble keep verdict (operators/dq.py, VERDICT r10 #8):
rule composition, attribution, degenerate posture, and the crawl-loop
stage."""
from __future__ import annotations

import pyspark.sql.functions as F

from thewhisperdb_spark.operators.dq import (
    quality_attribution_report,
    quality_keep_verdict,
)

GOOD = ("the quick brown fox jumps over the lazy dog and then walks "
        "to be of and that have with more plain words here making "
        "this document long enough to pass the word count rule with "
        "varied natural tokens every sentence something different")
LOOPY = ("click here to buy now " * 20).strip()


def test_keep_and_attribution(spark):
    rows = [("good", GOOD),
            ("loopy", LOOPY),           # repetition + compression fail
            # below the word-count floor but long enough that zlib
            # overhead doesn't ALSO trip the compression rule
            ("short", "just a few natural words written plainly here "
                      "today about nothing in particular at all"),
            ("empty", "")]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    v = quality_keep_verdict(df, min_words=20)
    got = {r["doc_id"]: r for r in v.collect()}
    assert got["good"]["keep"] is True
    assert got["good"]["fail_reasons"] == []
    assert got["loopy"]["keep"] is False
    assert "repetition" in got["loopy"]["fail_reasons"]
    assert got["short"]["keep"] is False
    assert got["short"]["fail_reasons"] == ["gopher"]
    # degenerate posture: empty text fails, never passes unmeasured
    assert got["empty"]["keep"] is False
    assert "compression" in got["empty"]["fail_reasons"]
    rep = {r["rule"]: r for r in
           quality_attribution_report(v).collect()}
    assert rep["gopher"]["n_docs"] == 4 and rep["gopher"]["n_kept"] == 1
    assert rep["gopher"]["n_failed"] == 3   # loopy, short, empty
    assert rep["repetition"]["n_failed"] == 1
    # short fails ONLY gopher -> gopher sole-blocks it
    assert rep["gopher"]["n_sole_blocker"] >= 1


def test_lm_rule_requires_model_and_scores(spark):
    from thewhisperdb_spark.operators.text import char_trigram_lm

    train = spark.createDataFrame(
        [(i, GOOD) for i in range(5)], "doc_id long, text string")
    model = char_trigram_lm(train)
    docs = spark.createDataFrame(
        [(1, GOOD), (2, "zzqx jkwv pfft glrm xxzz qqww eejj kkpp")],
        "doc_id long, text string")
    v = quality_keep_verdict(docs, lm_model=model, min_words=1,
                             min_stopwords=0, max_repetition=1.0,
                             include_compression=False,
                             max_bits_per_trigram=3.0)
    got = {r["doc_id"]: r for r in v.collect()}
    assert got[1]["lm_ok"] is True          # in-domain text
    assert got[2]["lm_ok"] is False         # gibberish: high surprisal
    assert got[2]["bits_per_trigram"] > got[1]["bits_per_trigram"]
    # no model -> no lm columns, conjunction over remaining rules only
    v2 = quality_keep_verdict(docs, min_words=1, min_stopwords=0,
                              max_repetition=1.0,
                              include_compression=False)
    assert "lm_ok" not in v2.columns
    assert all(r["keep"] for r in v2.collect())


def test_threshold_sweep_curves(spark):
    """quality_threshold_sweep (VERDICT r11 #3): per (rule, threshold)
    keep / fail / sole-blocker counts match hand-derived expectations
    on the fixture corpus; unknown or unscored rules are refused."""
    import pytest as _pytest

    from thewhisperdb_spark.operators.dq import quality_threshold_sweep

    rows = [("good", GOOD), ("loopy", LOOPY),
            ("short", "just a few natural words written plainly here "
                      "today about nothing in particular at all"),
            ("empty", "")]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    v = quality_keep_verdict(df, min_words=20)
    sw = quality_threshold_sweep(
        v, {"gopher_min_words": [5.0, 60.0],
            "repetition_max": [0.1]})
    got = {(r["rule"], r["threshold"]): r for r in sw.collect()}
    assert len(got) == 3
    g5 = got[("gopher_min_words", 5.0)]
    # good (41 words, rest-rules pass) keeps; short (15 words >= 5 but
    # zero required stopwords) still fails rest -> sole-blocked by
    # gopher since its other rules pass
    assert g5["n_docs"] == 4 and g5["n_kept"] == 1
    assert g5["n_failed"] == 3 and g5["n_sole_blocker"] == 1
    g60 = got[("gopher_min_words", 60.0)]
    # raising the floor past good's 41 words drops it too
    assert g60["n_kept"] == 0 and g60["n_failed"] == 4
    assert g60["n_sole_blocker"] == 2          # good + short
    r1 = got[("repetition_max", 0.1)]
    # only loopy exceeds 0.1 repetition, and its other rules also fail
    assert r1["n_failed"] == 1 and r1["n_sole_blocker"] == 0
    assert r1["n_kept"] == 1
    assert r1["keep_rate"] == 0.25
    # refusals: unknown rule; lm sweep without an lm-scored frame
    with _pytest.raises(ValueError, match="cannot sweep"):
        quality_threshold_sweep(v, {"nonsense": [1.0]})
    with _pytest.raises(ValueError, match="cannot sweep"):
        quality_threshold_sweep(v.drop("lm_ok", "bits_per_trigram"),
                                {"lm_max_bits": [1.0]})
    with _pytest.raises(ValueError, match="at least one"):
        quality_threshold_sweep(v, {})


def test_lm_rule_duplicate_ids_score_independently(spark):
    """ADVICE r11: the streaming path keys on url and one crawl batch
    can carry the same URL twice with DIFFERENT bodies — each row must
    get ITS OWN bits_per_trigram, not a merged mixture of both
    documents' trigram counts; exact (id, text) duplicates get the
    identical (ratio-invariant) score."""
    from thewhisperdb_spark.operators.text import char_trigram_lm

    train = spark.createDataFrame(
        [(i, GOOD) for i in range(5)], "doc_id long, text string")
    model = char_trigram_lm(train)
    gibberish = "zzqx jkwv pfft glrm xxzz qqww eejj kkpp"
    dup = spark.createDataFrame(
        [("u", GOOD), ("u", gibberish), ("u", GOOD)],
        "doc_id string, text string")
    v = quality_keep_verdict(dup, lm_model=model, min_words=1,
                             min_stopwords=0, max_repetition=1.0,
                             include_compression=False,
                             max_bits_per_trigram=3.0)
    rows = v.select("text", "bits_per_trigram", "lm_ok").collect()
    assert len(rows) == 3
    by_text = {}
    for r in rows:
        by_text.setdefault(r["text"], []).append(r)
    good_rows, gib_rows = by_text[GOOD], by_text[gibberish]
    assert len(good_rows) == 2 and len(gib_rows) == 1
    # same-text duplicates score identically; the distinct text under
    # the same id scores on its own trigrams (strictly worse)
    assert good_rows[0]["bits_per_trigram"] == \
        good_rows[1]["bits_per_trigram"]
    assert gib_rows[0]["bits_per_trigram"] > \
        good_rows[0]["bits_per_trigram"]
    assert all(r["lm_ok"] for r in good_rows)
    assert not gib_rows[0]["lm_ok"]
    # clean frame (unique ids) matches the pre-fix semantics exactly
    solo = spark.createDataFrame(
        [(1, GOOD), (2, gibberish)], "doc_id long, text string")
    vs = {r["doc_id"]: r for r in quality_keep_verdict(
        solo, lm_model=model, min_words=1, min_stopwords=0,
        max_repetition=1.0, include_compression=False,
        max_bits_per_trigram=3.0).collect()}
    assert vs[1]["bits_per_trigram"] == good_rows[0]["bits_per_trigram"]
    assert vs[2]["bits_per_trigram"] == gib_rows[0]["bits_per_trigram"]


def test_crawl_loop_quality_stage(spark, tmp_path):
    """The ensemble as an opt-in crawl_curation_batch stage: a junk
    page is dropped with attribution, a clean page survives with its
    rule booleans in the store."""
    from thewhisperdb_spark.sources.warc import (
        build_http_response,
        build_warc,
        build_warc_record,
    )
    from thewhisperdb_spark.streaming.jobs import crawl_curation_batch

    def page(uri, body):
        return build_warc_record(
            "response", build_http_response(
                b"<html><body><p>" + body + b"</p></body></html>"),
            target_uri=uri)

    arc = build_warc([
        page("https://ok.com/clean", GOOD.encode("utf-8")),
        page("https://ok.com/loopy", LOOPY.encode("utf-8") * 3),
    ], gzip_per_record=True)
    archives = spark.createDataFrame([("b", arc)],
                                     "path string, content binary")
    out = str(tmp_path / "survivors")
    crawl_curation_batch(archives, 0, out,
                         quality={"min_words": 20})
    rows = spark.read.parquet(out).collect()
    assert {r["url"] for r in rows} == {"https://ok.com/clean"}
    r = rows[0]
    assert r["gopher_ok"] and r["repetition_ok"] and r["compression_ok"]
    assert r["fail_reasons"] == []
    # same batch WITHOUT the stage keeps both
    out2 = str(tmp_path / "survivors2")
    crawl_curation_batch(archives, 0, out2)
    assert spark.read.parquet(out2).count() == 2
