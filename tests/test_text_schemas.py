from pyspark.sql import functions as F

from thewhisperdb_spark import schemas as S
from thewhisperdb_spark.operators import text as TX


def test_tokens_and_tags(spark):
    df = spark.createDataFrame([("a b  a c",), ("  ",)], "text string")
    got = df.select(TX.tokens(F.col("text")).alias("t"),
                    TX.tags_of(F.col("text")).alias("g")).collect()
    assert got[0]["t"] == ["a", "b", "a", "c"]
    assert got[0]["g"] == ["a", "b", "c"]
    assert got[1]["t"] == []


def test_char_ngrams(spark):
    df = spark.createDataFrame([("abcd",), ("ab",)], "text string")
    got = df.select(TX.char_ngrams(F.col("text"), 3).alias("g")).collect()
    assert got[0]["g"] == ["abc", "bcd"]
    assert got[1]["g"] == ["ab"]  # shorter than n -> one (short) shingle


def test_truncate_semantics(spark):
    df = spark.createDataFrame([("x" * 10,), ("y" * 3,)], "text string")
    got = df.select(
        TX.truncate_text(F.col("text"), 5).alias("plain"),
        TX.truncate_text(F.col("text"), 5, ellipsis=True).alias("ell")).collect()
    assert got[0]["plain"] == "xxxxx" and got[0]["ell"] == "xxxxx..."
    assert got[1]["plain"] == "yyy" and got[1]["ell"] == "yyy"


def test_tag_normalize(spark):
    df = spark.createDataFrame(
        [("  Machine   Learning  ",), ("a-b-",), ("UPPER",)], "t string")
    got = [r["n"] for r in df.select(S.normalize_tag(F.col("t")).alias("n")).collect()]
    # lowercase, whitespace-runs->'-', trailing '-' stripped
    # (src/tagging/TagClient.cpp:101-124)
    assert got == ["machine-learning", "a-b", "upper"]


def test_course_coercion(spark):
    df = spark.createDataFrame([("42",), ("abc",), (None,)], "course string")
    got = [r["c"] for r in df.select(S.coerce_course(F.col("course")).alias("c")).collect()]
    assert got == [42, 0, 0]  # failure -> 0 (src/core/GNode.cpp:10-24)


def test_csv_tag_coercion(spark):
    df = spark.createDataFrame([("a, b , ,c",)], "tags string")
    got = df.select(S.coerce_tags_csv(F.col("tags")).alias("t")).collect()
    assert got[0]["t"] == ["a", "b", "c"]


def test_normalize_nodes_schema(spark):
    raw = spark.createDataFrame(
        [(1, "t", "a", "s", "7", "d", "2024-01-01 00:00:00", ["x"], "unknown")],
        "id long, title string, author string, subject string, course string, "
        "description string, date string, tags array<string>, extra_field string")
    out = S.normalize_nodes(raw)
    assert [f.name for f in out.schema.fields] == [f.name for f in S.NODE_SCHEMA.fields]
    row = out.collect()[0]
    assert row["course"] == 7 and row["embedding"] is None
    assert "extra_field" not in out.columns  # unknown fields dropped


def test_fingerprint_order_insensitive(spark):
    df = spark.createDataFrame([("a b c",), ("c b a",), ("a b d",)], "text string")
    got = [r["f"] for r in df.select(TX.fingerprint(F.col("text")).alias("f")).collect()]
    assert got[0] == got[1]
    assert got[0] != got[2]


def test_bm25_scores_known_values(spark):
    import math

    docs = spark.createDataFrame(
        [(1, "cat dog cat"), (2, "cat bird"), (3, "fish fish fish")],
        "doc_id long, text string")
    got = {r.doc_id: r.bm25
           for r in TX.bm25_scores(docs, ["cat"]).collect()}
    # doc 3 has no query term -> absent
    assert set(got) == {1, 2}

    def ref(tf, df, dl, n=3, avgdl=8 / 3, k1=1.2, b=0.75):
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        return round(idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl)), 6)

    assert got[1] == ref(tf=2, df=2, dl=3)
    assert got[2] == ref(tf=1, df=2, dl=2)
    # multi-term scores are sums of rounded per-term contributions
    two = {r.doc_id: r.bm25
           for r in TX.bm25_scores(docs, ["cat", "bird"]).collect()}
    assert two[2] == round(ref(tf=1, df=2, dl=2) + ref(tf=1, df=1, dl=2), 6)


def test_vocab_jaccard_by_group(spark):
    docs = spark.createDataFrame(
        [(1, "a b c", "x"), (2, "b c d", "y"), (3, "zz", "z")],
        "doc_id long, text string, lang string")
    rows = {(r.ga, r.gb): r for r in
            TX.vocab_jaccard_by_group(docs, "lang").collect()}
    # disjoint vocabularies never pair up (equi-join on term)
    assert set(rows) == {("x", "y")}
    r = rows[("x", "y")]
    assert (r.n_a, r.n_b, r.n_common) == (3, 3, 2)  # {b,c} of {a,b,c}u{b,c,d}
    assert r.jaccard == 0.5


def test_per_stratum_cap(spark):
    from thewhisperdb_spark.operators.sampling import per_stratum_cap

    df = spark.createDataFrame(
        [(i, "s" + str(i % 2), 100 - i) for i in range(10)],
        "doc_id long, source string, n_chars long")
    out = per_stratum_cap(df, "source", 3, "n_chars").collect()
    assert len(out) == 6
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r)
    for src, rows in by_src.items():
        assert len(rows) == 3
        # best-first: kept rows are the 3 largest n_chars of the stratum
        kept = sorted(r.n_chars for r in rows)
        lo = min(kept)
        assert all(r.rk <= 3 for r in rows)
        assert lo >= 100 - 9 + 4  # the bottom 2 of each 5-row stratum dropped


def test_value_histogram_clamps(spark):
    from thewhisperdb_spark.operators.aggregates import value_histogram

    df = spark.createDataFrame([(5,), (15,), (25,), (999,)], "v long")
    rows = {r.bucket: r for r in value_histogram(df, "v", 10, 3).collect()}
    assert set(rows) == {0, 1, 2}
    assert rows[0].n == 1 and rows[0].min_v == 5
    # bucket 2 holds 25 AND the clamped overflow 999
    assert rows[2].n == 2 and rows[2].max_v == 999 and rows[2].total == 1024


def test_pii_detect_and_redact(spark):
    from pyspark.sql import functions as F

    from thewhisperdb_spark.operators.privacy import (
        pii_counts,
        pii_report,
        redact_pii,
    )

    df = spark.createDataFrame([
        (1, "s1", "mail me at jane.doe+x@corp.example.org thanks"),
        (2, "s1", "server 192.168.1.17 called +1555-123-4567 twice"),
        (3, "s2", "clean document with no identifiers at all"),
        (4, "s2", "two mails a@b.io and c.d@e-f.museum same line"),
    ], "doc_id long, source string, text string")

    counts = df.select(*[c.alias(k) for k, c in
                         pii_counts(F.col("text")).items()]).collect()
    got = [(r["email"], r["ipv4"], r["phone"]) for r in counts]
    assert got == [(1, 0, 0), (0, 1, 1), (0, 0, 0), (2, 0, 0)]

    rep = {r["g"]: (r["n_email"], r["n_ipv4"], r["n_phone"],
                    r["n_docs_with_pii"], r["n_docs"])
           for r in pii_report(df).collect()}
    assert rep == {"s1": (1, 1, 1, 2, 2), "s2": (2, 0, 0, 1, 2)}

    # redaction is a fixpoint: re-detecting on redacted text finds nothing
    red = df.select(redact_pii(F.col("text")).alias("text"))
    residue = red.select(*[c.alias(k) for k, c in
                           pii_counts(F.col("text")).items()]).collect()
    assert all(r["email"] == r["ipv4"] == r["phone"] == 0 for r in residue)
    joined = " ".join(r["text"] for r in red.collect())
    assert "[PII]" in joined and "@" not in joined


def test_char_lm_quality_scoring(spark):
    """CCNet-style char-trigram LM (operators/text.py): in-domain text
    scores fewer bits/trigram than garbage; unseen contexts take the
    uniform 1/V fallback; short texts produce no trigrams; integer
    sidecar columns are exact."""
    from thewhisperdb_spark.operators.text import (
        char_trigram_lm,
        char_trigrams,
        lm_doc_bits,
    )

    train = spark.createDataFrame(
        [("the cat sat on the mat",), ("the rat sat on the cat",)],
        "text string")
    counts, totals, v = char_trigram_lm(train)
    assert v == counts.select("ch").distinct().count()
    docs = spark.createDataFrame(
        [(1, "the cat sat"), (2, "zqx!?~zqx!?~"), (3, "ab")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           lm_doc_bits(docs, counts, totals, v).collect()}
    assert 3 not in out                       # <3 chars: no trigrams
    in_dom, garbage = out[1], out[2]
    assert in_dom["n_trigrams"] == 9 and garbage["n_trigrams"] == 10
    assert (in_dom["total_bits"] / in_dom["n_trigrams"]
            < garbage["total_bits"] / garbage["n_trigrams"])
    # garbage hit zero training mass: every cnt and tot is 0
    assert garbage["sum_cnt"] == 0 and garbage["sum_tot"] == 0
    assert in_dom["sum_cnt"] > 0
    # trigram extraction itself
    tri = spark.range(1).select(
        char_trigrams(F.lit("abcd")).alias("t")).collect()[0]["t"]
    assert tri == ["abc", "bcd"]
