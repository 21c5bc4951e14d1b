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
