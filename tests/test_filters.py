from pyspark.sql import functions as F

from thewhisperdb_spark.operators import filters as FL


def ids(df):
    return sorted(r["id"] for r in df.select("id").collect())


def test_eq_filters(nodes_df):
    assert ids(nodes_df.filter(FL.eq_filter("subject", "cs"))) == [1, 2, 3, 5, 6]
    assert ids(nodes_df.filter(FL.eq_filter("author", "ada"))) == [1, 2]


def test_course_filter_parses_and_rejects(nodes_df):
    assert ids(nodes_df.filter(FL.course_filter("101"))) == [1, 3, 5]
    # unparseable course value excludes every row (src/core/GraphDB.cpp:119-122)
    assert ids(nodes_df.filter(FL.course_filter("abc"))) == []


def test_title_contains_is_substring_not_equality(nodes_df):
    assert ids(nodes_df.filter(FL.contains_filter("title", "spark"))) == [1, 2, 6]
    assert ids(nodes_df.filter(FL.contains_filter("title", "intro to"))) == [1, 3, 6]


def test_tag_membership(nodes_df):
    assert ids(nodes_df.filter(FL.tag_filter("intro"))) == [1, 3, 6]
    assert ids(nodes_df.filter(FL.tag_filter("nope"))) == []


def test_conjunction(nodes_df):
    got = nodes_df.filter(FL.conjunction(
        FL.eq_filter("subject", "cs"), FL.tag_filter("spark"),
        FL.contains_filter("title", "advanced")))
    assert ids(got) == [2]


def test_find_nodes_whitelist(nodes_df):
    got = FL.find_nodes(nodes_df, {"subject": "cs", "course": "101",
                                   "bogus_key": "ignored"})
    assert ids(got) == [1, 3, 5]
    # empty filters -> all nodes (src/main.cpp:106-110 getAllNodes branch)
    assert FL.find_nodes(nodes_df, {}).count() == 6


def test_point_lookup_and_exists(nodes_df):
    assert ids(FL.point_lookup(nodes_df, 3)) == [3]
    assert FL.point_lookup(nodes_df, 99).count() == 0
    assert FL.exists(nodes_df, 4) is True
    assert FL.exists(nodes_df, 99) is False


def test_has_embedding(nodes_df):
    # null embedding excluded; zero vector still counts as "has embedding"
    assert ids(nodes_df.filter(FL.has_embedding())) == [1, 2, 3, 5, 6]
    empty = nodes_df.withColumn(
        "embedding", F.when(F.col("id") == 5, F.array().cast("array<float>"))
        .otherwise(F.col("embedding")))
    assert ids(empty.filter(FL.has_embedding())) == [1, 2, 3, 6]
