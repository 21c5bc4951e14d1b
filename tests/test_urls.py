"""URL / domain operators (operators/urls.py): host normalization,
registrable-domain rules (multi-part suffixes, IPs, single labels),
feature columns, and the subdomain-safe blocklist anti-join."""

from __future__ import annotations

from pyspark.sql import functions as F

from thewhisperdb_spark.operators.urls import drop_blocklisted, url_features


def test_url_features_rules(spark):
    rows = [
        ("https://Sub.News.Example.COM:8443/a/b/c?id=1",),
        ("http://user:pw@shop.example.co.uk/x",),
        ("https://192.168.10.20/admin",),
        ("ftp://localhost/file.txt",),
        ("https://example.org",),
        ("https://deep.a.b.news.com.au/p/q/",),
    ]
    df = url_features(spark.createDataFrame(rows, "url string"))
    got = {r["url"]: r.asDict() for r in df.collect()}

    r = got[rows[0][0]]
    assert (r["scheme"], r["host"]) == ("https", "sub.news.example.com")
    assert r["registrable_domain"] == "example.com" and r["tld"] == "com"
    assert r["path_depth"] == 3 and r["has_query"] and not r["is_ip"]

    r = got[rows[1][0]]                          # userinfo stripped,
    assert r["host"] == "shop.example.co.uk"     # multi-part suffix
    assert r["registrable_domain"] == "example.co.uk"
    assert r["path_depth"] == 1 and not r["has_query"]

    r = got[rows[2][0]]                          # IP host: no tld/domain split
    assert r["is_ip"] and r["registrable_domain"] == "192.168.10.20"
    assert r["tld"] is None

    r = got[rows[3][0]]                          # single-label host
    assert (r["scheme"], r["registrable_domain"]) == ("ftp", "localhost")

    r = got[rows[4][0]]                          # no path
    assert r["path_depth"] == 0 and r["registrable_domain"] == "example.org"

    r = got[rows[5][0]]                          # deep subdomain + com.au
    assert r["registrable_domain"] == "news.com.au"


def test_drop_blocklisted_is_subdomain_safe(spark):
    df = spark.createDataFrame(
        [("d1", "https://evil.example.com/x"),
         ("d2", "https://a.b.evil.example.com/y"),   # deep subdomain
         ("d3", "https://good.example.org/z"),
         ("d4", "https://evil.example.co.uk/w"),     # multi-part suffix
         ("d5", "https://notevil.example.net/v")],
        "doc_id string, url string")
    bl = spark.createDataFrame(
        [("Evil.example.com",), ("evil.example.co.uk",)], "domain string")
    kept = {r["doc_id"] for r in drop_blocklisted(df, bl).collect()}
    assert kept == {"d3", "d5"}
    # plan: the blocklist side must broadcast, never shuffle the facts
    plan = drop_blocklisted(df, bl)._jdf.queryExecution().executedPlan() \
        .toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
