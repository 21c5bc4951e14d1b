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


def test_psl_registrable_domain_exact_algorithm(spark):
    """PSL snapshot + canonical algorithm (operators/psl.py): private
    hoster suffixes (github.io-class), wildcard rules (*.ck/*.bd),
    exception rules (!www.ck, !city.kawasaki.jp), multi-part ccTLD
    suffixes the 33-entry baseline misses (blogspot.com.es), unlisted
    TLDs via the implicit * default, IPs/single-label pass-through."""
    from thewhisperdb_spark.operators.psl import (
        load_psl,
        with_registrable_domain,
    )

    psl = load_psl(spark)
    cases = [
        # (host, expected registrable domain)
        ("a.user.github.io", "user.github.io"),       # private suffix
        ("github.io", "github.io"),                   # IS a public suffix
        ("myblog.blogspot.com.es", "myblog.blogspot.com.es"),
        ("deep.sub.example.co.uk", "example.co.uk"),  # classic eTLD+1
        ("www.example.com", "example.com"),
        ("b.site.x.bd", "site.x.bd"),                 # wildcard *.bd
        ("www.ck", "www.ck"),                         # exception !www.ck
        ("shop.www.ck", "www.ck"),                    # exception wins
        ("other.x.ck", "other.x.ck"),                 # *.ck: x.ck is PS
        ("city.kawasaki.jp", "city.kawasaki.jp"),     # !city.kawasaki.jp
        ("sub.city.kawasaki.jp", "city.kawasaki.jp"),
        ("x.mega.kawasaki.jp", "x.mega.kawasaki.jp"), # *.kawasaki.jp
        ("foo.bar.unknowntld", "bar.unknowntld"),     # implicit * default
        ("localhost", "localhost"),                   # single label
        ("192.168.0.1", "192.168.0.1"),               # IP literal
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], "host string")
    got = {r["host"]: r["registrable_domain"]
           for r in with_registrable_domain(df, psl).collect()}
    for host, want in cases:
        assert got[host] == want, f"{host}: {got[host]} != {want}"
    # ICANN-only mode drops the private hoster grouping
    icann = load_psl(spark, include_private=False)
    got = {r["host"]: r["registrable_domain"]
           for r in with_registrable_domain(
               df.filter(F.col("host") == "a.user.github.io"),
               icann).collect()}
    assert got["a.user.github.io"] == "github.io"


def test_url_features_psl_variant(spark):
    """url_features(psl=...) swaps in the PSL grouping; all other
    columns match the baseline variant."""
    from thewhisperdb_spark.operators.psl import load_psl

    df = spark.createDataFrame(
        [("https://u.github.io/p/q?x=1",), ("http://a.example.co.uk/",)],
        "url string")
    base = url_features(df).orderBy("url").collect()
    got = url_features(df, psl=load_psl(spark)).orderBy("url").collect()
    assert [r["registrable_domain"] for r in got] == \
        ["example.co.uk", "u.github.io"]
    for col in ("scheme", "host", "tld", "path_depth", "has_query",
                "is_ip"):
        assert [r[col] for r in got] == [r[col] for r in base]
    # baseline would have collapsed github.io pages into ONE domain
    assert [r["registrable_domain"] for r in base][1] == "github.io"


def test_robots_parse_and_allow(spark):
    """RFC 9309 semantics (operators/robots.py): group selection with
    exact-agent override, longest-match decision, allow-wins ties, *
    wildcards and $ anchors, empty Disallow as no-op, allow-all default
    for unknown hosts, malformed lines ignored."""
    from thewhisperdb_spark.operators.robots import (
        drop_robots_disallowed,
        extract_robots_rules,
        parse_robots,
        robots_allowed,
    )

    body = (
        "# policy\n"
        "User-agent: *\n"
        "Disallow: /private\n"
        "Allow: /private/ok\n"
        "Disallow: /*.zip$\n"
        "Disallow:\n"            # empty: no-op
        "garbage line without colon\n"
        "\n"
        "User-agent: fancybot\n"
        "Disallow: /\n"
    )
    # generic agent: 3 rules (empty disallow dropped, fancybot group not ours)
    rules = parse_robots(body, agent="mybot")
    assert len(rules) == 3
    # exact group overrides * entirely
    assert parse_robots(body, agent="FancyBot") == [
        ("/", False, 1, "^/")]

    robots_df = spark.createDataFrame(
        [("a.com", body), ("empty.com", "User-agent: *\nDisallow:\n")],
        "host string, robots_txt string")
    rules_df = extract_robots_rules(robots_df, agent="mybot")
    assert rules_df.filter("host = 'empty.com'").count() == 0

    urls = spark.createDataFrame([(u,) for u in [
        "https://a.com/public/page",        # no match -> allow
        "https://a.com/private/secret",     # /private -> disallow
        "https://a.com/private/ok/file",    # longer allow wins
        "https://a.com/data/x.zip",         # *.zip$ -> disallow
        "https://a.com/data/x.zip.html",    # $ anchor -> no match
        "https://nothing.com/anything",     # unknown host -> allow
    ]], "url string")
    got = {r["url"]: r["robots_allowed"]
           for r in robots_allowed(urls, rules_df).collect()}
    assert got == {
        "https://a.com/public/page": True,
        "https://a.com/private/secret": False,
        "https://a.com/private/ok/file": True,
        "https://a.com/data/x.zip": False,
        "https://a.com/data/x.zip.html": True,
        "https://nothing.com/anything": True,
    }
    assert drop_robots_disallowed(urls, rules_df).count() == 4
    # allow-wins tie: same-length allow and disallow patterns
    tie = spark.createDataFrame(
        [("t.com", "User-agent: *\nDisallow: /abc\nAllow: /ab*\n")],
        "host string, robots_txt string")
    turl = spark.createDataFrame([("https://t.com/abc",)], "url string")
    trules = extract_robots_rules(tie)
    # /abc (len 4) beats /ab* -> wait: specificity /abc=4 vs /ab*=4 (the
    # * counts per RFC octet length) -> tie -> allow wins
    got = robots_allowed(turl, trules).collect()[0]["robots_allowed"]
    assert got is True


def test_canonicalize_url(spark):
    """Frontier canonicalization golden cases: case, default ports,
    dot-segments, duplicate slashes, tracking params, param ordering,
    fragments, empty path/query."""
    from thewhisperdb_spark.operators.urls import canonicalize_url

    cases = {
        "HTTP://WWW.Example.COM:80/a/./b/../c//d?b=2&utm_source=x&a=1#f":
            "http://www.example.com/a/c/d?a=1&b=2",
        "https://example.org:443/": "https://example.org/",
        "https://example.org:8443/x": "https://example.org:8443/x",
        "https://example.com": "https://example.com/",
        "https://example.com/?utm_campaign=z&fbclid=abc":
            "https://example.com/",
        "https://u:p@Example.com./path?z=1&y=2":
            "https://u:p@example.com/path?y=2&z=1",
        "http://a.com/../../x": "http://a.com/x",
        "https://a.com/a%2Fb?q=Caf%C3%A9":
            "https://a.com/a%2Fb?q=Caf%C3%A9",
        # trailing slash is load-bearing (RFC 3986: '/a/b/' != '/a/b');
        # '.'/'..' final segments resolve to the DIRECTORY form (§5.2.4)
        "https://a.com/a/b/": "https://a.com/a/b/",
        "https://a.com/a/b/.": "https://a.com/a/b/",
        "https://a.com/a/b/..": "https://a.com/a/",
        "https://a.com/a//b//": "https://a.com/a/b/",
    }
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    got = {r["url"]: r["canon"] for r in df.select(
        "url", canonicalize_url(F.col("url")).alias("canon")).collect()}
    for src, want in cases.items():
        assert got[src] == want, f"{src}: {got[src]!r} != {want!r}"
    # the frontier-dedup property: raw variants collapse to one key
    variants = ["https://Example.com/a/b/?x=1&y=2#top",
                "https://example.com:443/a/b/?y=2&x=1",
                "https://example.com/a/./b/../b/?x=1&y=2&utm_medium=m"]
    vdf = spark.createDataFrame([(u,) for u in variants], "url string")
    canon = vdf.select(canonicalize_url(F.col("url")).alias("c"))
    assert canon.distinct().count() == 1


def test_frontier_schedule_politeness(spark):
    """Per-host rank honors priority then url tie-break; offsets step by
    the host's own delay; drain time = last slot; single-url hosts
    drain at 0; default delay applies when no delay column is given."""
    from thewhisperdb_spark.operators.urls import frontier_schedule

    df = spark.createDataFrame(
        [("https://a.com/x", 5, 2.0), ("https://a.com/y", 9, 2.0),
         ("https://a.com/z", 5, 2.0), ("https://b.com/only", 1, 0.5)],
        "url string, priority int, delay double")
    got = {r["url"]: r for r in
           frontier_schedule(df, delay_col="delay",
                             priority_col="priority").collect()}
    # a.com: y (pri 9) first, then x/z tie broken by url asc
    assert got["https://a.com/y"]["rank_in_host"] == 1
    assert got["https://a.com/x"]["rank_in_host"] == 2
    assert got["https://a.com/z"]["rank_in_host"] == 3
    assert got["https://a.com/z"]["fetch_offset_s"] == 4.0
    assert all(got[u]["host_drain_s"] == 4.0 for u in
               ("https://a.com/x", "https://a.com/y", "https://a.com/z"))
    assert got["https://b.com/only"]["fetch_offset_s"] == 0.0
    assert got["https://b.com/only"]["host_drain_s"] == 0.0
    # no delay column -> default, host derived from the url
    d2 = frontier_schedule(
        df.select("url"), default_delay_s=1.5).collect()
    offs = sorted(r["fetch_offset_s"] for r in d2 if r["host"] == "a.com")
    assert offs == [0.0, 1.5, 3.0]
