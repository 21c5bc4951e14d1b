"""IDN host normalization (operators/idn.py), the full-PSL default
(operators/psl.py), and the IDN step of canonicalize_urls."""
from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from hypothesis import given
from hypothesis import settings as hyp_settings
from hypothesis import strategies as st

from thewhisperdb_spark.operators.idn import host_to_ascii


def test_host_to_ascii_golden():
    cases = {
        None: None,
        "": "",
        "www.example.com": "www.example.com",     # ASCII passthrough
        "bücher.de": "xn--bcher-kva.de",
        "shop.bücher.de": "shop.xn--bcher-kva.de",
        "münchen.github.io": "xn--mnchen-3ya.github.io",
        "россия.рф": "xn--h1alffa9f.xn--p1ai",
        "mixed.bücher.xn--p1ai": "mixed.xn--bcher-kva.xn--p1ai",
        # label the idna codec refuses (>63 chars) -> raw punycode
        ("ü" * 64 + ".com"): "xn--" + ("ü" * 64).encode(
            "punycode").decode("ascii") + ".com",
    }
    for src, want in cases.items():
        assert host_to_ascii(src) == want, src


def test_host_to_ascii_total_and_idempotent():
    junk = ["..", "a..b", ".", "ü..ü", "xn--", "‍.com",
            "a" * 100 + ".ü", "☃", "\x00ü"]
    for h in junk:
        out = host_to_ascii(h)
        assert out is not None
        assert out.isascii() or out == h       # best-effort passthrough
        assert host_to_ascii(out) == out       # idempotent on output


@given(st.text(max_size=40))
@hyp_settings(max_examples=150, deadline=None)
def test_host_to_ascii_never_raises(s):
    out = host_to_ascii(s.lower())
    assert out is None or isinstance(out, str)


def test_with_ascii_host_distinct_join(spark):
    from thewhisperdb_spark.operators.idn import with_ascii_host

    df = spark.createDataFrame(
        [("Bücher.DE",), ("bücher.de",), ("plain.com",), (None,)],
        "host string")
    got = {r["host"]: r["host_ascii"]
           for r in with_ascii_host(df).collect()}
    assert got["Bücher.DE"] == "xn--bcher-kva.de"
    assert got["bücher.de"] == "xn--bcher-kva.de"
    assert got["plain.com"] == "plain.com"
    assert got[None] is None


def test_full_psl_default_and_rule_counts(spark):
    """The production default is the committed FULL upstream list;
    section/rule-class counts pin the file's integrity, and unicode
    rules must be stored punycode-encoded."""
    from thewhisperdb_spark.operators.psl import (
        DEFAULT_PSL,
        DEFAULT_SNAPSHOT,
        parse_psl_lines,
    )

    with open(DEFAULT_PSL, encoding="utf-8") as f:
        rules = parse_psl_lines(f)
    assert len(rules) == 9506
    by_section = {"icann": 0, "private": 0}
    n_wild = n_exc = 0
    for rule, _labels, is_wild, is_exc, section in rules:
        by_section[section] += 1
        n_wild += is_wild
        n_exc += is_exc
        assert rule.isascii(), rule            # encoded at parse time
    assert by_section == {"icann": 7380, "private": 2126}
    assert (n_wild, n_exc) == (107, 8)
    # the curated snapshot stays parseable as the small test fixture
    with open(DEFAULT_SNAPSHOT, encoding="utf-8") as f:
        assert len(parse_psl_lines(f)) > 30


def test_registrable_domain_idn_collapse(spark):
    """The property the whole module exists for: unicode and punycode
    spellings of one host -> ONE punycode registrable domain, against
    the full default list."""
    from thewhisperdb_spark.operators.psl import (
        load_psl,
        with_registrable_domain,
    )

    psl = load_psl(spark)
    df = spark.createDataFrame(
        [("shop.bücher.de",), ("shop.xn--bcher-kva.de",),
         ("a.münchen.github.io",), ("example.рф",),
         ("www.plain.com",), ("10.0.0.1",)], "host string")
    got = {r["host"]: r["registrable_domain"]
           for r in with_registrable_domain(df, psl).collect()}
    assert got["shop.bücher.de"] == "xn--bcher-kva.de"
    assert got["shop.xn--bcher-kva.de"] == "xn--bcher-kva.de"
    assert got["a.münchen.github.io"] == "xn--mnchen-3ya.github.io"
    assert got["example.рф"] == "example.xn--p1ai"
    assert got["www.plain.com"] == "plain.com"
    assert got["10.0.0.1"] == "10.0.0.1"
    # idna=False preserves the r10 exact-string behavior
    got_raw = {r["host"]: r["registrable_domain"]
               for r in with_registrable_domain(df, psl,
                                                idna=False).collect()}
    assert got_raw["shop.bücher.de"] == "bücher.de"


def test_canonicalize_urls_idn_frontier_key(spark):
    """Both spellings + case/port/dot-segment noise -> one frontier
    key; ASCII URLs bypass the codec entirely (idna=False twin)."""
    from thewhisperdb_spark.operators.urls import canonicalize_urls

    variants = ["https://Shop.Bücher.DE:443/a/./b/?x=1#f",
                "https://shop.xn--bcher-kva.de/a//b/?x=1",
                "https://shop.bücher.de/a/b/?x=1&utm_source=s"]
    df = spark.createDataFrame([(u,) for u in variants], "url string")
    out = canonicalize_urls(df)
    assert out.select("canonical_url").distinct().count() == 1
    assert out.collect()[0]["canonical_url"] == \
        "https://shop.xn--bcher-kva.de/a/b/?x=1"
    # userinfo survives the host swap
    u2 = spark.createDataFrame(
        [("https://u:p@Bücher.de/x",)], "url string")
    assert canonicalize_urls(u2).collect()[0]["canonical_url"] == \
        "https://u:p@xn--bcher-kva.de/x"
    # ASCII corpus: idna adds nothing, results equal the idna=False twin
    a = spark.createDataFrame(
        [("http://plain.com/a?b=1",)], "url string")
    assert (canonicalize_urls(a).collect()[0]["canonical_url"]
            == canonicalize_urls(a, idna=False)
            .collect()[0]["canonical_url"])
