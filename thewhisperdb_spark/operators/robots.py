"""robots.txt (Robots Exclusion Protocol, RFC 9309) parsing and
crawl-allow filtering — the policy dimension of the URL/domain family
(``urls.py`` provenance, ``psl.py`` grouping, this module permission).

Shape: robots bodies are parsed executor-side (Arrow ``mapInPandas``,
pure stdlib, never raises — a malformed file simply yields the rules it
legibly contains, which is what real crawlers do) into a flat RULES
DataFrame ``(host, pattern, is_allow, specificity, regex)``; URL
admission is then one join on host + the RFC's most-specific-match
decision as plain JVM aggregates — no Python in the per-URL hot path.

RFC 9309 semantics implemented:
- groups: consecutive ``User-agent`` lines share the following
  ``Allow``/``Disallow`` rules; group selection = exact product-token
  match (case-insensitive) with ``*`` fallback; no applicable group =>
  everything allowed;
- patterns: ``*`` wildcards and the ``$`` end anchor;
- decision: the matching rule with the MOST OCTETS wins; on a tie an
  allow rule beats a disallow (§2.2.2); no matching rule => allowed;
- an empty ``Disallow:`` contributes no rule (the classic allow-all).

Simplification documented per spec latitude: product-token matching is
exact-or-``*`` (the RFC's "most specific user-agent" is only observable
with token-prefix products, rare in practice); percent-decoding is the
caller's normalization concern.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

ROBOTS_RULE_SCHEMA = StructType([
    StructField("host", StringType()),
    StructField("pattern", StringType()),
    StructField("is_allow", BooleanType()),
    StructField("specificity", IntegerType()),
    StructField("regex", StringType()),
])


def _pattern_regex(pattern: str) -> str:
    """REP pattern -> anchored Java/RE2-safe regex: ``*`` -> ``.*``,
    trailing ``$`` -> end anchor, everything else literal."""
    anchored_end = pattern.endswith("$")
    body = pattern[:-1] if anchored_end else pattern
    parts = [re.escape(seg) for seg in body.split("*")]
    return "^" + ".*".join(parts) + ("$" if anchored_end else "")


def parse_robots(content: str, agent: str = "*"
                 ) -> list[tuple[str, bool, int, str]]:
    """One robots.txt body -> the applicable rule list for ``agent``:
    ``[(pattern, is_allow, specificity, regex)]``. Group selection per
    RFC 9309 §2.2.1: collect rules from every group naming the agent
    exactly (case-insensitive); if none, fall back to the ``*`` groups;
    if neither exists, the empty list (allow everything)."""
    agent = agent.strip().lower()
    exact: list[tuple[str, bool]] = []
    star: list[tuple[str, bool]] = []
    cur_agents: list[str] = []
    in_group_rules = False
    for raw in (content or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        key, sep, value = line.partition(":")
        if not sep:
            continue
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if in_group_rules:          # a new group starts
                cur_agents = []
                in_group_rules = False
            cur_agents.append(value.lower())
        elif key in ("allow", "disallow"):
            in_group_rules = True
            if not value:               # empty Disallow: allow-all no-op
                continue
            rule = (value, key == "allow")
            if agent in cur_agents:
                exact.append(rule)
            if "*" in cur_agents:
                star.append(rule)
        else:
            # sitemap/crawl-delay/unknown keys end nothing (RFC: rules
            # outside any group are ignored; other keys are transparent)
            continue
    chosen = exact if exact else star
    return [(p, a, len(p.rstrip("$")), _pattern_regex(p))
            for p, a in chosen]


def extract_robots_rules(df: DataFrame, host_col: str = "host",
                         content_col: str = "robots_txt",
                         agent: str = "*") -> DataFrame:
    """(host, robots body) rows -> the flat rules DataFrame for one
    agent. A host whose body yields no applicable rules produces no
    rows (join-miss downstream = allow-all, the RFC default)."""
    src = df.select(F.col(host_col).alias("host"),
                    F.col(content_col).alias("body"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {f.name: [] for f in ROBOTS_RULE_SCHEMA.fields}
            for host, body in zip(pdf["host"], pdf["body"]):
                for pat, allow, spec, rx in parse_robots(
                        body if body is not None else "", agent):
                    rows["host"].append(host)
                    rows["pattern"].append(pat)
                    rows["is_allow"].append(allow)
                    rows["specificity"].append(spec)
                    rows["regex"].append(rx)
            out = pd.DataFrame({k: rows[k] for k in rows})
            out["specificity"] = pd.array(rows["specificity"],
                                          dtype="Int32")
            yield out[[f.name for f in ROBOTS_RULE_SCHEMA.fields]]

    return src.mapInPandas(run, ROBOTS_RULE_SCHEMA)


def robots_allowed(urls: DataFrame, rules: DataFrame,
                   url_col: str = "url",
                   out_col: str = "robots_allowed") -> DataFrame:
    """Append the admission verdict: for each URL, the most-specific
    matching rule of its host decides (ties -> allow; no rule / no host
    entry -> allowed). One equi-join on host + one groupBy — the RFC
    §2.2.2 decision is the lexicographic max of (specificity, is_allow),
    computed as a JVM struct max, never a Python loop."""
    from thewhisperdb_spark.operators.urls import url_host

    keyed = urls.withColumn("_rb_host", url_host(F.col(url_col)))
    # RFC 9309 §2.2.2 matches the path-and-query ("the path of the URI"
    # including the query component) — a bare PATH miss made rules like
    # 'Disallow: /search?q=' unmatchable (ADVICE r10).
    query = F.try_parse_url(F.col(url_col), F.lit("QUERY"))
    path = F.concat(
        F.coalesce(F.try_parse_url(F.col(url_col), F.lit("PATH")),
                   F.lit("/")),
        F.when(query.isNotNull(), F.concat(F.lit("?"), query))
         .otherwise(F.lit("")))
    probe = (keyed.select("_rb_host", F.col(url_col).alias("_rb_url"),
                          path.alias("_rb_path")).distinct())
    matched = (probe.join(rules.withColumnRenamed("host", "_rb_host"),
                          "_rb_host")
               .filter(F.expr("_rb_path rlike regex")))
    verdict = (matched.groupBy("_rb_url")
               .agg(F.max(F.struct(F.col("specificity"),
                                   F.col("is_allow"))).alias("best"))
               .select("_rb_url",
                       F.col("best.is_allow").alias("_rb_allow")))
    out = (keyed.join(verdict,
                      keyed[url_col] == verdict["_rb_url"], "left")
           .withColumn(out_col, F.coalesce(F.col("_rb_allow"),
                                           F.lit(True)))
           .drop("_rb_host", "_rb_url", "_rb_allow"))
    return out


def drop_robots_disallowed(urls: DataFrame, rules: DataFrame,
                           url_col: str = "url") -> DataFrame:
    """Filter form of :func:`robots_allowed` — the crawl-frontier gate."""
    return (robots_allowed(urls, rules, url_col)
            .filter(F.col("robots_allowed")).drop("robots_allowed"))
