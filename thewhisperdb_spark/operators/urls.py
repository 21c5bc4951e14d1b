"""URL / domain operators: the provenance dimension of a web-crawl
pipeline — per-domain caps, blocklist filtering, and TLD/host analytics
all key on fields derived here, entirely JVM-side (``try_parse_url`` +
string expressions; no Python in the hot path).

``registrable_domain`` is the eTLD+1-style grouping key (the unit
blocklists and per-site caps actually mean): last-two-labels, widened to
last-three under the common multi-part public suffixes (co.uk, com.au,
...). The full Public Suffix List is a data file, not an algorithm — at
production scale load it into ``multi_suffixes`` via the broadcast-join
variant; the built-in set is the documented baseline.

The reference has no URL handling; north-star extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# common multi-part public suffixes: registrable domain = label-3.suffix
MULTI_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk",
    "com.au", "net.au", "org.au", "edu.au",
    "co.jp", "or.jp", "ne.jp", "ac.jp", "go.jp",
    "com.br", "net.br", "org.br", "co.in", "net.in", "org.in",
    "co.nz", "org.nz", "net.nz", "co.za", "com.cn", "net.cn", "org.cn",
    "com.mx", "com.ar", "com.tr", "com.sg", "com.hk", "co.kr", "or.kr",
)


def url_host(url: Column) -> Column:
    """Lowercased host with any userinfo/port stripped. ``try_parse_url``
    (NOT ``parse_url``) is load-bearing: under Spark 4 ANSI mode
    ``parse_url`` THROWS on a malformed URL, so one garbage frontier
    entry would abort the whole job; the try_ variant yields NULL and
    the row stays visible downstream (degenerate-inputs contract)."""
    host = F.lower(F.try_parse_url(url, F.lit("HOST")))
    host = F.regexp_replace(host, r"^.*@", "")
    return F.regexp_replace(host, r":\d+$", "")


def _is_ip(host: Column) -> Column:
    return host.rlike(r"^\d{1,3}(\.\d{1,3}){3}$")


def registrable_domain(host: Column) -> Column:
    """eTLD+1-style grouping key: last two host labels, last THREE when
    the two-label tail is a known multi-part suffix; IPs and single-label
    hosts pass through unchanged."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(".", F.element_at(parts, -2),
                        F.element_at(parts, -1))
    last3 = F.concat_ws(".", F.element_at(parts, -3),
                        F.element_at(parts, -2), F.element_at(parts, -1))
    is_multi = last2.isin(*MULTI_SUFFIXES)
    return (F.when(_is_ip(host) | (n <= 1), host)
            .when(is_multi & (n >= 3), last3)
            .when(n >= 2, last2)
            .otherwise(host))


def url_features(df: DataFrame, url_col: str = "url",
                 psl: DataFrame | None = None) -> DataFrame:
    """Append the provenance columns: ``scheme``, ``host``,
    ``registrable_domain``, ``tld`` (NULL for IP hosts), ``path_depth``
    (number of non-empty path segments), ``has_query``, ``is_ip``. Pure
    expression pipeline — Catalyst folds it into the scan. Pass ``psl``
    (``operators/psl.load_psl``) to compute ``registrable_domain`` with
    the exact Public Suffix List algorithm (one broadcast join over
    distinct hosts) instead of the zero-data last-2/3-label baseline."""
    url = F.col(url_col)
    host = url_host(url)
    path = F.coalesce(F.try_parse_url(url, F.lit("PATH")), F.lit(""))
    if psl is not None:
        from thewhisperdb_spark.operators.psl import with_registrable_domain

        df = with_registrable_domain(df.withColumn("host", host), psl)
        host = F.col("host")
    return (df
            .withColumn("scheme",
                        F.lower(F.regexp_extract(url, r"^([A-Za-z][\w+.-]*):",
                                                 1)))
            .withColumn("host", host)
            .withColumn("registrable_domain",
                        F.col("registrable_domain") if psl is not None
                        else registrable_domain(host))
            .withColumn("tld", F.when(_is_ip(host), F.lit(None)).otherwise(
                F.element_at(F.split(host, r"\."), -1)))
            .withColumn("path_depth",
                        F.size(F.filter(F.split(path, "/"),
                                        lambda s: s != "")))
            .withColumn("has_query",
                        F.try_parse_url(url, F.lit("QUERY")).isNotNull())
            .withColumn("is_ip", _is_ip(host)))


def drop_blocklisted(df: DataFrame, blocklist: DataFrame,
                     url_col: str = "url",
                     block_col: str = "domain") -> DataFrame:
    """Remove rows whose host IS a blocklisted domain OR sits anywhere
    under one — real blocklists carry entries at every depth
    (``evil.example.com`` must also block ``a.b.evil.example.com``), so
    host-equality and registrable-domain equality are both wrong; the
    correct relation is label-suffix membership. Each distinct host
    explodes into its ~5 label suffixes (``a.b.c.com`` -> a.b.c.com,
    b.c.com, c.com, com) for a broadcast equi-join against the
    blocklist; the fact side is then anti-joined by host — never scanned
    twice, never compared by LIKE."""
    keyed = df.withColumn("_host", url_host(F.col(url_col)))
    parts = F.split(F.col("_host"), r"\.")
    sufs = F.transform(
        F.sequence(F.lit(1), F.size(parts)),
        lambda i: F.array_join(
            F.slice(parts, i, F.size(parts) - i + 1), "."))
    exploded = (keyed.select("_host").distinct()
                .select("_host", F.explode(sufs).alias("_suf")))
    bl = blocklist.select(F.lower(F.col(block_col)).alias("_suf")).distinct()
    bad_hosts = (exploded.join(F.broadcast(bl), "_suf")
                 .select("_host").distinct())
    return keyed.join(bad_hosts, "_host", "left_anti").drop("_host")


TRACKING_PARAM_RE = r"^(utm_[a-z]+|fbclid|gclid|msclkid|mc_eid|igshid)$"


def canonicalize_url(url: Column,
                     tracking_re: str = TRACKING_PARAM_RE) -> Column:
    """Crawl-frontier URL canonicalization — the key two fetches of the
    same page must agree on (frontier dedup, URL-seen sets, per-URL
    quotas key on THIS, not the raw string). RFC 3986 normalizations,
    all JVM HOFs (no Python, no shuffle):

    - scheme and host lowercased; trailing host dot dropped;
    - default ports stripped (``:80`` for http, ``:443`` for https);
    - dot-segments resolved (``/a/./b/../c`` -> ``/a/c``) via a
      push/pop ``aggregate`` fold; duplicate slashes collapsed; empty
      path -> ``/``;
    - query: tracking params dropped (``utm_*``/fbclid/gclid/...),
      remaining params sorted byte-wise (stable key for reordered
      params), empty query dropped;
    - fragment dropped.

    Percent-encoding is passed through untouched (case-normalizing it
    safely needs a decode table; out of scope and rarely the dedup
    blocker)."""
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][\w+.-]*):", 1))
    rest = F.regexp_replace(url, r"^[A-Za-z][\w+.-]*://", "")
    rest = F.regexp_replace(rest, r"#.*$", "")          # fragment
    hostport = F.regexp_extract(rest, r"^([^/?]*)", 1)
    userinfo = F.regexp_extract(hostport, r"^(.*@)", 1)
    host = F.lower(F.regexp_replace(hostport, r"^.*@", ""))
    host = F.regexp_replace(host, r"\.$", "")
    host = F.when(
        (scheme == "http") & host.endswith(":80"),
        F.regexp_replace(host, r":80$", "")
    ).when(
        (scheme == "https") & host.endswith(":443"),
        F.regexp_replace(host, r":443$", "")
    ).otherwise(host)
    tail = F.regexp_replace(rest, r"^[^/?]*", "")       # /path?query
    path = F.regexp_extract(tail, r"^([^?]*)", 1)
    query = F.when(tail.contains("?"),
                   F.regexp_replace(tail, r"^[^?]*\?", "")) \
        .otherwise(F.lit(None))
    # dot-segment fold over the slash-split path
    collapsed = F.regexp_replace(path, r"/+", "/")
    segs = F.split(collapsed, "/")
    resolved = F.aggregate(
        segs, F.array().cast("array<string>"),
        lambda acc, s: F.when(s == ".", acc)
        .when((s == "..") & (F.size(acc) > 0),
              F.slice(acc, 1, F.size(acc) - 1))
        .when(s == "..", acc)
        .otherwise(F.concat(acc, F.array(s))))
    joined = F.array_join(F.filter(resolved, lambda s: s != ""), "/")
    # RFC 3986 treats '/a/b/' and '/a/b' as distinct resources; the
    # fold above dropped the trailing empty segment, silently colliding
    # them on one frontier key (ADVICE r10). Preserve directory-ness:
    # re-append '/' when the collapsed pre-fold path ended in '/' or in
    # a '.'/'..' segment (both resolve to a directory per §5.2.4).
    dir_tail = collapsed.rlike(r"(/|(^|/)\.{1,2})$")
    norm_path = F.concat(
        F.lit("/"), joined,
        F.when(dir_tail & (joined != ""), F.lit("/"))
         .otherwise(F.lit("")))
    kept = F.array_sort(F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~F.regexp_extract(
            p, r"^([^=]*)", 1).rlike(tracking_re)))
    norm_query = F.when(query.isNull() | (F.size(kept) == 0), F.lit("")) \
        .otherwise(F.concat(F.lit("?"), F.array_join(kept, "&")))
    return F.concat(scheme, F.lit("://"), userinfo, host, norm_path,
                    norm_query)


def canonicalize_urls(df: DataFrame, url_col: str = "url",
                      out_col: str = "canonical_url",
                      idna: bool = True,
                      tracking_re: str = TRACKING_PARAM_RE) -> DataFrame:
    """DataFrame form of :func:`canonicalize_url`, adding the IDN host
    step the pure-Column expression cannot express: unicode hosts are
    punycode-encoded (``idn.host_to_ascii``) so both spellings of a
    site land on ONE frontier key.

    Scale shape: the JVM expression canonicalizes every row; the
    Python codec then sees only DISTINCT NON-ASCII hosts (one tiny
    broadcast join back — a crawl frontier is overwhelmingly ASCII).
    The host swap is position arithmetic on the canonical form (the
    scheme/userinfo prefix is regular by construction), not a second
    parse.
    """
    from thewhisperdb_spark.operators.idn import NON_ASCII_RE, idna_ascii

    out = df.withColumn(out_col, canonicalize_url(F.col(url_col),
                                                  tracking_re))
    if not idna:
        return out
    c = F.col(out_col)
    prefix = F.regexp_extract(c, r"^([a-z][\w+.-]*://(?:[^/?@]*@)?)", 1)
    host = F.regexp_extract(c, r"^[a-z][\w+.-]*://(?:[^/?@]*@)?([^/?]*)",
                            1)
    keyed = out.withColumn("_cu_host", host)
    mapping = (keyed.select("_cu_host")
               .filter(F.col("_cu_host").rlike(NON_ASCII_RE))
               .distinct()
               .select("_cu_host",
                       idna_ascii(F.col("_cu_host")).alias("_cu_ascii")))
    swapped = F.concat(
        prefix, F.col("_cu_ascii"),
        F.substring(c, F.length(prefix) + F.length(F.col("_cu_host")) + 1,
                    F.lit(1 << 30)))
    return (keyed.join(F.broadcast(mapping), "_cu_host", "left")
            .withColumn(out_col,
                        F.when(F.col("_cu_ascii").isNotNull(), swapped)
                        .otherwise(c))
            .drop("_cu_host", "_cu_ascii"))


def frontier_schedule(df: DataFrame, url_col: str = "url",
                      host_col: str | None = None,
                      delay_col: str | None = None,
                      default_delay_s: float = 1.0,
                      priority_col: str | None = None) -> DataFrame:
    """Politeness scheduling for a crawl frontier batch: the step between
    robots admission and fetch dispatch. Within each host, URLs are
    ranked (highest ``priority_col`` first, URL string as the
    deterministic tie-break) and assigned ``fetch_offset_s`` =
    (rank-1) * the host's crawl delay — the earliest time each URL may
    be fetched relative to the host's first request without violating
    the per-host rate limit. ``host_drain_s`` (the same offset of the
    host's LAST url) rides along per row: the frontier-shaping signal —
    a host whose drain time exceeds the crawl window needs its tail
    re-queued, which is how per-batch host caps should be sized.

    ``delay_col`` names a per-host delay column (e.g. sourced from a
    robots Crawl-delay extension or a per-domain policy table); absent,
    ``default_delay_s`` applies. ``host_col`` absent, the host derives
    from ``url_col`` (same normalization as url_features).

    Scale shape: ONE hash shuffle on the host key; the rank window is
    partitioned BY HOST — per-host sequential order is the politeness
    semantic itself, so this is the minimum possible parallelism grain,
    and a mega-host's long partition is precisely the host_drain_s
    signal telling the operator's caller to cap it. All arithmetic is
    rank * delay over literals/columns — integer-deterministic and
    fully SQL-portable.

    Returns ``df``'s columns + ``host`` (if derived) + ``rank_in_host``,
    ``fetch_offset_s``, ``host_drain_s`` (4dp).
    """
    out = df
    if host_col is None:
        out = out.withColumn("host", url_host(F.col(url_col)))
        host_col = "host"
    delay = (F.col(delay_col) if delay_col is not None
             else F.lit(float(default_delay_s))).cast("double")
    order = ([F.col(priority_col).desc()] if priority_col else []) \
        + [F.col(url_col).asc()]
    w = Window.partitionBy(host_col).orderBy(*order)
    wh = Window.partitionBy(host_col)
    rank = F.row_number().over(w)
    out = out.withColumn("rank_in_host", rank)
    return (out
            .withColumn("fetch_offset_s",
                        F.round((F.col("rank_in_host") - 1) * delay, 4))
            .withColumn("host_drain_s",
                        F.round(F.max("fetch_offset_s").over(wh), 4)))
