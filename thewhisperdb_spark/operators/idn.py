"""IDN (Internationalized Domain Name) host normalization — the
punycode bridge between unicode host spellings and the ASCII rule/key
space every other URL operator works in (``psl.py`` matching is exact
on strings; ``urls.canonicalize_url`` lowercases but cannot encode).
Without it, ``bücher.example`` and ``xn--bcher-kva.example`` are two
frontier keys, two registrable domains, two per-domain quota buckets —
for the same site.

Encoding (RFC 3490 ToASCII, the stdlib ``idna`` codec = IDNA 2003
nameprep + RFC 3492 punycode) is an adaptive-bias algorithmic loop
with no JVM expression equivalent, so it runs in Python — but NEVER
per row:

- ``idna_ascii`` is an Arrow-batched ``pandas_udf`` intended for
  DISTINCT-HOST frames (the ``psl.py`` / ``robots.py`` pattern:
  per-distinct-host work, then one broadcast join back to the fact
  table);
- ``with_ascii_host`` packages that distinct→encode→join-back shape
  for callers holding a full URL/host fact table; hosts that are
  already ASCII never enter the Python path at all (gated by a JVM
  ``rlike`` on the distinct frame).

Totality: arbitrary junk must flow through (crawl hosts are attacker
controlled). Per label: ASCII passes through; ``str.encode('idna')``
first (applies nameprep case-folding/width-mapping); labels the codec
refuses (length >63, empty, prohibited chars) fall back to raw
RFC 3492 punycode (``xn--`` + ``encode('punycode')``); anything else
passes through unchanged. The function is deterministic and
idempotent (ASCII output re-encodes to itself).

IDNA 2003 vs 2008/UTS46 note: the stdlib codec maps ``ß`` -> ``ss``
and drops ZWJ/ZWNJ (2003 rules) where UTS46-transitional browsers
agree but IDNA 2008 registries differ; documented latitude — the
property that matters for dedup/grouping is BOTH spellings of a host
collapsing to ONE key, which any fixed deterministic mapping gives.

The reference has no URL handling; north-star extension surface.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

# JVM-side gate: anything outside printable ASCII needs the codec
NON_ASCII_RE = r"[^\x00-\x7F]"


def host_to_ascii(host: str | None) -> str | None:
    """Pure-Python total IDNA ToASCII over one (already-lowercased)
    host string. See module docstring for the fallback ladder."""
    if host is None or not isinstance(host, str) or host.isascii():
        return host
    out = []
    for lab in host.split("."):
        if lab.isascii():
            out.append(lab)
            continue
        try:
            out.append(lab.encode("idna").decode("ascii"))
            continue
        except UnicodeError:
            pass
        try:
            out.append("xn--" + lab.encode("punycode").decode("ascii"))
        except UnicodeError:
            out.append(lab)
    return ".".join(out)


@pandas_udf(StringType())
def idna_ascii(hosts: pd.Series) -> pd.Series:
    """Arrow-batched ToASCII — apply to DISTINCT-host frames only (the
    fact-table path is :func:`with_ascii_host`)."""
    return hosts.map(host_to_ascii, na_action="ignore")


def with_ascii_host(df: DataFrame, host_col: str = "host",
                    out_col: str = "host_ascii") -> DataFrame:
    """Append the IDNA-ASCII form of ``host_col``.

    Scale shape: the Python codec sees only DISTINCT NON-ASCII hosts
    (a crawl corpus has few — the JVM ``rlike`` gate keeps the ASCII
    majority out of Arrow entirely); the fact table takes one
    broadcast-sized left join back on the raw host string.
    """
    raw = F.lower(F.col(host_col))
    keyed = df.withColumn("_idn_raw", raw)
    mapping = (keyed.select("_idn_raw")
               .filter(F.col("_idn_raw").isNotNull()
                       & F.col("_idn_raw").rlike(NON_ASCII_RE))
               .distinct()
               .select("_idn_raw",
                       idna_ascii(F.col("_idn_raw")).alias("_idn_ascii")))
    out = (keyed.join(F.broadcast(mapping), "_idn_raw", "left")
           .withColumn(out_col, F.coalesce(F.col("_idn_ascii"),
                                           F.col("_idn_raw")))
           .drop("_idn_raw", "_idn_ascii"))
    return out
