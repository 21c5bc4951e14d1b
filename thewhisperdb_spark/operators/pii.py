"""PII detection and scrubbing — the redaction pass every released
pretraining corpus runs (C4/RefinedWeb-style masking): emails, phone
numbers, IPv4 addresses, and Luhn-validated payment-card numbers are
replaced with typed placeholders, entirely JVM-side.

Shape notes for 100 TB:
- email/phone/IP are single ``regexp_replace`` expressions — fused into
  whole-stage codegen with the scan, no shuffle, no Python;
- card numbers need VALIDATION, not just a digit-run pattern (13-19
  digit runs are routinely order ids or timestamps): candidates come
  from ``regexp_extract_all``, the Luhn checksum runs as an integer
  fold over a ``sequence`` (pure HOF, no UDF), and only validated runs
  are replaced via an ``aggregate`` fold — still one projection;
- counts (``pii_counts``) are ``size(regexp_extract_all(...))``
  expressions for corpus dashboards.

False-positive posture is the standard one: international phones need
a ``+`` country prefix or US 3-3-4 shape with separators; IPv4 octets
are range-checked; bare 10+ digit runs are NOT treated as phones.
The reference has no PII handling; north-star extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
# +cc then 2-4 groups with separators, or US (xxx) xxx-xxxx / xxx-xxx-xxxx
PHONE_INTL_RE = r"\+\d{1,3}[ .-]?\(?\d{1,4}\)?[ .-]?\d{3,4}[ .-]?\d{2,4}"
PHONE_US_RE = r"(?<!\d)\(?\d{3}\)?[ .-]\d{3}[ .-]\d{4}(?!\d)"
IPV4_RE = (r"(?<![\d.])(?:(?:25[0-5]|2[0-4]\d|1?\d?\d)\.){3}"
           r"(?:25[0-5]|2[0-4]\d|1?\d?\d)(?![\d.])")
# candidate digit runs (optionally space/dash grouped), validated by Luhn.
# Known grouping ambiguity: two long digit runs separated by a single
# space parse as one candidate (which then fails Luhn and is kept) —
# the conservative failure mode for a redactor paired with counts.
CARD_CAND_RE = r"(?<![\d-])\d(?:[ -]?\d){12,18}(?![\d-])"

_TYPES = ("email", "card", "phone", "ipv4")


def luhn_valid(candidate: Column) -> Column:
    """Luhn checksum over the digits of ``candidate`` (separators
    stripped): integer ``aggregate`` fold, doubling every second digit
    from the RIGHT. 13-19 digits required."""
    ds = F.regexp_replace(candidate, r"[^0-9]", "")
    n = F.length(ds)

    def step(acc: Column, i: Column) -> Column:
        d = F.ascii(ds.substr(n - i + 1, F.lit(1))) - 48
        doubled = d * 2
        return acc + F.when(i % 2 == 0,
                            F.when(doubled > 9, doubled - 9)
                            .otherwise(doubled)).otherwise(d)

    total = F.aggregate(F.sequence(F.lit(1), n), F.lit(0), step)
    return (n >= 13) & (n <= 19) & (total % 10 == 0)


def scrub_pii(df: DataFrame, text_col: str = "text",
              out_col: str = "text_scrubbed",
              types: tuple[str, ...] = _TYPES) -> DataFrame:
    """Replace detected PII with ``[EMAIL]``/``[CARD]``/``[PHONE]``/
    ``[IP]``. Order matters and is fixed: emails first (their local
    parts may contain digits), then validated cards (before the phone
    pass can eat a card's digit groups), then phones, then IPs."""
    col = F.col(text_col)
    if "email" in types:
        col = F.regexp_replace(col, EMAIL_RE, "[EMAIL]")
    if "card" in types:
        cands = F.regexp_extract_all(col, F.lit(CARD_CAND_RE), 0)
        valid = F.filter(cands, luhn_valid)
        # Replace with the SAME boundary lookarounds the candidate scan
        # used — a bare substring replace rewrote valid-card substrings
        # inside longer non-candidate digit runs elsewhere in the text
        # (ADVICE r10). Candidates match only [0-9 -] so the literal is
        # regex-safe without escaping.
        col = F.aggregate(
            valid, col,
            lambda acc, c: F.regexp_replace(
                acc,
                F.concat(F.lit(r"(?<![\d-])"), c, F.lit(r"(?![\d-])")),
                F.lit("[CARD]")))
    if "phone" in types:
        col = F.regexp_replace(col, PHONE_INTL_RE, "[PHONE]")
        col = F.regexp_replace(col, PHONE_US_RE, "[PHONE]")
    if "ipv4" in types:
        col = F.regexp_replace(col, IPV4_RE, "[IP]")
    return df.withColumn(out_col, col)


def pii_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-row detection counts (n_emails, n_cards, n_phones, n_ips) —
    the corpus dashboard / release-audit companion of ``scrub_pii``.
    Phone counting applies the same two patterns sequentially on the
    email-scrubbed text, mirroring the scrub order."""
    col = F.col(text_col)
    emails = F.size(F.regexp_extract_all(col, F.lit(EMAIL_RE), 0))
    after_email = F.regexp_replace(col, EMAIL_RE, "[EMAIL]")
    cards = F.size(F.filter(
        F.regexp_extract_all(after_email, F.lit(CARD_CAND_RE), 0),
        luhn_valid))
    phones = (F.size(F.regexp_extract_all(after_email,
                                          F.lit(PHONE_INTL_RE), 0))
              + F.size(F.regexp_extract_all(
                  F.regexp_replace(after_email, PHONE_INTL_RE, "#"),
                  F.lit(PHONE_US_RE), 0)))
    ips = F.size(F.regexp_extract_all(col, F.lit(IPV4_RE), 0))
    return df.select(
        "*", emails.alias("n_emails"), cards.alias("n_cards"),
        phones.alias("n_phones"), ips.alias("n_ips"))
