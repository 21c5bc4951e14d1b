"""PII scrubbing (operators/pii.py): detector-by-detector golden cases,
Luhn validation as the card gate, scrub order, and count columns."""

from __future__ import annotations

from pyspark.sql import functions as F

from thewhisperdb_spark.operators.pii import (
    luhn_valid,
    pii_counts,
    scrub_pii,
)


def _scrub(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    return scrub_pii(df).collect()[0]["text_scrubbed"]


def test_scrub_golden_cases(spark):
    cases = {
        "mail a.b-c_d%e+f@sub.example.co.uk now":
            "mail [EMAIL] now",
        "call +1-202-555-0147 or (303) 555-0188":
            "call [PHONE] or [PHONE]",
        "dotted 303.555.0188 works too": "dotted [PHONE] works too",
        "host 10.0.0.1 and 255.255.255.255 but not 999.1.1.1 "
        "or 1.2.3.4.5":
            "host [IP] and [IP] but not 999.1.1.1 or 1.2.3.4.5",
        # valid Visa/MC/Amex test numbers scrub; a Luhn-broken one stays
        "cards 4242424242424242 and 5105 1051 0510 5100 and "
        "378-2822-4631-0005 but 4242424242424243 stays":
            "cards [CARD] and [CARD] and [CARD] but "
            "4242424242424243 stays",
        # 16-digit order id failing Luhn is untouched (the validation
        # point), and a plain long timestamp is untouched
        "order 1234567890123456 ts 20260816094500":
            "order 1234567890123456 ts 20260816094500",
        "no pii here.": "no pii here.",
        # ADVICE r10: a valid card that ALSO appears as a substring of
        # a longer digit run elsewhere must not be rewritten inside
        # that run (the run itself is not a candidate — no boundary)
        "pay 4242424242424242 ref 94242424242424242426":
            "pay [CARD] ref 94242424242424242426",
    }
    for src, want in cases.items():
        assert _scrub(spark, src) == want, src


def test_luhn_column(spark):
    rows = [("4242424242424242", True), ("378282246310005", True),
            ("4242 4242 4242 4242", True), ("4242424242424243", False),
            ("1234567890123456", False), ("42424242", False)]
    df = spark.createDataFrame(rows, "cand string, want boolean")
    got = df.select("want", luhn_valid(F.col("cand")).alias("got")).collect()
    assert all(r["want"] == r["got"] for r in got)


def test_pii_counts(spark):
    df = spark.createDataFrame(
        [("a@b.com c@d.org +1 202 555 0147 10.0.0.1 "
          "card 4242424242424242 id 1234567890123456",)], "text string")
    r = pii_counts(df).collect()[0]
    assert (r["n_emails"], r["n_cards"], r["n_phones"], r["n_ips"]) == \
        (2, 1, 1, 1)
