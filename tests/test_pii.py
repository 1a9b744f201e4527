"""PII detection/redaction (operators/pii.py): pattern precision,
redaction order, and count semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from bike_data_flow_spark.operators.pii import (
    EMAIL_TOKEN,
    IP_TOKEN,
    PHONE_TOKEN,
    pii_counts,
    redact_pii,
)


def _one(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    counts = pii_counts(F.col("text"))
    row = df.select(
        redact_pii(F.col("text")).alias("red"),
        counts["n_emails"].alias("e"),
        counts["n_ips"].alias("i"),
        counts["n_phones"].alias("p"),
    ).first()
    return row["red"], (row["e"], row["i"], row["p"])


def test_email_redacts_and_counts(spark):
    red, c = _one(spark, "write to a.b+tag@sub.example.co today")
    assert red == f"write to {EMAIL_TOKEN} today"
    assert c == (1, 0, 0)


def test_ip_and_phone(spark):
    red, c = _one(spark, "from 192.168.0.1 call +1-800-555-0199 now")
    assert red == f"from {IP_TOKEN} call {PHONE_TOKEN} now"
    assert c == (0, 1, 1)


def test_email_at_dotted_quad_host_scrubs_the_ip(spark):
    # a dotted-quad "host" has no alpha TLD, so the email pattern
    # (rightly) passes and the IP redactor scrubs the address part —
    # the sensitive bytes still leave the text
    red, c = _one(spark, "root@10.0.0.1 logged in")
    assert red == f"root@{IP_TOKEN} logged in"
    assert c == (0, 1, 0)


def test_email_with_alpha_tld_wins_over_ip_inside_it(spark):
    # counts mirror the redactor: once the email is gone, no IP remains
    red, c = _one(spark, "u@mail4.example.com at 8.8.8.8")
    assert red == f"{EMAIL_TOKEN} at {IP_TOKEN}"
    assert c == (1, 1, 0)


def test_plain_numbers_and_versions_do_not_match(spark):
    s = "version 1.2.3 sold 4567 units at 12-30"
    red, c = _one(spark, s)
    assert red == s
    assert c == (0, 0, 0)


def test_unprefixed_phone_does_not_match(spark):
    s = "call 800-555-0199"  # no + prefix: out of pattern scope by design
    red, c = _one(spark, s)
    assert red == s
    assert c == (0, 0, 0)


def test_multiple_matches_per_row(spark):
    red, c = _one(spark, "a@b.co or c@d.org via 1.1.1.1 and 2.2.2.2")
    assert red == f"{EMAIL_TOKEN} or {EMAIL_TOKEN} via {IP_TOKEN} and {IP_TOKEN}"
    assert c == (2, 2, 0)
