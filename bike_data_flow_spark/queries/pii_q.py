"""PII detection/redaction queries (operators/pii.py).

The synthetic corpus contains no organic PII, so a bare scan would
hash-match vacuously (every count zero). Instead the query DECORATES
each doc deterministically from its id — both engines build the
identical decorated string — and the operator under test (the regex
detection + ordered redaction) runs on text with real matches, partial
matches, and clean rows. This is a fixture-in-the-query, not synthetic
input data: the base rows still come from the driver's documents table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import pii as P
from ..tables import load
from . import query

# SQL-side mirror of the decoration (same string on both engines)
_DECORATED_SQL = """
    SELECT doc_id,
           CASE
             WHEN doc_id % 3 = 0 THEN text
               || ' contact u' || CAST(doc_id AS VARCHAR)
               || '@example.com or +48-555-123-4567 from 10.0.'
               || CAST(doc_id % 256 AS VARCHAR) || '.1'
             WHEN doc_id % 3 = 1 THEN text
               || ' ping +1-800-555-0199 at mail.example.org'
             ELSE text
           END AS text
    FROM documents
"""


def _decorated(df: DataFrame) -> DataFrame:
    base = F.col("text")
    did = F.col("doc_id")
    with_all = F.concat(
        base,
        F.lit(" contact u"),
        did.cast("string"),
        F.lit("@example.com or +48-555-123-4567 from 10.0."),
        (did % 256).cast("string"),
        F.lit(".1"),
    )
    with_phone = F.concat(base, F.lit(" ping +1-800-555-0199 at mail.example.org"))
    text = (
        F.when(did % 3 == 0, with_all)
        .when(did % 3 == 1, with_phone)
        .otherwise(base)
    )
    return df.select("doc_id", text.alias("text"))


@query(
    "pii_redaction",
    oracle=f"""
    WITH d AS ({_DECORATED_SQL})
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{P.EMAIL_RE}')) AS INT)
             AS n_emails,
           CAST(len(regexp_extract_all(
             regexp_replace(text, '{P.EMAIL_RE}', '{P.EMAIL_TOKEN}', 'g'),
             '{P.IPV4_RE}')) AS INT) AS n_ips,
           CAST(len(regexp_extract_all(
             regexp_replace(
               regexp_replace(text, '{P.EMAIL_RE}', '{P.EMAIL_TOKEN}', 'g'),
               '{P.IPV4_RE}', '{P.IP_TOKEN}', 'g'),
             '{P.PHONE_RE}')) AS INT) AS n_phones,
           md5(
             regexp_replace(
               regexp_replace(
                 regexp_replace(text, '{P.EMAIL_RE}', '{P.EMAIL_TOKEN}', 'g'),
                 '{P.IPV4_RE}', '{P.IP_TOKEN}', 'g'),
               '{P.PHONE_RE}', '{P.PHONE_TOKEN}', 'g')
           ) AS redacted_md5
    FROM d
    """,
    bench=True,
)
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub over the corpus: per-doc email/IP/phone match counts
    plus an md5 of the fully-redacted text (byte-exact across engines —
    the real gate on replacement semantics). See operators/pii.py for
    the pattern-dialect and redaction-order contract."""
    docs = _decorated(load(spark, sf_dir, "documents"))
    counts = P.pii_counts(F.col("text"))
    return docs.select(
        "doc_id",
        counts["n_emails"].cast("int").alias("n_emails"),
        counts["n_ips"].cast("int").alias("n_ips"),
        counts["n_phones"].cast("int").alias("n_phones"),
        F.md5(P.redact_pii(F.col("text"))).alias("redacted_md5"),
    )
