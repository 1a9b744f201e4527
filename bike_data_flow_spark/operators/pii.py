"""PII detection and redaction (north-star extension; no reference
analog — every production training-data pipeline carries this stage:
Dolma's pii filter, CCNet derivatives, RedPajama's scrubbers).

Pure Column expressions over built-in regexp functions — JVM-side,
map-only, linear scan, zero Python in the hot path; redaction
replaces each match with a Dolma-style sentinel token so downstream
tokenization sees a single stable symbol instead of a half-removed
fragment.

Pattern dialect contract: the regexes use only the Java-regex ∩ RE2
subset (character classes, bounded repetition, literal dots — no
lookaround, no backreferences) so the DuckDB oracle evaluates the
IDENTICAL pattern; both engines scan non-overlapping left-to-right,
so match sets and replacement output agree byte-for-byte.

Deliberately conservative patterns (precision over recall): a false
positive silently deletes real text, a false negative is caught by
the next pipeline run — same stance as Dolma's default regexes.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# username@host.tld — the standard conservative email shape
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
# international-prefixed phone: +C[C[C]] sep NNN sep NNN[N] [sep NNNN]
# (requires the + prefix and separators so plain numbers never match)
PHONE_RE = "[+][0-9]{1,3}[- ][0-9]{3}[- ][0-9]{3,4}([- ][0-9]{2,4})?"
# dotted quad; octet range is NOT validated (RE2-portable, and Dolma
# doesn't either — 999.1.1.1 in text is still worth scrubbing)
IPV4_RE = "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"

EMAIL_TOKEN = "|||EMAIL|||"
PHONE_TOKEN = "|||PHONE|||"
IP_TOKEN = "|||IP|||"

# Redaction order matters and is part of the contract: emails first
# (so the IP pattern can't bite fragments of an alpha-TLD host like
# mail4.example.com), then IPs, then phones. An email at a PURE
# dotted-quad "host" (root@10.0.0.1) has no alpha TLD, so it falls to
# the IP redactor — the sensitive part still leaves the text.
_ORDER = ((EMAIL_RE, EMAIL_TOKEN), (IPV4_RE, IP_TOKEN), (PHONE_RE, PHONE_TOKEN))


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-row match counts before redaction: n_emails/n_phones/n_ips.
    NOTE: counts what the REDACTOR would hit — an email with a dotted-
    quad host counts as one email, not an email plus an IP."""
    after_email = F.regexp_replace(text, EMAIL_RE, EMAIL_TOKEN)
    after_ip = F.regexp_replace(after_email, IPV4_RE, IP_TOKEN)
    return {
        "n_emails": F.regexp_count(text, F.lit(EMAIL_RE)),
        "n_ips": F.regexp_count(after_email, F.lit(IPV4_RE)),
        "n_phones": F.regexp_count(after_ip, F.lit(PHONE_RE)),
    }


def redact_pii(text: Column) -> Column:
    """Replace every email/IPv4/phone match with its sentinel token."""
    out = text
    for pattern, token in _ORDER:
        out = F.regexp_replace(out, pattern, token)
    return out
