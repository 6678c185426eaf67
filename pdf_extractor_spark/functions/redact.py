"""PII redaction for training-data pipelines (beyond-reference web op).

Standard corpus-prep scrub: replace emails / phone numbers / IPv4 literals
with typed placeholder tokens before training. Pure ``regexp_replace``
expressions (codegen'd, no UDF); every pattern is written in the common
Java-regex/RE2 dialect so the DuckDB oracle runs the identical patterns
(notably: no ``\\s`` — Java and RE2 disagree on vertical tab — and no
backreferences in replacements).

Spark's regexp_replace is global by default; the SQL oracle must pass the
'g' flag to match.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9][0-9()\- ]{7,}[0-9]"
IPV4_RE = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"

EMAIL_TOKEN = "<EMAIL>"
PHONE_TOKEN = "<PHONE>"
IP_TOKEN = "<IP>"


def redact_pii(col: Column) -> Column:
    """Emails first (their digits must not feed the phone pattern), then
    IPv4 (dots would otherwise split into phone-ish digit runs), then
    phones."""
    out = F.regexp_replace(col, EMAIL_RE, EMAIL_TOKEN)
    out = F.regexp_replace(out, IPV4_RE, IP_TOKEN)
    return F.regexp_replace(out, PHONE_RE, PHONE_TOKEN)


def pii_counts(col: Column) -> tuple[Column, Column, Column]:
    """(n_emails, n_ips, n_phones) found in the ORIGINAL text."""
    return (
        F.size(F.regexp_extract_all(col, F.lit(EMAIL_RE), 0)),
        F.size(F.regexp_extract_all(col, F.lit(IPV4_RE), 0)),
        F.size(F.regexp_extract_all(col, F.lit(PHONE_RE), 0)),
    )


# Training-text cleanup (the pre-tokenizer normalization every corpus
# pipeline runs). \\x{...} codepoint escapes parse identically in Java
# regex and RE2, so the DuckDB oracle runs the same pattern strings.
CONTROL_RE = r"[\x{00}-\x{08}\x{0B}\x{0C}\x{0E}-\x{1F}\x{7F}]"
UNICODE_SPACE_RE = r"[\x{A0}\x{1680}\x{2000}-\x{200A}\x{202F}\x{205F}\x{3000}]"
ZERO_WIDTH_RE = r"[\x{AD}\x{200B}-\x{200D}\x{2060}\x{FEFF}]"


def clean_training_text(col: Column) -> Column:
    """Normalize raw extracted text for tokenization: drop control chars
    and zero-width/soft-hyphen marks, map exotic unicode spaces to ASCII
    space, collapse space runs, trim. Order matters: zero-width removal
    can join two space runs that must then collapse."""
    out = F.regexp_replace(col, CONTROL_RE, "")
    out = F.regexp_replace(out, ZERO_WIDTH_RE, "")
    out = F.regexp_replace(out, UNICODE_SPACE_RE, " ")
    out = F.regexp_replace(out, " {2,}", " ")
    return F.trim(out)
