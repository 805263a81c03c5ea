"""PII scrubbing for web-scale training corpora.

Training-data pipelines redact personally identifiable information
before text ships to a model (the reference service handles legal
documents — `/root/reference/README.md` motivates exactly this class of
text). This module implements the standard regex tier: emails, phone
numbers, and IPv4 addresses are replaced with typed placeholder tokens
and counted per document. (NER-based PII detection is a model inference
stage, out of scope for a batch SQL engine; the regex tier is what
C4/CCNet-class pipelines run at full-corpus scale.)

Patterns are deliberately restricted to syntax with identical semantics
in Java regex (Spark codegen) and RE2 (the DuckDB oracle): character
classes, bounded repetition, ``\\b``, and ``\\d`` — no backreferences,
no lookaround. The scrub applies email -> phone -> IPv4 in that fixed
order; per-kind counts are measured on the ORIGINAL text so they are
order-independent. Placeholders contain no digits or ``@``, so a
replacement can never create a new match for a later pattern.

Scale shape: pure projection — scan -> project, zero shuffle, zero
joins; the regex work happens JVM-side inside whole-stage codegen (no
Python workers). At 10^12 documents this operator's cost is exactly one
pass over the text bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: portable (Java regex == RE2) PII patterns
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+\d{2} \d{4}-\d{4}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

EMAIL_TOKEN = "<EMAIL>"
PHONE_TOKEN = "<PHONE>"
IPV4_TOKEN = "<IP>"


def scrub_pii(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Redact emails/phones/IPv4 from ``text_col``.

    Returns one row per input row: ``doc_id``, per-kind match counts
    (on the original text), and ``scrubbed_text`` with every match
    replaced by its placeholder token. Null text scrubs to the empty
    string (the operator is total)."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, EMAIL_RE, EMAIL_TOKEN),
            PHONE_RE,
            PHONE_TOKEN,
        ),
        IPV4_RE,
        IPV4_TOKEN,
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.regexp_count(t, F.lit(EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(t, F.lit(PHONE_RE)).cast("long").alias("n_phones"),
        F.regexp_count(t, F.lit(IPV4_RE)).cast("long").alias("n_ipv4"),
        scrubbed.alias("scrubbed_text"),
    )
