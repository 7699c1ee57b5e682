"""PII detection / redaction plane — the scrub pass every web-scale
training corpus runs before release (C4/RefinedWeb-style, public
recipes). Detection = per-doc match counts for email / IPv4 / intl-phone
patterns; redaction = typed placeholder substitution.

Engine notes:
- Pure `regexp_extract_all` / `regexp_replace` column ops — JVM-side,
  whole-stage-codegen, zero shuffle, zero Python. At 100 TB this is a
  map-only pass fused into whatever scan already reads the text.
- The patterns are deliberately restricted to the Java-regex ∩ RE2
  common subset (no lookaround, no backrefs) so the DuckDB oracles bind
  byte-identical semantics.
- Redaction order is fixed (email → ipv4 → phone): the email local part
  may contain '+' and digits, so stripping emails first prevents the
  phone/IP patterns from matching fragments of an address.

The synthetic corpus fixture contains no organic PII, so the catalog
entries exercise these ops over a deterministic augmentation column
(doc_id-derived addresses/IPs/numbers appended to the text, mirrored
literally in the DuckDB oracle); the planted pytest pins the raw ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Java-regex ∩ RE2 subset; keep in sync with the SQL strings in catalog.py
EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+\d{9,14}\b"


def pii_signals(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc PII match counts + a has_pii flag. One codegen'd map pass;
    the three extract_all calls share the lowered text via a single
    projection (Catalyst CSE handles the lower() — no Generate barrier
    needed because each regex is evaluated exactly once)."""
    low = F.lower(text_col)
    n_email = F.size(F.regexp_extract_all(low, F.lit(EMAIL_RE), 0))
    n_ipv4 = F.size(F.regexp_extract_all(low, F.lit(IPV4_RE), 0))
    n_phone = F.size(F.regexp_extract_all(low, F.lit(PHONE_RE), 0))
    return docs.select(
        "doc_id",
        n_email.alias("n_emails"),
        n_ipv4.alias("n_ipv4"),
        n_phone.alias("n_phones"),
        ((n_email + n_ipv4 + n_phone) > 0).cast("int").alias("has_pii"),
    )


def redact(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Typed-placeholder redaction: emails → [EMAIL], IPv4 → [IP],
    phone-like +digits → [PHONE], applied in that order on the lowered
    text. Emits a compact contract for oracle comparison (md5 + length of
    the redacted text) alongside the redacted string itself."""
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.lower(text_col), EMAIL_RE, "[EMAIL]"),
            IPV4_RE,
            "[IP]",
        ),
        PHONE_RE,
        "[PHONE]",
    )
    return docs.select(
        "doc_id",
        red.alias("text_redacted"),
        F.md5(red).alias("red_hash"),
        F.length(red).alias("red_len"),
    )
