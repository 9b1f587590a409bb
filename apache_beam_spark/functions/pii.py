"""PII scrubbing for training-corpus preparation.

Masks personally-identifiable substrings (emails, IPv4 addresses,
US-style phone numbers, SSN-shaped ids) with typed placeholder tokens,
and counts occurrences per kind — the standard pre-training hygiene
pass applied before text ever leaves the ingest pipeline.

Everything is ``regexp_replace`` / ``regexp_count`` Column expressions:
JVM-side, whole-stage-codegen, zero Python in the row path, so the scrub
runs at scan speed and fuses with whatever projection feeds it.  The
patterns deliberately use only the regex subset shared by Java's
``j.u.regex`` and RE2 (no lookaround, no backrefs) so the DuckDB oracle
can run the identical strings.

Kinds are ordered: more specific patterns (SSN) are applied before the
generic ones that could partially shadow them.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: kind -> (pattern, replacement token), in application order.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ssn": (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    "phone": (r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    "ipv4": (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
}


def pii_count(col: Column, kind: str) -> Column:
    """Occurrences of one PII kind (bigint Column)."""
    pat, _ = PII_PATTERNS[kind]
    return F.regexp_count(col, F.lit(pat))


def scrub_pii(col: Column, kinds: list[str] | None = None) -> Column:
    """Mask every listed PII kind (default: all) with its placeholder.

    Application order follows ``PII_PATTERNS`` insertion order so that
    SSNs are consumed before the phone pattern can half-match them.
    """
    out = col
    for kind in kinds if kinds is not None else list(PII_PATTERNS):
        pat, tok = PII_PATTERNS[kind]
        out = F.regexp_replace(out, pat, tok)
    return out
