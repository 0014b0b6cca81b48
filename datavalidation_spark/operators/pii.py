"""PII detection and redaction over text columns — pure-codegen regex ops.

Training corpora are scrubbed for personally identifying information before
use; at 100 TB this must be a single forward pass with no Python in the loop.
Both operators here compile to JVM `regexp_count` / `regexp_replace`
expressions (whole-stage codegen, no UDF, no shuffle) and push through scans
like any projection. The reference engine has no PII surface (its validators
are numeric domain checks); this is part of the LLM-data-pipeline tier the
target engine adds.

Pattern dialect: every pattern is written in the common subset of Java
regex (Spark) and RE2 (DuckDB oracle) — character classes, bounded repeats
and ``\\b`` word boundaries only; no lookaround, no backreferences — so the
exact same detection/redaction decisions are reproducible cross-engine and
the operator is oracle-checkable bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Ordered: redaction applies top-to-bottom, and order matters — emails are
# consumed before their digit runs could half-match phone shapes; SSN
# (3-2-4) before phone (3-3-4) keeps the disjoint shapes unambiguous.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "[SSN]"),
    ("phone", r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b", "[PHONE]"),
    (
        "ipv4",
        r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
        "[IPV4]",
    ),
]


def pii_counts(text: Column) -> dict[str, Column]:
    """{kind: match count} for each PII pattern — one `regexp_count` per
    kind, all evaluated in the same codegen stage over one pass of the
    string. Null text counts as zero matches."""
    return {
        kind: F.coalesce(F.regexp_count(text, F.lit(pat)), F.lit(0))
        for kind, pat, _ in PII_PATTERNS
    }


def redact_pii(text: Column) -> Column:
    """Replace every PII match with its ``[KIND]`` token, applying the
    patterns in ``PII_PATTERNS`` order (Spark `regexp_replace` replaces all
    occurrences). The result is deterministic and engine-portable: the
    DuckDB transcription chains ``regexp_replace(..., 'g')`` in the same
    order."""
    out = text
    for _, pat, token in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out
