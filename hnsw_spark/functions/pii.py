"""PII detection / redaction kernels — regex-based scrubbing of emails,
phone numbers, IPv4 addresses, and SSN-shaped ids from text columns.

Pattern-based scrubbing is the first PII pass every large-scale text
pipeline runs (the C4 / Dolma / FineWeb recipe): cheap enough to run over
the full crawl, deterministic, and auditable.  Entity-model passes (NER)
would layer on top as a Pandas-UDF stage; the regex tier is pure Catalyst —
`regexp_replace`/`regexp_extract_all` run JVM-side inside whole-stage
codegen, so scrubbing fuses into the same scan stage as the rest of
curation and adds zero shuffles.

The patterns are written in the common subset of Java regex (Spark) and RE2
(DuckDB) — no backreferences, no lookarounds — so every kernel has an exact
SQL oracle.  Order of redaction matters (emails contain digit runs a phone
pattern could half-match), so ``redact_pii`` applies patterns in a fixed
order: email → ipv4 → ssn → phone.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ordered: applied in this sequence by redact_pii; dict order is the contract
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
    "ssn": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
    "phone": r"\b\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b",
}


def _col(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def pii_count(col: Column | str, kind: str) -> Column:
    """Number of matches of one PII kind in the text."""
    return F.size(
        F.regexp_extract_all(_col(col), F.lit(PII_PATTERNS[kind]), 0)
    )


def pii_counts(col: Column | str) -> dict[str, Column]:
    """All per-kind match counts, one pass per kind over the same column —
    each is an independent codegen expression, no intermediate strings."""
    return {kind: pii_count(col, kind) for kind in PII_PATTERNS}


def redact_pii(col: Column | str, token: str = "<PII:{kind}>") -> Column:
    """Replace every PII match with a typed placeholder, applying patterns
    in the canonical order so overlapping matches resolve deterministically
    (an email's digits are consumed before the phone pattern sees them)."""
    out = _col(col)
    for kind, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, token.format(kind=kind))
    return out
