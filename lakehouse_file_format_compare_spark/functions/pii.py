"""PII detection and redaction for training-corpus hygiene.

A pretraining corpus pass needs to (a) MEASURE pii density per
document/source (to drop or downweight leaky sources) and (b) REDACT
matches in kept documents. Both are pure column expressions —
`regexp_count` / chained `regexp_replace` stay inside whole-stage
codegen, so a 100 TB sweep is scan-bound, shuffle-free, and prunes to
just the text column.

Patterns are deliberately RE2-safe (no lookaround/backrefs) so the
SAME pattern strings run on Spark (Java regex) and DuckDB (RE2) —
tests/test_pii.py value-oracles counts and redacted text on injected
fixtures (non-vacuous by construction: the r3 lesson from
dedup_embedding). Heuristic by design, like every regex PII pass:
the contract is "flags obvious emails/phones/IPs/card-like numbers",
not NER-grade recall.

No reference counterpart (the reference has no text hygiene surface);
extension for the LLM-pipeline story, same family as functions/text.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Shared Spark/DuckDB pattern strings (RE2-safe subset).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
# +CC optional, 2-3 digit area/prefix groups with -. or space joiners;
# \b guards keep plain long digit runs for the card pattern below
PHONE_RE = r"\+?[0-9]{1,3}[-. ][0-9]{2,4}[-. ][0-9]{3,4}[-. ]?[0-9]{0,4}|\([0-9]{2,3}\)[-. ]?[0-9]{3,4}[-. ]?[0-9]{4}"
IPV4_RE = r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b"
CARD_RE = r"\b[0-9]{13,16}\b"

PII_PATTERNS: dict[str, str] = {
    "email": EMAIL_RE,
    "phone": PHONE_RE,
    "ipv4": IPV4_RE,
    "card": CARD_RE,
}

REDACTED = "[PII]"


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-kind match counts (codegen'd regexp_count).

    Overlap rule: a dotted IPv4 whose last octets are 3-4 digits
    (e.g. 192.168.100.200) also matches PHONE_RE, so phones are
    counted on text with IPv4 matches first blanked to ';' (a
    non-digit, non-joiner char that cannot create new phone matches
    across the splice) — each such hit counts once, as ipv4.
    Redaction is unaffected: both kinds replace with the same token.
    """
    out = {}
    for kind, p in PII_PATTERNS.items():
        subject = (
            F.regexp_replace(text, IPV4_RE, ";") if kind == "phone" else text
        )
        out[kind] = F.regexp_count(subject, F.lit(p))
    return out


def pii_score(text: Column) -> Column:
    """Total PII hits per 1000 chars — the density metric a corpus
    policy thresholds on (drop document / drop source / redact)."""
    total = None
    for c in pii_counts(text).values():
        total = c if total is None else total + c
    return F.round(total * 1000.0 / F.greatest(F.length(text), F.lit(1)), 6)


def redact_pii(text: Column, token: str = REDACTED) -> Column:
    """Replace every match of every pattern with ``token``. Chained
    regexp_replace — order matters: emails first (their local parts
    can contain digit runs), then phones, cards, IPs."""
    out = text
    for kind in ("email", "phone", "card", "ipv4"):
        out = F.regexp_replace(out, PII_PATTERNS[kind], token)
    return out
