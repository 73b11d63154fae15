"""Text-analysis column functions for large-scale corpus pipelines.

All of these are compositions of JVM-side built-ins (split / regexp /
hash / transform) — no Python UDFs in the hot path, so they run inside
whole-stage codegen and scale linearly with executors. They power the
``text_*`` and ``dedup_*`` queries in plans/.

The reference has no text surface (SURVEY §2.8: "String: none in
engine code"); this is the training-data-pipeline extension mandated
by BASELINE.json's north star.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = r"\s+"
PUNCT_RE = r"[\.,;:!\?'\"\(\)\[\]\{\}-]"

# Marker words per language for the n-gram/stopword language-ID
# heuristic. Deliberately small and auditable; scoring is a pure
# column expression so the DuckDB oracle can replicate it exactly.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "los"],
    "fr": ["le", "la", "et", "les", "des"],
    "de": ["der", "die", "und", "das", "ist"],
    "pt": ["o", "a", "de", "que", "em"],
}

STOPWORDS = sorted({w for ws in LANG_MARKERS.values() for w in ws})


def tokens(text: Column) -> Column:
    """Whitespace tokenization; empty/blank text → empty array."""
    trimmed = F.trim(text)
    return F.when(F.length(trimmed) == 0, F.array().cast("array<string>")).otherwise(
        F.split(trimmed, TOKEN_SPLIT_RE)
    )


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish token estimate: count word pieces + digits + punctuation
    as separate tokens (regex segmentation, the standard cheap proxy
    for LLM token budgeting when no tokenizer is shipped)."""
    return F.size(
        F.regexp_extract_all(text, F.lit(r"([A-Za-z]+|[0-9]|[^A-Za-z0-9\s])"), F.lit(0))
    )


def punct_ratio(text: Column) -> Column:
    n = F.length(text)
    return F.when(n == 0, F.lit(0.0)).otherwise(
        F.regexp_count(text, F.lit(PUNCT_RE)) / n.cast("double")
    )


def stopword_ratio(text: Column) -> Column:
    toks = token_count(text)
    pattern = r"(?i)\b(" + "|".join(STOPWORDS) + r")\b"
    return F.when(toks == 0, F.lit(0.0)).otherwise(
        F.regexp_count(text, F.lit(pattern)) / toks.cast("double")
    )


def mean_word_len(text: Column) -> Column:
    toks = token_count(text)
    alpha_chars = F.length(F.regexp_replace(text, r"\s+", ""))
    return F.when(toks == 0, F.lit(0.0)).otherwise(alpha_chars / toks.cast("double"))


def quality_score(text: Column) -> Column:
    """Composite document-quality score in [0,1]: rewards mid-length
    documents and prose-like punctuation/stopword rates. Heuristic of
    the Gopher/C4-style quality-filter family, expressed as one
    codegen-friendly column expression."""
    toks = token_count(text).cast("double")
    length_score = F.least(toks / F.lit(50.0), F.lit(1.0))
    punct_penalty = F.least(punct_ratio(text) * 5.0, F.lit(1.0))
    stop_score = F.least(stopword_ratio(text) * 4.0, F.lit(1.0))
    word_len = mean_word_len(text)
    word_len_ok = F.when((word_len >= 3.0) & (word_len <= 10.0), F.lit(1.0)).otherwise(F.lit(0.5))
    return F.round(
        (0.4 * length_score + 0.2 * (1.0 - punct_penalty) + 0.2 * stop_score + 0.2 * word_len_ok),
        4,
    )


def lang_scores(text: Column) -> dict[str, Column]:
    """Marker-hit count per language (case-insensitive whole words)."""
    out = {}
    for lang, markers in LANG_MARKERS.items():
        pattern = r"(?i)\b(" + "|".join(markers) + r")\b"
        out[lang] = F.regexp_count(text, F.lit(pattern))
    return out


def lang_id(text: Column) -> Column:
    """Pick the language with the highest marker count; ties resolve in
    LANG_MARKERS declaration order; zero hits → 'und' (undetermined)."""
    scores = lang_scores(text)
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    for lang in reversed(list(LANG_MARKERS)):
        expr = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of whitespace-normalized, lowercased
    text — the exact-dedup key. (xxhash64 is cheaper at scale but md5
    is oracle-replicable; both are exposed.)"""
    return F.md5(normalized(text))


def fingerprint64(text: Column) -> Column:
    return F.xxhash64(normalized(text))


def rolling_fingerprint(text: Column, base: int = 1_000_003) -> Column:
    """Rabin-Karp-style polynomial rolling hash over the token stream,
    modulo the Mersenne prime 2^31-1 (keeps every intermediate under
    2^51 — no 64-bit overflow, which ANSI mode would reject):
    order-sensitive where the set-based fingerprints aren't — 'a b'
    and 'b a' differ. One fold, JVM-side."""
    m = F.lit(2147483647).cast("long")
    return F.aggregate(
        tokens(normalized(text)),
        F.lit(0).cast("long"),
        lambda acc, tok: F.pmod(acc * base + F.pmod(F.xxhash64(tok), m), m),
    )


def normalized(text: Column) -> Column:
    return F.lower(F.regexp_replace(F.trim(text), r"\s+", " "))


def shingles_from_tokens(toks: Column, k: int = 3) -> Column:
    """Distinct k-word shingles from a MATERIALIZED token-array column.

    PERFORMANCE: ``toks`` must be a resolved column reference (project
    the token array first), not a nested expression — Catalyst does
    not common-subexpression-eliminate inside higher-order-function
    lambdas, so a nested tokenize would be re-evaluated for every
    element access (measured 60x slowdown on the shingle explode).
    """
    n = F.size(toks)
    joined = F.when(n >= k, F.transform(
        F.sequence(F.lit(0), n - k),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j + 1) for j in range(k)]),
    )).otherwise(F.when(n > 0, F.array(F.concat_ws(" ", toks))).otherwise(F.array().cast("array<string>")))
    return F.array_distinct(joined)


def word_shingles(text: Column, k: int = 3) -> Column:
    """Distinct k-word shingles of the normalized text (MinHash /
    Jaccard input). Prefer projecting ``tokens(normalized(text))``
    into a column and calling :func:`shingles_from_tokens` in hot
    paths (see that docstring)."""
    return shingles_from_tokens(tokens(normalized(text)), k)


# Mojibake / encoding-noise markers, all RE2-safe (no lookaround):
# - U+FFFD replacement characters (decode failures)
# - C1 control block (U+0080-U+009F: bytes that survive a bad
#   Latin-1 round trip)
# - the classic UTF-8-read-as-Latin-1/cp1252 digraphs ("\u00c3\u00a9",
#   "\u00e2\u20ac\u2122", ...): lead chars \u00c3/\u00c2/\u00e2 followed by
#   their continuation symbols
ENCODING_NOISE_RE = (
    "\uFFFD"
    "|[\u0080-\u009F]"
    "|\u00c3[\u0080-\u00bf]"
    "|\u00c2[\u00a0-\u00bf]"
    "|\u00e2\u20ac[\u0098\u0099\u009c\u009d\u2018\u2019\u201c\u201d\u00a2\u00a6\u2122]"
)


def encoding_noise_count(text: Column) -> Column:
    """Number of mojibake markers in the text (see ENCODING_NOISE_RE)."""
    return F.regexp_count(text, F.lit(ENCODING_NOISE_RE))


def encoding_noise_score(text: Column) -> Column:
    """Mojibake markers per character in [0,1] — the encoding-health
    quality signal (corrupted scrapes score high and get filtered).
    Empty/NULL-free text scores 0."""
    n = F.length(text)
    return F.when(
        n > 0, F.least(encoding_noise_count(text).cast("double") / n, F.lit(1.0))
    ).otherwise(F.lit(0.0))


# --- cleaning transforms (r10 continuation) -------------------------
# Web-crawl hygiene: strip markup, entities and control characters,
# then normalize whitespace. Patterns are deliberately dialect-neutral
# (character classes only — no lookaround) so the SAME strings run on
# Spark's Java regex and DuckDB's RE2, making every transform
# oracle-replayable (tests/test_text_clean.py).

HTML_TAG_RE = r"<[^>]*>"
HTML_ENTITY_RE = r"&[a-zA-Z]{2,8};|&#[0-9]{1,6};"
CONTROL_CHAR_RE = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"


def strip_html(text: Column) -> Column:
    """Replace tags and entities with spaces (a space, not empty, so
    ``a<br>b`` stays two tokens)."""
    return F.regexp_replace(
        F.regexp_replace(text, HTML_TAG_RE, " "), HTML_ENTITY_RE, " "
    )


def strip_control_chars(text: Column) -> Column:
    """Drop C0/C1-ish control characters (keeps tab/newline/CR — those
    are whitespace, handled by collapse)."""
    return F.regexp_replace(text, CONTROL_CHAR_RE, "")


def collapse_whitespace(text: Column) -> Column:
    return F.trim(F.regexp_replace(text, r"\s+", " "))


def clean_text(text: Column) -> Column:
    """The composed crawl-cleaning pass: strip markup -> strip control
    chars -> collapse whitespace. Pure column expressions — runs
    inside whole-stage codegen, no Python."""
    return collapse_whitespace(strip_control_chars(strip_html(text)))
