"""PII detection/redaction (functions/pii.py): DuckDB value oracle on
an injected fixture — counts per kind, density score, and the fully
redacted text must match byte-for-byte across engines, and the
fixture guarantees non-zero matches for every pattern."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from lakehouse_file_format_compare_spark.functions import pii
from lakehouse_file_format_compare_spark.sources.testdata import table

from .conftest import SF_CORRECTNESS

DOCS = [
    (1, "contact me at alice.smith+work@example.co.uk or bob@test.org today"),
    (2, "call +1 415-555-0133 or (212) 555-7788 before noon"),
    (3, "card 4111111111111111 expires soon; short 12345 is not a card"),
    (4, "server at 192.168.0.1 and 10.0.255.254 responded"),
    (5, "clean text with no personal data at all, just words"),
    (6, "mixed: eve@corp.io, +44 20 7946 0958, 5500005555555559, 8.8.8.8"),
    (7, ""),
    (8, "email-ish a@b.c and version 1.2.3.4 of the lib"),
    # dotted IPv4 with 3-digit tail octets ALSO matches PHONE_RE —
    # must count once, as ipv4 (r4 ADVICE overlap fix)
    (9, "gateway 192.168.100.200 up, peer 10.20.300.400 down"),
]


@pytest.fixture(scope="module")
def pii_fixture(spark, tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = str(tmp_path_factory.mktemp("pii") / "docs.parquet")
    pq.write_table(
        pa.table({
            "doc_id": pa.array([d[0] for d in DOCS], type=pa.int64()),
            "text": pa.array([d[1] for d in DOCS], type=pa.string()),
        }),
        path,
    )
    return path


def _spark_out(spark, path):
    df = spark.read.parquet(path)
    counts = pii.pii_counts(F.col("text"))
    return df.select(
        "doc_id",
        *[c.alias(f"n_{k}") for k, c in counts.items()],
        pii.pii_score(F.col("text")).alias("pii_per_kchar"),
        pii.redact_pii(F.col("text")).alias("redacted"),
    )


def _duck_sql(path):
    def esc(p):
        return p.replace("'", "''")

    def subject(kind):
        # mirror pii_counts' overlap rule: phones counted on
        # IPv4-blanked text so dotted IPs count once (as ipv4)
        if kind == "phone":
            return f"regexp_replace(text, '{esc(pii.IPV4_RE)}', ';', 'g')"
        return "text"

    n_cols = ", ".join(
        f"len(regexp_extract_all({subject(k)}, '{esc(p)}')) AS n_{k}"
        for k, p in pii.PII_PATTERNS.items()
    )
    total = " + ".join(
        f"len(regexp_extract_all({subject(k)}, '{esc(p)}'))"
        for k, p in pii.PII_PATTERNS.items()
    )
    redact = "text"
    for kind in ("email", "phone", "card", "ipv4"):
        redact = f"regexp_replace({redact}, '{esc(pii.PII_PATTERNS[kind])}', '[PII]', 'g')"
    return f"""
SELECT doc_id, {n_cols},
       ROUND(({total}) * 1000.0 / GREATEST(length(text), 1), 6) AS pii_per_kchar,
       {redact} AS redacted
FROM read_parquet('{path}')
"""


def test_pii_counts_and_redaction_oracle(spark, pii_fixture):
    got = sorted(map(tuple, _spark_out(spark, pii_fixture).collect()))
    con = duckdb.connect()
    want = sorted(map(tuple, con.execute(_duck_sql(pii_fixture)).fetchall()))
    con.close()
    assert got == want


def test_pii_fixture_is_non_vacuous(spark, pii_fixture):
    """Every pattern must fire at least once, redaction must change
    text, and clean docs must pass through untouched."""
    rows = {r["doc_id"]: r for r in _spark_out(spark, pii_fixture).collect()}
    assert rows[1]["n_email"] == 2
    assert rows[2]["n_phone"] == 2
    assert rows[3]["n_card"] == 1  # 12345 is not card-like
    assert rows[4]["n_ipv4"] == 2
    assert rows[6]["n_email"] == rows[6]["n_card"] == rows[6]["n_ipv4"] == 1
    for k in ("email", "phone", "card", "ipv4"):
        assert rows[6]["redacted"].count("[PII]") >= 4
    assert rows[5]["redacted"] == DOCS[4][1]          # clean text untouched
    assert rows[5]["pii_per_kchar"] == 0.0
    assert rows[7]["redacted"] == ""                  # empty-safe
    assert "alice" not in rows[1]["redacted"]
    assert "4111111111111111" not in rows[3]["redacted"]
    # overlap rule: phone-shaped dotted IPs count once, as ipv4
    assert rows[9]["n_ipv4"] == 2 and rows[9]["n_phone"] == 0
    assert "192.168.100.200" not in rows[9]["redacted"]


def test_pii_scales_over_documents_table(spark):
    """Smoke over real testdata: the expressions run codegen-side on
    the documents table without error and scores are finite/ordered."""
    docs = table(spark, SF_CORRECTNESS, "documents")
    out = docs.select(pii.pii_score(F.col("text")).alias("s")).agg(
        F.min("s").alias("mn"), F.max("s").alias("mx")
    ).collect()[0]
    assert out["mn"] >= 0.0 and out["mx"] >= out["mn"]


def test_corpus_gate_with_pii_ceiling(spark, pii_fixture):
    """quality_gate with max_pii_per_kchar drops PII-dense docs and
    keeps clean ones (config off by default)."""
    from lakehouse_file_format_compare_spark.ext.corpus import CorpusConfig, quality_gate

    docs = spark.read.parquet(pii_fixture)
    # loosen the other gates so only the PII ceiling discriminates
    base = CorpusConfig(min_chars=1, max_chars=10**6, min_quality=0.0)
    off = quality_gate(docs, base)
    assert off.count() == docs.where("length(text) >= 1").count()
    gated = quality_gate(
        docs, CorpusConfig(min_chars=1, max_chars=10**6, min_quality=0.0,
                           max_pii_per_kchar=0.0)
    )
    kept = {r["doc_id"] for r in gated.select("doc_id").collect()}
    assert 5 in kept and 1 not in kept and 6 not in kept
