"""Corpus datasheet (ext/datasheet.py, r10): the one-call exact
summary — values pinned against independently computed statistics on
the smoke corpus, layout invariance, and structural contracts."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from lakehouse_file_format_compare_spark.ext.datasheet import corpus_datasheet
from lakehouse_file_format_compare_spark.sources.testdata import table

from .conftest import SF_SMOKE


def _sheet(df):
    return {
        (r.section, r.metric): r.value for r in df.collect()
    }


def test_datasheet_values_match_independent_computation(spark):
    docs = table(spark, SF_SMOKE, "documents")
    got = _sheet(corpus_datasheet(docs))

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_SMOKE}/documents.parquet')"
    )
    vol = con.execute("""
        SELECT COUNT(*),
               SUM(CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE len(string_split_regex(trim(text), '\\s+')) END),
               SUM(length(text))
        FROM documents""").fetchone()
    assert got[("volume", "docs")] == vol[0]
    assert got[("volume", "tokens")] == vol[1]
    assert got[("volume", "chars")] == vol[2]

    dw = con.execute("""
        SELECT COUNT(DISTINCT word) FROM (
            SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS word
            FROM documents) WHERE length(word) > 0""").fetchone()[0]
    assert got[("vocabulary", "distinct_words")] == dw

    langs = dict(con.execute(
        "SELECT lang, COUNT(*) FROM documents GROUP BY lang"
    ).fetchall())
    for lang, n in langs.items():
        assert got[("lang_mix", lang)] == n

    dups = con.execute("""
        SELECT COUNT(*) FILTER (WHERE n > 1), COALESCE(SUM(n) FILTER (WHERE n > 1), 0)
        FROM (SELECT md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) f,
                     COUNT(*) n FROM documents GROUP BY 1)""").fetchone()
    assert got[("duplication", "dup_groups")] == dups[0]
    assert got[("duplication", "dup_docs")] == dups[1]

    # quality section carries the driver-oracled lm_* values verbatim
    from lakehouse_file_format_compare_spark.operators.lm import (
        perplexity_report,
    )

    lm = perplexity_report(docs, F.col("lang") == "en").collect()[0]
    for k, v in lm.asDict().items():
        assert got[("quality", k)] == v

    # diversity: distinct-n counts replayed independently
    dn = con.execute("""
        WITH t AS (
            SELECT list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                               x -> length(x) > 0) AS t
            FROM documents)
        SELECT (SELECT COUNT(DISTINCT g) FROM (SELECT unnest(t) AS g FROM t)),
               (SELECT COALESCE(SUM(len(t)), 0) FROM t),
               (SELECT COUNT(DISTINCT g) FROM (
                    SELECT unnest(CASE WHEN len(t) >= 3 THEN
                        list_transform(range(1, len(t) - 1),
                                       i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                        ELSE [] END) AS g FROM t))
        """).fetchone()
    assert got[("diversity", "dn1_distinct")] == dn[0]
    assert got[("diversity", "dn1_total")] == dn[1]
    assert got[("diversity", "dn3_distinct")] == dn[2]
    assert got[("diversity", "dn1_nanos")] == dn[0] * 10**9 // dn[1]


def test_datasheet_geometry_section(spark):
    from lakehouse_file_format_compare_spark.plans.similarity_plans import (
        _embedding_moments,
    )

    docs = table(spark, SF_SMOKE, "documents")
    emb = table(spark, SF_SMOKE, "embeddings")
    got = _sheet(corpus_datasheet(docs, embeddings=emb))
    want = _embedding_moments(emb).collect()[0].asDict()
    for k, v in want.items():
        assert got[("geometry", k)] == v
    assert got[("geometry", "emb_n")] > 0


def test_datasheet_layout_invariance(spark):
    docs = table(spark, SF_SMOKE, "documents")
    a = _sheet(corpus_datasheet(docs.repartition(1)))
    b = _sheet(corpus_datasheet(docs.repartition(7, "lang")))
    assert a == b


def test_datasheet_schema_and_sections(spark):
    docs = table(spark, SF_SMOKE, "documents")
    df = corpus_datasheet(docs)
    assert [f.name for f in df.schema.fields] == ["section", "metric", "value"]
    assert {r.section for r in df.collect()} == {
        "volume", "vocabulary", "lang_mix", "quality", "duplication",
        "diversity", "richness", "evaluation",
    }


def test_datasheet_richness_and_evaluation_sections(spark):
    """The late-r10 sections agree with their operators run directly."""
    from pyspark.sql import functions as F

    from lakehouse_file_format_compare_spark.operators.evaluation import (
        auc_report,
    )
    from lakehouse_file_format_compare_spark.operators.lm import (
        bigram_lm_score,
        bigram_lm_train,
    )
    from lakehouse_file_format_compare_spark.operators.vocab import (
        richness_report,
    )

    docs = table(spark, SF_SMOKE, "documents")
    sheet = {
        (r.section, r.metric): r.value
        for r in corpus_datasheet(docs).collect()
        if r.section in ("richness", "evaluation")
    }
    rich = richness_report(docs).collect()[0]
    assert sheet[("richness", "rich_vocab")] == rich.rich_vocab
    assert sheet[("richness", "rich_chao1_nanos")] == rich.rich_chao1_nanos
    assert sheet[("richness", "rich_gini_nanos")] == rich.rich_gini_nanos
    model, ctx, voc = bigram_lm_train(docs.where(F.col("lang") == "en"))
    ranked = (
        bigram_lm_score(docs, model, ctx, voc, keep_cols=("lang",))
        .where(F.col("n_bigrams") > 0)
        .select(
            F.expr("-(((-lp_nanos) * 1000) DIV n_bigrams)").alias("score"),
            (F.col("lang") == "en").cast("int").alias("label"),
        )
    )
    want = auc_report(ranked).collect()[0]
    assert sheet[("evaluation", "auc_nanos")] == want.auc_nanos
    assert sheet[("evaluation", "n_pos")] == want.n_pos
    assert sheet[("evaluation", "auc_nanos")] > 500_000_000
