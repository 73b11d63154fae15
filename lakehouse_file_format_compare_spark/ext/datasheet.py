"""Corpus datasheet — the one-call executive summary a training-data
pipeline publishes next to a dataset release ("Datasheets for
Datasets", Gebru et al. 2021): volume, vocabulary health, language
mix, LM-quality flags and duplication, as ONE tall exact frame

    (section, metric, value)        -- value always a LONG

composed purely from the repo's existing one-scan operators
(functions/text, operators/vocab, operators/lm, operators/dedup).
Every value is an exact integer (counts, or the operators' grid /
nano fixed-point LONGs), so the datasheet is layout-proof and
reproducible bit-for-bit — a datasheet whose numbers move between
runs is worse than none.

Scale shape: each section is one aggregation pipeline over the
corpus (no collect except the final consumer's); sections reuse the
operators' own scale disciplines (single explode for token stats,
Heaps-bounded LM model, hash-grouped exact dedup). The final union
of 1-row / language-count section frames is negligible.

The reference has no reporting surface; extension surface per the
training-data-pipeline brief. Each constituent statistic is
driver-oracled through its own registry row (text_token_stats,
text_quality lm_*, text_token_stats zipf_*, dedup_exact); the
datasheet itself is the composition, pinned by
tests/test_datasheet.py against independently computed values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tall(df: DataFrame, section: str) -> DataFrame:
    """Unpivot a 1-row frame of LONG columns into (section, metric,
    value) via a JVM stack — no per-column scans."""
    cols = df.columns
    stack = ", ".join(f"'{c}', `{c}`" for c in cols)
    return df.select(
        F.lit(section).alias("section"),
        F.expr(f"stack({len(cols)}, {stack}) AS (metric, value)"),
    ).select("section", "metric", F.col("value").cast("long").alias("value"))


def corpus_datasheet(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    train_lang: str = "en",
    embeddings: DataFrame | None = None,
) -> DataFrame:
    """(section, metric, value) exact-LONG datasheet with sections:

    - ``volume``: docs, tokens, chars;
    - ``vocabulary``: distinct words, zipf_slope_grid (1e-6 grid),
      zipf_terms;
    - ``lang_mix``: one row per language value (metric = the lang);
    - ``quality``: the lm_* CCNet-filter scalars (train slice =
      ``lang_col == train_lang``);
    - ``duplication``: exact duplicate groups / docs carrying a
      duplicate (normalized-text fingerprint grouping — the
      dedup_exact tier);
    - ``diversity``: the corpus distinct-n scalars (Li et al. 2016;
      plans/text_plans._distinct_n_scalars — counts and truncating
      LONG-division nano ratios);
    - ``richness`` (late r10): Chao1 unseen-vocabulary lower bound,
      singleton/doubleton counts and word-frequency Gini
      (operators/vocab.py::richness_report);
    - ``evaluation`` (late r10): the exact ROC-AUC and KS of the LM
      filter's train-slice-vs-other ranking
      (operators/evaluation.py) — how separable the reference slice
      actually is;
    - ``geometry`` (only when ``embeddings`` is passed): the
      embedding-health moments (anisotropy numerators —
      plans/similarity_plans._embedding_moments).
    """
    from ..functions import text as T
    from ..operators.lm import perplexity_report
    from ..operators.vocab import _words, zipf_fit

    volume = docs.agg(
        F.count(F.lit(1)).cast("long").alias("docs"),
        F.coalesce(F.sum(T.token_count(F.col(text_col))), F.lit(0))
        .cast("long").alias("tokens"),
        F.coalesce(F.sum(F.length(text_col)), F.lit(0)).cast("long").alias(
            "chars"
        ),
    )

    vocab = (
        _words(docs, text_col)
        .agg(F.count_distinct("word").cast("long").alias("distinct_words"))
        .crossJoin(
            F.broadcast(
                zipf_fit(docs, text_col).select(
                    "zipf_terms", "zipf_slope_grid"
                )
            )
        )
    )

    lang_mix = (
        docs.groupBy(F.col(lang_col).alias("metric"))
        .agg(F.count(F.lit(1)).cast("long").alias("value"))
        .select(
            F.lit("lang_mix").alias("section"),
            F.coalesce(F.col("metric"), F.lit("<null>")).alias("metric"),
            "value",
        )
    )

    quality = perplexity_report(
        docs,
        F.col(lang_col) == train_lang,
        text_col=text_col,
        id_col=id_col,
        group_col=lang_col,
        train_group_value=train_lang,
    )

    fp = T.fingerprint(F.col(text_col))
    groups = docs.select(fp.alias("__fp")).groupBy("__fp").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    duplication = groups.agg(
        F.coalesce(
            F.sum(F.when(F.col("n") > 1, F.lit(1)).otherwise(F.lit(0))),
            F.lit(0),
        ).cast("long").alias("dup_groups"),
        F.coalesce(
            F.sum(F.when(F.col("n") > 1, F.col("n")).otherwise(F.lit(0))),
            F.lit(0),
        ).cast("long").alias("dup_docs"),
    )

    # runtime imports: plans -> ext imports exist (ext_plans), so the
    # reverse edge stays out of module scope
    from ..plans.text_plans import _distinct_n_scalars

    from ..operators.evaluation import auc_report, ks_report
    from ..operators.lm import bigram_lm_score, bigram_lm_train
    from ..operators.vocab import richness_report

    model, ctx_totals, vocab_frame = bigram_lm_train(
        docs.where(F.col(lang_col) == train_lang), text_col
    )
    scored = bigram_lm_score(
        docs, model, ctx_totals, vocab_frame, text_col, id_col,
        keep_cols=(lang_col,),
    ).localCheckpoint(eager=False)
    ranked = scored.where(F.col("n_bigrams") > 0).select(
        F.expr("-(((-lp_nanos) * 1000) DIV n_bigrams)").alias("score"),
        (F.col(lang_col) == train_lang).cast("int").alias("label"),
    )
    evaluation = (
        auc_report(ranked)
        .select("auc_nanos", "n_pos", "n_neg")
        .crossJoin(F.broadcast(ks_report(ranked).select("ks_nanos")))
    )

    out = (
        _tall(volume, "volume")
        .unionByName(_tall(vocab, "vocabulary"))
        .unionByName(lang_mix)
        .unionByName(_tall(quality, "quality"))
        .unionByName(_tall(duplication, "duplication"))
        .unionByName(
            _tall(
                _distinct_n_scalars(docs.select(F.col(text_col).alias("text"))),
                "diversity",
            )
        )
        .unionByName(_tall(richness_report(docs, text_col), "richness"))
        .unionByName(_tall(evaluation, "evaluation"))
    )
    if embeddings is not None:
        from ..plans.similarity_plans import _embedding_moments

        out = out.unionByName(
            _tall(_embedding_moments(embeddings), "geometry")
        )
    return out
