"""Empty-input robustness sweep: every major operator entry point must
handle ZERO-row inputs without crashing and return an empty (or
well-defined degenerate) result. At 100 TB empty slices are routine —
a fresh partition, a filter that matches nothing, a cold-start stream —
and an operator that throws on them takes down the whole job."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, text string")


@pytest.fixture(scope="module")
def empty_events(spark):
    return spark.createDataFrame(
        [], "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


@pytest.fixture(scope="module")
def empty_emb(spark):
    return spark.createDataFrame([], "vec_id long, embedding array<float>, label int")


def test_dedup_family_on_empty(spark, empty_docs):
    import lakehouse_file_format_compare_spark.operators.dedup as D

    assert D.exact_duplicates(empty_docs).count() == 0
    assert D.ngram_jaccard_pairs(empty_docs).count() == 0
    assert D.minhash_lsh_pairs(empty_docs).count() == 0
    assert D.simhash_near_pairs(empty_docs).count() == 0


def test_embedding_family_on_empty(spark, empty_emb):
    import lakehouse_file_format_compare_spark.operators.dedup as D
    import lakehouse_file_format_compare_spark.operators.similarity as S

    assert D.embedding_near_dup_pairs(empty_emb).count() == 0
    assert D.embedding_near_dup_lsh(empty_emb).count() == 0
    assert S.knn_bruteforce(empty_emb, empty_emb, k=3).count() == 0


def test_components_on_empty(spark):
    from lakehouse_file_format_compare_spark.operators.components import (
        connected_components,
    )

    pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    assert connected_components(pairs).count() == 0


def test_text_ops_on_empty(spark, empty_docs):
    from lakehouse_file_format_compare_spark.functions.repetition import (
        top_ngram_char_fraction,
    )
    from lakehouse_file_format_compare_spark.operators.decontaminate import (
        decontaminate,
        ngram_contamination,
    )
    from lakehouse_file_format_compare_spark.operators.packing import chunk_documents
    from lakehouse_file_format_compare_spark.operators.ranking import (
        bigram_lm_scores,
        bm25_scores,
        tfidf_scores,
    )

    assert top_ngram_char_fraction(empty_docs).count() == 0
    assert bm25_scores(empty_docs, ["x"]).count() == 0
    assert tfidf_scores(empty_docs, ["x"]).count() == 0
    assert bigram_lm_scores(empty_docs).count() == 0
    assert chunk_documents(empty_docs).count() == 0
    assert ngram_contamination(empty_docs, empty_docs).count() == 0
    assert decontaminate(empty_docs, empty_docs).count() == 0

    from lakehouse_file_format_compare_spark.operators.decontaminate import (
        decontaminate_fuzzy,
        jaccard_contamination,
        minhash_contamination,
    )

    assert jaccard_contamination(empty_docs, empty_docs).count() == 0
    assert minhash_contamination(empty_docs, empty_docs).count() == 0
    assert decontaminate_fuzzy(empty_docs, empty_docs).count() == 0


def test_fuzzy_on_empty(spark):
    from lakehouse_file_format_compare_spark.operators.fuzzy import (
        edit_distance_pairs,
        edit_distance_pairs_blocked,
        edit_distance_pairs_passjoin,
        edit_distance_pairs_structured,
    )

    e = spark.createDataFrame([], "id long, name string")
    for fn in (edit_distance_pairs, edit_distance_pairs_blocked,
               edit_distance_pairs_passjoin, edit_distance_pairs_structured):
        assert fn(e, e, "id", "name", "id", "name").count() == 0


def test_temporal_on_empty(spark, empty_events):
    from lakehouse_file_format_compare_spark.operators.temporal import (
        asof_join,
        session_stats,
        sessionize,
    )

    assert sessionize(empty_events).count() == 0
    assert session_stats(empty_events).count() == 0
    left = empty_events.select("event_id", "user_id", "ts")
    right = empty_events.select("user_id", "ts", F.col("event_id").alias("rid"))
    assert asof_join(left, right, key="user_id", left_ts="ts", right_ts="ts",
                     right_cols=["rid"]).count() == 0


def test_salted_sessionize_on_empty(spark, empty_events):
    from lakehouse_file_format_compare_spark.operators.temporal import (
        sessionize_salted,
    )

    assert sessionize_salted(empty_events).count() == 0


def test_pq_family_on_empty(spark, empty_emb):
    """PQ/IVF-PQ need a non-empty corpus to TRAIN (a codebook over
    zero vectors is undefined — training raises loudly), but serving
    with pre-trained literals over empty queries or an empty corpus
    must degrade to zero rows, not crash."""
    import pytest as _pytest

    import lakehouse_file_format_compare_spark.operators.similarity as S
    from lakehouse_file_format_compare_spark.sources.testdata import table

    from .conftest import SF_CORRECTNESS

    with _pytest.raises(Exception):
        S.train_pq_codebooks(
            spark.createDataFrame([], "vec_id long, embedding array<float>")
        )
    emb = table(spark, SF_CORRECTNESS, "embeddings")
    books = S.train_pq_codebooks(emb)
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    queries = emb.where(F.col("vec_id") % 100 == 0)
    assert S.knn_pq(empty, emb, codebooks=books, k=3).count() == 0
    assert S.knn_pq(queries, empty, codebooks=books, k=3).count() == 0


def test_sampling_packing_on_empty(spark, empty_docs):
    from lakehouse_file_format_compare_spark.operators.packing import pack_sequences
    from lakehouse_file_format_compare_spark.operators.sampling import (
        fraction_sample,
        hash_split,
    )

    docs = empty_docs.withColumn("n_tokens", F.lit(1))
    assert fraction_sample(empty_docs, 0.5, key_cols=("doc_id",)).count() == 0
    assert hash_split(empty_docs, {"train": 0.8, "val": 0.2},
                      key_cols=("doc_id",)).count() == 0
    assert pack_sequences(docs, budget=100).count() == 0


def test_stats_on_empty(spark, empty_docs):
    from lakehouse_file_format_compare_spark.functions.stats import (
        percentile_summary,
    )

    docs = empty_docs.withColumn("n_chars", F.lit(1).cast("long"))
    row = percentile_summary(docs, "n_chars", probs=(0.5,)).collect()
    # degenerate but well-defined: one row of NULLs or zero rows
    assert len(row) <= 1
    if row:
        assert row[0]["p50"] is None


def test_r7_span_and_line_ops_on_empty(spark, empty_docs, empty_events):
    from lakehouse_file_format_compare_spark.operators import dedup as D
    from lakehouse_file_format_compare_spark.operators.temporal import (
        sessionize_auto,
    )

    assert D.substring_duplicates(empty_docs, min_span_tokens=5).count() == 0
    assert D.self_duplicate_spans(empty_docs, min_span_tokens=5).count() == 0
    spans = D.substring_duplicates(empty_docs, min_span_tokens=5)
    assert D.remove_duplicate_spans(empty_docs, spans).count() == 0
    assert D.remove_boilerplate_lines(empty_docs).count() == 0
    # the dispatcher's max-per-key probe on zero rows returns NULL ->
    # unsalted branch, empty output
    assert sessionize_auto(empty_events).count() == 0


def test_substring_contamination_on_empty(spark, empty_docs):
    from lakehouse_file_format_compare_spark.operators.decontaminate import (
        substring_contamination,
    )
    from lakehouse_file_format_compare_spark.sources.testdata import table

    from .conftest import SF_CORRECTNESS

    docs = table(spark, SF_CORRECTNESS, "documents")
    assert substring_contamination(empty_docs, docs, min_span_tokens=5).count() == 0
    assert substring_contamination(docs, empty_docs, min_span_tokens=5).count() == 0


def test_r10_operators_on_empty(spark, empty_docs):
    """LM scoring, Zipf fit, triangle stats and PPJoin on empty
    inputs: structurally valid zero-row / zero-value outputs, no
    division errors (the degenerate-model guard)."""
    from pyspark.sql import functions as F

    from lakehouse_file_format_compare_spark.operators import dedup as D
    from lakehouse_file_format_compare_spark.operators.components import (
        triangle_stats,
    )
    from lakehouse_file_format_compare_spark.operators.lm import (
        bigram_lm_score,
        bigram_lm_train,
        perplexity_report,
    )
    from lakehouse_file_format_compare_spark.operators.vocab import zipf_fit

    # empty corpus: report is one row of zeros, no errors
    rep = perplexity_report(
        empty_docs.withColumn("lang", F.lit("en")),
        F.col("lang") == "en",
    ).collect()[0]
    assert rep.lm_scored_docs == 0 and rep.lm_vocab == 0
    # empty TRAIN slice over a nonempty corpus: degenerate model
    docs = spark.createDataFrame(
        [(0, "some text here", "xx")], "doc_id long, text string, lang string"
    )
    m, ct, v = bigram_lm_train(docs.where(F.col("lang") == "en"))
    sc = bigram_lm_score(docs, m, ct, v).collect()[0]
    assert sc.lp_nanos == 0 and sc.n_bigrams == 3

    zf = zipf_fit(empty_docs).collect()[0]
    assert (zf.zipf_terms, zf.zipf_num, zf.zipf_den,
            zf.zipf_slope_grid) == (0, 0, 0, 0)

    empty_pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    tr = triangle_stats(empty_pairs).collect()[0]
    assert (tr.tri_edges, tr.tri_triangles, tr.tri_wedges,
            tr.tri_gcc_grid) == (0, 0, 0, 0)

    assert D.ppjoin_jaccard_pairs(empty_docs).count() == 0


def test_r10_kmeans_and_hits_on_empty(spark):
    from lakehouse_file_format_compare_spark.operators.clustering import (
        kmeans_report,
    )
    from lakehouse_file_format_compare_spark.operators.pagerank import hits

    import pytest

    empty_emb = spark.createDataFrame(
        [], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError):
        kmeans_report(empty_emb, k=2, iters=1).collect()
    empty_edges = spark.createDataFrame([], "src long, dst long")
    assert hits(empty_edges).count() == 0


def test_r10_late_surfaces_on_empty(spark, empty_docs):
    from lakehouse_file_format_compare_spark.operators.components import kcore
    from lakehouse_file_format_compare_spark.operators.ranking import hybrid_rrf
    from lakehouse_file_format_compare_spark.plans.similarity_plans import (
        _embedding_moments,
    )
    from lakehouse_file_format_compare_spark.plans.text_plans import (
        _distinct_n_scalars,
    )

    empty_pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    assert kcore(empty_pairs).count() == 0

    empty_lex = spark.createDataFrame([], "doc_id long, bm25 double")
    empty_sem = spark.createDataFrame([], "doc_id long, cosine double")
    assert hybrid_rrf(empty_lex, empty_sem).count() == 0
    # one-sided fusion still ranks the populated list
    lex = spark.createDataFrame([(1, 2.0), (2, 1.0)], "doc_id long, bm25 double")
    rows = hybrid_rrf(lex, empty_sem, rrf_k=60).collect()
    assert [r.doc_id for r in rows] == [1, 2]
    assert all(r.sem_rank == 0 for r in rows)

    dn = _distinct_n_scalars(empty_docs).collect()[0]
    assert all(v == 0 for v in dn.asDict().values())

    empty_emb = spark.createDataFrame([], "vec_id long, embedding array<float>")
    em = _embedding_moments(empty_emb).collect()[0]
    assert all(v == 0 for v in em.asDict().values())

    from lakehouse_file_format_compare_spark.operators.dedup import (
        ngram_containment_pairs,
    )
    from lakehouse_file_format_compare_spark.operators.vocab import (
        unigram_apply,
        unigram_piece_stats,
        wordpiece_apply,
    )

    vocab = {"th": 10**9, "a": 2 * 10**9}
    assert unigram_apply(empty_docs, vocab).count() == 0
    assert wordpiece_apply(empty_docs, vocab).count() == 0
    assert unigram_piece_stats(empty_docs).count() == 0
    assert ngram_containment_pairs(empty_docs).count() == 0
    # blank-text docs contribute no words: same empty outputs
    blank = spark.createDataFrame([(1, "  ")], "doc_id long, text string")
    assert unigram_apply(blank, vocab).count() == 0
    assert wordpiece_apply(blank, vocab).count() == 0


def test_r11_operators_on_empty(spark, empty_docs, empty_emb):
    """r11 surfaces: lifecycle-managed folds, weighted sampling,
    stupid backoff, split_assign — all fine on zero rows."""
    from lakehouse_file_format_compare_spark.operators.lifecycle import (
        incremental_embedding_dedup_managed,
        incremental_minhash_dedup_managed,
        store_lifecycle_report,
    )
    from lakehouse_file_format_compare_spark.operators.lm import (
        stupid_backoff_report,
        stupid_backoff_score,
        stupid_backoff_train,
    )
    from lakehouse_file_format_compare_spark.operators.sampling import (
        split_assign,
        weighted_sample_topk,
    )

    kept, store = incremental_minhash_dedup_managed(
        empty_docs, None, batch_id=1, horizon=2
    )
    assert kept.count() == 0 and store.count() == 0
    rep = store_lifecycle_report(store).collect()[0]
    assert (rep.store_rows, rep.kept_rows, rep.tombstone_rows) == (0, 0, 0)
    assert rep.oldest_batch == -1

    emb = empty_emb.select("vec_id", F.col("embedding").alias("embedding"))
    kept_e, store_e = incremental_embedding_dedup_managed(
        emb, None, batch_id=1, horizon=1, dim=64
    )
    assert kept_e.count() == 0 and store_e.count() == 0

    parts = stupid_backoff_train(empty_docs)
    assert stupid_backoff_score(empty_docs, *parts).count() == 0
    r = stupid_backoff_report(
        empty_docs.withColumn("lang", F.lit("en")), F.col("lang") == "en"
    ).collect()[0]
    assert r.sb_tokens == 0 and r.sb_flagged_docs == 0

    assert weighted_sample_topk(
        empty_docs.withColumn("w", F.lit(1.0)), "w", 5, ("doc_id",)
    ).count() == 0
    assigned = split_assign(
        empty_docs.withColumn("canonical_id", F.col("doc_id")),
        {"train": 0.8, "val": 0.2},
        portable=True,
    )
    assert assigned.count() == 0 and "split" in assigned.columns
