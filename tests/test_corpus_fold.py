"""Incremental corpus-pipeline fold (operators/corpus_fold.py): the
fold must be BATCHING-INVARIANT — folding the corpus in id-ordered
batches produces the same survivors, splits, packs and datasheet as
folding it in one batch — and planted cross-batch duplicates must
drop against the store."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouse_file_format_compare_spark.operators.corpus_fold import (
    CorpusFoldState,
    corpus_fold_batch,
    fold_datasheet,
    fold_packs,
    fold_splits,
)
from lakehouse_file_format_compare_spark.sources.testdata import table
from tests.conftest import SF_SMOKE

CUTS = [(0, 170), (170, 340), (340, 500)]
WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}
PLANT_MOD = 5


@pytest.fixture(scope="module")
def corpus(spark):
    """sf0.001 documents with planted cross-batch duplicates: every
    doc with doc_id >= 340 and doc_id % 5 == 1 carries the text of
    doc_id - 340 (a batch-1 donor)."""
    docs = table(spark, SF_SMOKE, "documents").select("doc_id", "lang", "text")
    donors = docs.select(
        (F.col("doc_id") + 340).alias("doc_id"), F.col("text").alias("__d")
    )
    return (
        docs.join(donors, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            F.when(
                (F.col("doc_id") >= 340)
                & (F.pmod("doc_id", F.lit(PLANT_MOD)) == 1)
                & F.col("__d").isNotNull(),
                F.col("__d"),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
        .cache()
    )


@pytest.fixture(scope="module")
def frozen(spark, corpus):
    """Frozen LM + eval fixture, shared by both batchings (the CCNet
    deployment shape: one reference model, one benchmark set)."""
    from lakehouse_file_format_compare_spark.operators.lm import bigram_lm_train

    model = tuple(
        f.localCheckpoint(eager=False)
        for f in bigram_lm_train(corpus.where(F.col("lang") == "en"))
    )
    eval_docs = (
        corpus.orderBy("doc_id").limit(20).select("doc_id", "text")
        .localCheckpoint(eager=False)
    )
    return model, eval_docs


def _ckpt(state: CorpusFoldState) -> CorpusFoldState:
    """EAGER checkpoint between folds: the per-batch commit a real
    deployment does by writing the stores to tables (lazy checkpoints
    would hand Catalyst the full multi-fold tree at once)."""
    return CorpusFoldState(
        **{
            k: (v.localCheckpoint(eager=True) if v is not None else None)
            for k, v in vars(state).items()
            if k != "delta"  # per-batch scratch, not carried forward
        }
    )


@pytest.fixture(scope="module")
def folded(spark, corpus, frozen):
    model, eval_docs = frozen
    state, kept_ids = None, []
    for lo, hi in CUTS:
        batch = corpus.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        kept, state = corpus_fold_batch(
            batch, state, lm_model=model, eval_docs=eval_docs
        )
        state = _ckpt(state)
        kept_ids += [r.doc_id for r in kept.select("doc_id").collect()]
    return state, sorted(kept_ids)


@pytest.fixture(scope="module")
def oneshot(spark, corpus, frozen):
    model, eval_docs = frozen
    kept, state = corpus_fold_batch(
        corpus, None, lm_model=model, eval_docs=eval_docs
    )
    state = _ckpt(state)
    return state, sorted(r.doc_id for r in kept.select("doc_id").collect())


def test_fold_is_batching_invariant_on_survivors(folded, oneshot):
    (_, got), (_, want) = folded, oneshot
    assert got == want and len(got) > 100


def test_planted_cross_batch_duplicates_drop(spark, corpus, folded):
    _, kept = folded
    kept = set(kept)
    planted = {
        r.doc_id
        for r in corpus.where(
            (F.col("doc_id") >= 340) & (F.pmod("doc_id", F.lit(PLANT_MOD)) == 1)
        ).select("doc_id").collect()
    }
    # every planted dup whose donor survived must be dropped
    donors_kept = {p for p in planted if (p - 340) in kept}
    assert donors_kept and not (donors_kept & kept)


def test_fold_splits_match_oneshot(folded, oneshot):
    s_fold, _ = folded
    s_one, _ = oneshot
    got = sorted(
        (r.doc_id, r.canonical_id, r.split)
        for r in fold_splits(s_fold, WEIGHTS).collect()
    )
    want = sorted(
        (r.doc_id, r.canonical_id, r.split)
        for r in fold_splits(s_one, WEIGHTS).collect()
    )
    assert got == want and len(got) > 100
    assert len({s for _, _, s in got}) == 3


def test_fold_packs_and_datasheet_match_oneshot(folded, oneshot):
    s_fold, _ = folded
    s_one, _ = oneshot
    got = sorted(
        (r.doc_id, r.split, r.n_tokens, r.pack_id)
        for r in fold_packs(s_fold, WEIGHTS, budget=256, groups=2).collect()
    )
    want = sorted(
        (r.doc_id, r.split, r.n_tokens, r.pack_id)
        for r in fold_packs(s_one, WEIGHTS, budget=256, groups=2).collect()
    )
    assert got == want and len(got) > 100
    ds_got = sorted(tuple(r) for r in fold_datasheet(s_fold).collect())
    ds_want = sorted(tuple(r) for r in fold_datasheet(s_one).collect())
    assert ds_got == ds_want and len(ds_got) >= 3


def test_pair_store_is_pair_grain(folded):
    """The split-pair index holds only verified survivor pairs — a
    bound, not a corpus re-scan artifact."""
    state, kept = folded
    n_pairs = state.pair_store.count()
    assert n_pairs < len(kept)  # pairs << survivors on this corpus
    both = (
        state.pair_store.select(F.col("doc_a").alias("d")).unionByName(
            state.pair_store.select(F.col("doc_b").alias("d"))
        ).distinct()
    )
    assert both.join(
        state.manifest.select(F.col("doc_id").alias("d")), "d", "left_anti"
    ).count() == 0


@pytest.fixture(scope="module")
def two_wave_corpus(spark):
    """Plants in BOTH later batches: [170,340) %5==1 carries the text
    of doc_id-170 and [340,500) %5==1 the text of doc_id-340 — so
    batch-2 drops become tombstones that a horizon=1 managed fold
    compacts away at batch 3."""
    docs = table(spark, SF_SMOKE, "documents").select("doc_id", "lang", "text")
    d1 = docs.select((F.col("doc_id") + 170).alias("doc_id"), F.col("text").alias("__d1"))
    d2 = docs.select((F.col("doc_id") + 340).alias("doc_id"), F.col("text").alias("__d2"))
    return (
        docs.join(d1, "doc_id", "left").join(d2, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            F.when(
                (F.col("doc_id") >= 170) & (F.col("doc_id") < 340)
                & (F.pmod("doc_id", F.lit(PLANT_MOD)) == 1)
                & F.col("__d1").isNotNull(),
                F.col("__d1"),
            )
            .when(
                (F.col("doc_id") >= 340)
                & (F.pmod("doc_id", F.lit(PLANT_MOD)) == 1)
                & F.col("__d2").isNotNull(),
                F.col("__d2"),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
        .cache()
    )


def _fold_all(corpus, horizon=None):
    state = None
    kept_ids = []
    for i, (lo, hi) in enumerate(CUTS):
        batch = corpus.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        kept, state = corpus_fold_batch(
            batch, state, batch_id=i + 1, horizon=horizon
        )
        state = _ckpt(state)
        kept_ids += [r.doc_id for r in kept.select("doc_id").collect()]
    return state, sorted(kept_ids)


def test_managed_fold_matches_unmanaged_and_compacts(spark, two_wave_corpus):
    """horizon=1 (r12): the managed fold equals the unmanaged one on
    this fixture (every planted dup's donor is a KEPT row — kept rows
    never compact), while dropped-doc tombstones older than the
    horizon are gone and the store is strictly smaller."""
    s_u, kept_u = _fold_all(two_wave_corpus, horizon=None)
    s_m, kept_m = _fold_all(two_wave_corpus, horizon=1)
    assert kept_m == kept_u and len(kept_m) > 100
    man_u = sorted(tuple(r) for r in s_u.manifest.collect())
    man_m = sorted(tuple(r) for r in s_m.manifest.collect())
    assert man_m == man_u
    rows_u = s_u.sig_store.count()
    rows_m = s_m.sig_store.count()
    assert rows_m < rows_u
    assert (
        s_m.sig_store.where(
            (~F.col("kept")) & (F.col("batch_id") <= 3 - 1)
        ).count()
        == 0
    )


def test_fold_horizon_toggle_raises(spark, two_wave_corpus):
    """r11-advice discipline: horizon cannot change for an existing
    state — managed and unmanaged sig stores have different schemas."""
    batch1 = two_wave_corpus.where(F.col("doc_id") < 170)
    _, unmanaged = corpus_fold_batch(batch1, None)
    batch2 = two_wave_corpus.where(
        (F.col("doc_id") >= 170) & (F.col("doc_id") < 340)
    )
    with pytest.raises(ValueError, match="horizon"):
        corpus_fold_batch(batch2, unmanaged, batch_id=2, horizon=1)
    _, managed = corpus_fold_batch(batch1, None, batch_id=1, horizon=1)
    with pytest.raises(ValueError, match="horizon"):
        corpus_fold_batch(batch2, managed)
    with pytest.raises(ValueError, match="batch_id"):
        corpus_fold_batch(batch1, None, horizon=1)


@pytest.mark.parametrize("cuts", [
    [(0, 100), (100, 500)],
    [(0, 250), (250, 380), (380, 450), (450, 500)],
])
def test_fold_invariance_across_other_batchings(spark, corpus, frozen, cuts, oneshot):
    """The batching-invariance theorem holds for ANY id-ordered
    batching, not just the 3-cut fixture — uneven 2-cut and 4-cut
    batchings reproduce the one-shot survivors and manifest."""
    model, eval_docs = frozen
    state, kept_ids = None, []
    for lo, hi in cuts:
        batch = corpus.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        kept, state = corpus_fold_batch(
            batch, state, lm_model=model, eval_docs=eval_docs
        )
        state = _ckpt(state)
        kept_ids += [r.doc_id for r in kept.select("doc_id").collect()]
    s_one, want = oneshot
    assert sorted(kept_ids) == want
    got_manifest = sorted(tuple(r) for r in state.manifest.collect())
    want_manifest = sorted(tuple(r) for r in s_one.manifest.collect())
    assert got_manifest == want_manifest


def test_fold_plans_are_jvm_side(spark, corpus, frozen):
    """The fold's per-batch plan stays in the zero-UDF discipline: no
    Python evaluation, no Cartesian product (broadcast 1-row folds
    excluded by construction — there are none here)."""
    model, eval_docs = frozen
    batch = corpus.where(F.col("doc_id") < 170)
    kept, state = corpus_fold_batch(
        batch, None, lm_model=model, eval_docs=eval_docs
    )
    for df in (kept, state.fp_store, state.sig_store, state.pair_store,
               state.manifest):
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        assert "CartesianProduct" not in plan


def test_drop_ledger_partitions_the_dropped_set(spark, corpus, folded, oneshot):
    """r12: every doc is either a survivor or appears in the ledger
    with EXACTLY one reason; per-reason counts match the stage deltas;
    the ledger is batching-invariant."""
    state, kept = folded
    ledger = state.ledger.collect()
    n_raw = corpus.count()
    assert len(ledger) == n_raw - len(kept)
    assert len({r.doc_id for r in ledger}) == len(ledger)  # one reason each
    assert not ({r.doc_id for r in ledger} & set(kept))
    reasons = {r.reason for r in ledger}
    assert reasons <= {
        "cleaned_empty", "exact_duplicate", "near_duplicate",
        "lm_filtered", "decontaminated",
    }
    assert {"lm_filtered", "decontaminated"} <= reasons  # fixture exercises both
    s_one, _ = oneshot
    got = sorted((r.doc_id, r.reason) for r in ledger)
    want = sorted((r.doc_id, r.reason) for r in s_one.ledger.collect())
    assert got == want
