"""Incremental corpus-pipeline fold (r12): the per-batch twin of
plans/pipeline_plans.py — the production daily-crawl shape, where a
new id-ordered document batch folds into a running corpus build
without ever re-reading history text.

Per batch:

    clean -> exact dedup vs fingerprint store
          -> MinHash est-Jaccard dedup vs signature store
          -> frozen-LM perplexity filter
          -> n-gram decontamination (stateless broadcast eval side)
          -> update the survivor manifest + split-pair store

Global artifacts (splits / packs / datasheet) re-derive from the
TEXT-FREE state at any point: the manifest is (doc_id, lang,
n_tokens), the pair store is pair-grain, so the rederivation cost is
manifest-sized, never corpus-sized.

Fold theorem (tests/test_corpus_fold.py): for id-ordered batches the
fold is BATCHING-INVARIANT — folding the corpus in any id-ordered
batching produces the same survivor set, the same split assignment,
the same packs and the same datasheet as folding it in one batch.
Stage-wise argument:

- exact dedup: keep-first per fingerprint == min-id per fingerprint
  when batches are id-ordered; the store is the set of fingerprints
  seen (operators/dedup.py exact tier);
- MinHash dedup: the signature store indexes EVERY stage-2 survivor
  (kept and dropped), which is exactly what makes the per-batch fold
  equal one full run (the incremental_minhash_dedup theorem, r9);
- LM filter: the model is FROZEN (trained once on a reference slice
  — the CCNet deployment shape), so scoring is stateless;
- decontamination: stateless (eval grams broadcast);
- split pairs: band-bucket candidates est-verified at the SPLIT
  threshold between batch survivors and the kept-signature store —
  signatures and band buckets are pure functions of text, so the
  candidate set is identical however the corpus is batched;
- splits / packs / datasheet: pure functions of (manifest, pairs).

What the split guard fences is the pair set the LSH index can SEE at
the split threshold (the S-curve recall caveat of bands tuned for the
dedup threshold) — deterministic and batching-invariant, but not the
exhaustive sub-threshold pair set; the batch pipeline_plans row keeps
the exact-pair tier driver-checked.

Scale notes (100 TB/day): per batch, text-grain work is shingle+sign
the BATCH only; every store join is signature- or pair-grain. The
signature store grows with docs-ever-seen — pass ``horizon`` (+ a
monotone ``batch_id``) to manage it with the operators/lifecycle.py
retention discipline: dropped-doc tombstones age out after ``horizon``
batches, kept rows live forever, and the fold guarantee weakens
exactly as lifecycle.py documents (exact within the horizon).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as T
from .dedup import (
    banded_signatures,
    incremental_minhash_dedup,
    signature_store,
)


@dataclass
class CorpusFoldState:
    """Text-free running state of an incremental corpus build. All
    frames are lazy; callers persist/checkpoint between batches (the
    signature-store discipline — the streaming loaders commit them as
    insert-only merges)."""

    fp_store: DataFrame | None = None     # (fp) fingerprints ever seen
    sig_store: DataFrame | None = None    # (doc, signature) every stage-2 survivor
    kept_sigs: DataFrame | None = None    # (doc, signature) of final survivors
    pair_store: DataFrame | None = None   # (doc_a, doc_b) split-threshold pairs
    manifest: DataFrame | None = None     # (doc_id, lang, n_tokens) survivors
    ledger: DataFrame | None = None       # (doc_id, reason) every dropped doc
    #: the current batch's NEW rows per store (same field names) —
    #: what a store-backed caller commits; None on a caller-built state
    delta: "CorpusFoldState | None" = None


def _clean_batch(batch: DataFrame, id_col: str, text_col: str, lang_col: str):
    return (
        batch.select(
            F.col(id_col).alias("doc_id"),
            F.col(lang_col).alias("lang"),
            T.clean_text(F.col(text_col)).alias("text"),
        )
        .where(F.col("text").isNotNull() & (F.length("text") > 0))
    )


def _split_pairs_vs_store(
    new_sigs: DataFrame,
    kept_sigs: DataFrame | None,
    split_threshold: float,
    num_hashes: int,
    bands: int,
) -> DataFrame:
    """Band-bucket candidates est-verified at the split threshold:
    batch-vs-kept-store plus within-batch, doc_a < doc_b."""
    from .dedup import _est_verified

    rows = num_hashes // bands
    banded_new = banded_signatures(new_sigs, bands, rows)
    in_cand = (
        banded_new.alias("x")
        .join(
            banded_new.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.doc") < F.col("y.doc")),
        )
        .select(F.col("x.doc").alias("doc_a"), F.col("y.doc").alias("doc_b"))
        .distinct()
    )
    pairs = _est_verified(in_cand, new_sigs, new_sigs, split_threshold, num_hashes)
    if kept_sigs is not None:
        banded_hist = banded_signatures(kept_sigs, bands, rows)
        cross_cand = (
            banded_hist.alias("x")
            .join(
                banded_new.alias("y"),
                (F.col("x.band") == F.col("y.band"))
                & (F.col("x.bucket") == F.col("y.bucket"))
                # no self-pairs if the store ever holds a batch doc's
                # id (crash-replay window — see corpus_fold_batch)
                & (F.col("x.doc") != F.col("y.doc")),
            )
            .select(F.col("x.doc").alias("doc_a"), F.col("y.doc").alias("doc_b"))
            .distinct()
        )
        pairs = pairs.unionByName(
            _est_verified(
                cross_cand, kept_sigs, new_sigs, split_threshold, num_hashes
            )
        )
    return pairs.select("doc_a", "doc_b").distinct()


def corpus_fold_batch(
    batch: DataFrame,
    state: CorpusFoldState | None,
    lm_model: tuple[DataFrame, DataFrame, DataFrame] | None = None,
    eval_docs: DataFrame | None = None,
    threshold: float = 0.5,
    split_threshold: float = 0.35,
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 3,
    decon_n: int = 8,
    theta_nanos: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    batch_id: int | None = None,
    horizon: int | None = None,
) -> tuple[DataFrame, CorpusFoldState]:
    """Fold one id-ordered batch into the corpus build. Returns
    ``(kept_batch_docs, new_state)``; kept docs carry (doc_id, lang,
    text). ``lm_model`` is the FROZEN (model, ctx_totals, vocab) from
    operators/lm.bigram_lm_train — None skips the LM stage;
    ``eval_docs`` (doc_id, text) is the benchmark fixture — None skips
    decontamination.

    ``horizon`` (requires ``batch_id``, monotone per fold): manage the
    signature store with the operators/lifecycle.py retention
    discipline — rows carry (batch_id, kept), where kept = survived
    the MINHASH stage (those are the permanent dedup index; LM/decon
    drops are quality cuts, their signatures stay kept so future
    duplicates of a filtered doc still drop at the dedup stage), and
    dropped-doc tombstones age out after ``horizon`` batches. The
    fold guarantee weakens exactly as documented in lifecycle.py:
    exact within the retention horizon (long pure-tombstone chains
    older than the horizon are the only divergence). The fingerprint
    store needs no horizon: 16 bytes per distinct text, and every fp
    is permanent corpus index (an exact dup of ANY seen doc must
    always drop). ``horizon`` cannot change for an existing state —
    managed and unmanaged store schemas differ (checked loudly)."""
    from .decontaminate import ngram_contamination

    state = state or CorpusFoldState()
    if horizon is not None and batch_id is None:
        raise ValueError("horizon requires batch_id (monotone per fold)")
    if state.sig_store is not None:
        managed_schema = {"batch_id", "kept"} <= set(state.sig_store.columns)
        if (horizon is not None) != managed_schema:
            raise ValueError(
                "corpus_fold_batch: sig_store was built with horizon "
                f"{'set' if managed_schema else 'unset'} but this fold has "
                f"horizon={horizon!r}; horizon cannot change for an "
                "existing state — rebuild the store"
            )
    s1 = _clean_batch(batch, id_col, text_col, lang_col)
    # Crash-replay idempotency (r12 advisor, high): a store-backed
    # caller may replay this batch against stores that ALREADY contain
    # some of its rows (a crash between the per-store commits). Every
    # doc-keyed store is therefore SCRUBBED of this batch's ids before
    # any join — each delta below is then a pure function of
    # (stores \ batch), so a replay re-derives byte-identical deltas
    # whatever commit prefix landed, and keyed insert-only merges make
    # the re-commit a no-op. Under the fold contract (disjoint
    # id-ordered batches) the scrub is itself a no-op, so the normal
    # path pays only a broadcast anti-join per store. The fingerprint
    # store is TEXT-keyed and cannot be scrubbed by doc id (a genuine
    # earlier-batch exact dup shares the fp) — callers must commit it
    # LAST so no replay window ever sees this batch's fps
    # (streaming/corpus_build_stream.py commit order).
    s1 = s1.localCheckpoint(eager=False)
    batch_ids = s1.select(F.col("doc_id").alias("doc"))
    # exact dedup: keep-first within the batch (min id per fp), drop
    # anything whose fingerprint is already in the store
    with_fp = s1.withColumn("fp", T.fingerprint(F.col("text")))
    first_in_batch = with_fp.groupBy("fp").agg(F.min("doc_id").alias("__kid"))
    s2f = with_fp.join(first_in_batch, "fp").where(
        F.col("doc_id") == F.col("__kid")
    ).drop("__kid")
    if state.fp_store is not None:
        s2f = s2f.join(state.fp_store, "fp", "left_anti")
    # lazy lineage cuts (the pipeline_plans discipline): each stage
    # frame feeds SEVERAL store materializations — without the cut,
    # every store the caller checkpoints re-runs the whole batch chain
    s2f = s2f.localCheckpoint(eager=False)
    new_fps = s2f.select("fp")
    s2 = s2f.drop("fp")
    # pure append: new_fps are distinct (one per kept-first doc) and
    # disjoint from the store (anti-joined above) — no per-batch
    # full-store distinct shuffle
    fp_store = (
        new_fps if state.fp_store is None
        else state.fp_store.unionByName(new_fps)
    )
    # MinHash dedup vs the everything-seen signature store; the
    # batch is signed ONCE and the frame reused by the split index
    new_sigs = signature_store(s2, num_hashes, k, "doc_id", "text").localCheckpoint(
        eager=False
    )
    sig_history = state.sig_store
    if horizon is not None and sig_history is not None:
        sig_history = sig_history.select("doc", "signature")
    if sig_history is not None:
        # replay scrub (see above): history must not contain this batch
        sig_history = sig_history.join(batch_ids, "doc", "left_anti")
    s3, sig_store = incremental_minhash_dedup(
        s2,
        sig_history,
        threshold=threshold,
        num_hashes=num_hashes,
        bands=bands,
        k=k,
        id_col="doc_id",
        text_col="text",
        new_sigs=new_sigs,
    )
    s3 = s3.localCheckpoint(eager=False)
    sig_delta = new_sigs
    if horizon is not None:
        from .lifecycle import compact_store, stamp_batch

        sig_delta = stamp_batch(
            new_sigs, batch_id, s3.select(F.col("doc_id").alias("doc")), "doc"
        )
        merged = (
            sig_delta if state.sig_store is None
            else state.sig_store.unionByName(sig_delta)
        )
        sig_store = compact_store(merged, batch_id, horizon)
    # frozen-LM filter (stateless given the model frames)
    if lm_model is not None:
        from .lm import THETA_NANOS, bigram_lm_score, flag_high_perplexity

        model, ctx_totals, vocab = lm_model
        scored = flag_high_perplexity(
            bigram_lm_score(s3, model, ctx_totals, vocab),
            THETA_NANOS if theta_nanos is None else theta_nanos,
        )
        s4 = s3.join(
            scored.where(~F.col("flagged")).select("doc_id"),
            "doc_id",
            "left_semi",
        )
    else:
        s4 = s3
    # stateless decontamination
    if eval_docs is not None:
        contaminated = (
            ngram_contamination(s4, eval_docs, n=decon_n)
            .select("doc_id")
            .distinct()
        )
        s5 = s4.join(contaminated, "doc_id", "left_anti")
    else:
        s5 = s4
    s5 = s5.localCheckpoint(eager=False)
    # split-pair index: survivors only, batch vs kept store + within
    surv_sigs = new_sigs.join(
        s5.select(F.col("doc_id").alias("doc")), "doc", "left_semi"
    )
    kept_sigs_hist = state.kept_sigs
    if kept_sigs_hist is not None:
        # replay scrub (see above)
        kept_sigs_hist = kept_sigs_hist.join(batch_ids, "doc", "left_anti")
    new_pairs = _split_pairs_vs_store(
        surv_sigs, kept_sigs_hist, split_threshold, num_hashes, bands
    )
    # pure append: every new pair has >= 1 endpoint in this batch
    # (unseen before), so it cannot already be in the store
    pair_store = (
        new_pairs if state.pair_store is None
        else state.pair_store.unionByName(new_pairs)
    )
    kept_sigs = (
        surv_sigs if state.kept_sigs is None
        else state.kept_sigs.unionByName(surv_sigs)
    )
    new_manifest = s5.select(
        "doc_id", "lang", T.token_count(F.col("text")).cast("long").alias("n_tokens")
    )
    manifest = (
        new_manifest if state.manifest is None
        else state.manifest.unionByName(new_manifest)
    )
    # drop ledger: per-doc attribution of WHY a doc left the build —
    # the debuggability surface a production pipeline answers "where
    # did my document go" from. Anti-joins between adjacent
    # (checkpointed) stage frames; reasons partition the dropped set.
    def _dropped(prev, cur, reason):
        return (
            prev.select("doc_id")
            .join(cur.select("doc_id"), "doc_id", "left_anti")
            .select("doc_id", F.lit(reason).alias("reason"))
        )

    new_ledger = (
        _dropped(batch.select(F.col(id_col).alias("doc_id")), s1, "cleaned_empty")
        .unionByName(_dropped(s1, s2, "exact_duplicate"))
        .unionByName(_dropped(s2, s3, "near_duplicate"))
        .unionByName(_dropped(s3, s4, "lm_filtered"))
        .unionByName(_dropped(s4, s5, "decontaminated"))
    )
    ledger = (
        new_ledger if state.ledger is None
        else state.ledger.unionByName(new_ledger)  # append: batches are disjoint
    )
    # per-batch deltas for store-backed callers: the streaming loader
    # commits ONLY these as keyed insert-only merges (merging the full
    # union frame would rewrite the whole store every micro-batch)
    delta = CorpusFoldState(
        fp_store=new_fps,
        sig_store=sig_delta,
        kept_sigs=surv_sigs,
        pair_store=new_pairs,
        manifest=new_manifest,
        ledger=new_ledger,
    )
    return s5, CorpusFoldState(
        fp_store=fp_store,
        sig_store=sig_store,
        kept_sigs=kept_sigs,
        pair_store=pair_store,
        manifest=manifest,
        ledger=ledger,
        delta=delta,
    )


def fold_splits(
    state: CorpusFoldState,
    weights: dict[str, float],
    portable: bool = False,
) -> DataFrame:
    """Leakage-safe split assignment of every survivor so far:
    components over the cumulative pair store, md5/xxhash bucket by
    canonical id (operators/sampling.py::split_assign). Pure function
    of (manifest, pair_store) — batching-invariant; a doc's split can
    only change when a later batch MERGES its component (the
    documented growth semantics of component-keyed splitting)."""
    from .components import canonicalize
    from .sampling import split_assign

    pairs = state.pair_store
    if pairs is None:
        spark = state.manifest.sparkSession
        pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    with_canon = canonicalize(state.manifest, pairs)
    return split_assign(with_canon, weights, portable=portable)


def fold_packs(
    state: CorpusFoldState,
    weights: dict[str, float],
    budget: int,
    groups: int = 1,
    portable: bool = False,
) -> DataFrame:
    """Per-split packing of the cumulative manifest — pack ids are a
    pure function of (ids, token counts, split), so re-deriving after
    every fold equals the one-shot packing of the union."""
    from .packing import pack_sequences

    assigned = fold_splits(state, weights, portable=portable).select(
        "doc_id", "split", "n_tokens"
    )
    return pack_sequences(
        assigned, budget=budget, groups=groups, partition_cols=("split",)
    )


def fold_datasheet(state: CorpusFoldState) -> DataFrame:
    """(section, metric, value) volume + lang_mix sections of the
    survivor corpus, from the text-free manifest."""
    from ..ext.datasheet import _tall

    volume = state.manifest.agg(
        F.count(F.lit(1)).cast("long").alias("docs"),
        F.coalesce(F.sum("n_tokens"), F.lit(0)).cast("long").alias("tokens"),
    )
    lang_mix = (
        state.manifest.groupBy(F.col("lang").alias("metric"))
        .agg(F.count(F.lit(1)).cast("long").alias("value"))
        .select(
            F.lit("lang_mix").alias("section"),
            F.coalesce(F.col("metric"), F.lit("<null>")).alias("metric"),
            "value",
        )
    )
    return _tall(volume, "volume").unionByName(lang_mix)
