"""End-to-end corpus construction: the composed pipeline a
training-data team actually runs, built entirely from this repo's
operators — filter → dedup → canonicalize → sample → split → pack.

Stage order is the cost-ordered one for 100 TB:
1. quality + language gates first (cheap, codegen-friendly column
   math; cuts the corpus before anything shuffles),
2. exact dedup (one fingerprint shuffle),
3. MinHash-LSH near-dup pairs → connected components → keep cluster
   canonicals (bucketed joins + O(log n) star rounds; never
   all-pairs),
4. deterministic train/val/test hash split (zero shuffle),
5. token-budget sequence packing per split (salted windows).

Every stage is individually oracle- or contract-tested elsewhere;
tests/test_corpus.py pins the composition: monotone row shrinkage,
split disjointness, pack budget bounds, and end-to-end determinism
across partition layouts.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as T
from ..operators.components import canonicalize
from ..operators.dedup import exact_duplicates, minhash_lsh_pairs
from ..operators.packing import pack_sequences
from ..operators.sampling import hash_split


@dataclass(frozen=True)
class CorpusConfig:
    min_chars: int = 80
    max_chars: int = 100_000
    min_quality: float = 0.35
    languages: tuple[str, ...] = ()          # empty = keep all
    # None = PII gate off (the default keeps the driver-visible
    # corpus_build_summary oracle purely length+quality); set a
    # hits-per-1000-chars ceiling to drop PII-dense documents
    max_pii_per_kchar: float | None = None
    jaccard_threshold: float = 0.5
    pack_budget_tokens: int = 512
    pack_groups: int = 8
    splits: dict[str, float] = field(
        default_factory=lambda: {"train": 0.9, "val": 0.05, "test": 0.05}
    )
    # r7 stages (both optional; activated by build_corpus arguments)
    decon_ngram: int = 8          # n for the eval-overlap drop
    classifier_min_margin: float = 0.0  # drop docs with NB margin > this


def quality_gate(docs: DataFrame, cfg: CorpusConfig) -> DataFrame:
    """Stage 1: length, quality-score and language filters — pure
    column math, pushed to the scan."""
    txt = F.col("text")
    out = docs.where(
        F.length(txt).between(cfg.min_chars, cfg.max_chars)
        & (T.quality_score(txt) >= cfg.min_quality)
    )
    if cfg.languages:
        out = out.where(T.lang_id(txt).isin(*cfg.languages))
    if cfg.max_pii_per_kchar is not None:
        from ..functions.pii import pii_score

        out = out.where(pii_score(txt) <= cfg.max_pii_per_kchar)
    return out


def dedup_stage(docs: DataFrame, cfg: CorpusConfig) -> DataFrame:
    """Stages 2+3: drop exact duplicates (keep min doc_id), then drop
    near-duplicate cluster non-canonicals.

    ``kept`` (gate + exact-dup semi-join — a corpus-sized subtree) is
    lazily localCheckpoint'd (r10): it feeds the MinHash signature
    explode, the candidate verification re-shingle, AND the
    canonicalize join; without the lineage cut each consumer re-ran
    the whole upstream plan (measured ~3x on the composed stage)."""
    exact = exact_duplicates(docs)
    kept = docs.join(
        exact.where(F.col("doc_id") == F.col("canonical_id")).select("doc_id"),
        "doc_id",
        "left_semi",
    ).localCheckpoint(eager=False)
    pairs = minhash_lsh_pairs(kept, threshold=cfg.jaccard_threshold)
    return canonicalize(kept, pairs).where(F.col("is_canonical")).drop(
        "canonical_id", "is_canonical"
    )


def classifier_gate(docs: DataFrame, model, cfg: CorpusConfig) -> DataFrame:
    """r7 stage 1b: drop documents the Naive-Bayes model classifies as
    class 1 (spam/low-quality) — keep margin <= classifier_min_margin.
    One broadcast join + doc-keyed sum (operators/classify.py); the
    model is trained once upstream on labeled seed data."""
    from ..operators.classify import nb_score

    flagged = (
        nb_score(model, docs)
        .where(F.col("margin") > cfg.classifier_min_margin)
        .select("doc_id")
    )
    return docs.join(flagged, "doc_id", "left_anti")


def decontaminate_stage(
    docs: DataFrame, eval_docs: DataFrame, cfg: CorpusConfig
) -> DataFrame:
    """r7 stage 1c: drop documents sharing any ``decon_ngram``-gram
    with the (broadcast) eval set — the operators/decontaminate.py
    left-anti contract, composed before the expensive dedup
    shuffles."""
    from ..operators.decontaminate import decontaminate

    return decontaminate(docs, eval_docs, n=cfg.decon_ngram)


def build_corpus(
    docs: DataFrame,
    cfg: CorpusConfig | None = None,
    eval_docs: DataFrame | None = None,
    classifier=None,
) -> DataFrame:
    """Full pipeline → one DataFrame with ``split``, ``n_tokens`` and
    ``pack_id`` added. Pack identity is (split, pack_id) — ids are
    scoped per split. Deterministic: every stage is a pure function of
    document content/ids (given a fixed trained ``classifier``).

    ``eval_docs`` activates benchmark decontamination (drop any doc
    sharing an n-gram with the eval set); ``classifier`` (an
    operators/classify.py NBModel) activates the learned quality
    gate. Both run before the dedup shuffles — gate cheap, shuffle
    less."""
    cfg = cfg or CorpusConfig()
    gated = quality_gate(docs, cfg)
    if classifier is not None:
        gated = classifier_gate(gated, classifier, cfg)
    if eval_docs is not None:
        gated = decontaminate_stage(gated, eval_docs, cfg)
    deduped = dedup_stage(gated, cfg)
    with_tokens = deduped.withColumn("n_tokens", T.token_count(F.col("text")))
    split = hash_split(with_tokens, cfg.splits, key_cols=("doc_id",))
    # pack WITHIN each split: window partition includes the split
    # column, so a pack can never straddle train/val/test
    return pack_sequences(
        split,
        budget=cfg.pack_budget_tokens,
        token_col="n_tokens",
        id_col="doc_id",
        groups=cfg.pack_groups,
        partition_cols=("split",),
    )
