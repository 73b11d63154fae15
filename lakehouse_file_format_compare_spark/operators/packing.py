"""Document → training-sequence packing.

Groups documents into fixed token-budget packs (the preprocessing step
between a deduped corpus and an LLM data loader). Packing is
document-atomic and CONTIGUOUS by doc id: docs are laid out in id
order and a pack boundary falls wherever the running token count
crosses the budget — so a pack may overflow by at most one document
(standard bin-chunking; true best-fit packing is order-dependent and
non-reproducible across cluster layouts, which disqualifies it here).

Scale: a single global ordering would serialize into one partition.
``groups > 1`` salts the layout by ``doc_id % groups``: each salt
group packs independently (one window per group, all groups in
parallel), trading ≤ one underfull pack per group for full
parallelism. Pack ids are globally unique: ``salt * 2^40 + bin``.

Deterministic by construction (pure function of ids + token counts),
so it has an exact DuckDB oracle — tests/test_sampling.py runs the
identical window SQL on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_PACK_STRIDE = 1 << 40


def pack_sequences(
    df: DataFrame,
    budget: int,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    groups: int = 1,
    partition_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Assign every document a ``pack_id`` such that docs sharing a
    pack fit the token budget (± one overflowing doc). Adds
    ``pack_id``; preserves all input columns. ``partition_cols``
    scope packing (e.g. per split: a pack must never straddle
    train/val) — pack_id is then only unique within a scope; prefix
    it with the scope key if a global id is needed."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if groups <= 0:
        raise ValueError(f"groups must be positive, got {groups}")
    salt = F.pmod(F.col(id_col), F.lit(groups))
    w = Window.partitionBy(*partition_cols, salt).orderBy(F.col(id_col))
    cum = F.sum(F.col(token_col)).over(w)
    # bin index by where the doc STARTS (cum - its own tokens)
    bin_ix = F.floor((cum - F.col(token_col)) / F.lit(budget))
    return df.withColumn("pack_id", salt * F.lit(_PACK_STRIDE) + bin_ix)


def pack_summary(
    packed: DataFrame,
    token_col: str = "n_tokens",
    partition_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-pack roll-up: doc count + token fill (for loader manifests
    and fill-rate monitoring). Pass the SAME ``partition_cols`` used
    in ``pack_sequences`` — pack_id is only unique within a scope, so
    summarizing scoped output without them silently merges packs
    across scopes (e.g. a train pack and a val pack with the same id
    collapse into one inflated row)."""
    return packed.groupBy(*partition_cols, "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_col).alias("pack_tokens"),
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 128,
    overlap_tokens: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Packing's sibling: split each document into OVERLAPPING
    token-window chunks (context-window preparation for training /
    retrieval indexing). Chunk i covers tokens
    [i·stride, i·stride + chunk_tokens), stride = chunk − overlap;
    chunk count = 1 for docs that fit, else
    ceil((n − chunk) / stride) + 1 (the final chunk is allowed to be
    short — no token is dropped, every consecutive pair of chunks
    shares exactly ``overlap_tokens`` tokens except possibly the
    last). Docs with zero tokens produce no chunks.

    Output: (doc_id, chunk_index, n_tokens, chunk_text) with
    chunk_text whitespace-normalized (tokens re-joined by single
    spaces — the same token stream a loader would consume).

    Plan shape / 100 TB: per-row explode, ZERO shuffles — chunking is
    embarrassingly parallel and stays inside whole-stage codegen.
    Tokenization matches the ranking/decontamination family
    (lowercase, whitespace split). Exact DuckDB oracle in
    tests/test_sampling.py."""
    if not 0 <= overlap_tokens < chunk_tokens:
        raise ValueError("need 0 <= overlap_tokens < chunk_tokens")
    stride = chunk_tokens - overlap_tokens
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda t: F.length(t) > 0,
    )
    n = F.size("toks")
    n_chunks = F.when(n <= chunk_tokens, F.lit(1)).otherwise(
        F.ceil((n - chunk_tokens) / F.lit(stride)).cast("int") + 1
    )
    chunked = (
        docs.select(F.col(id_col).alias("doc_id"), toks.alias("toks"))
        .where(n > 0)
        .select(
            "doc_id", "toks",
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_index"),
        )
        .select(
            "doc_id",
            "chunk_index",
            F.slice(
                "toks", F.col("chunk_index") * stride + 1, chunk_tokens
            ).alias("ct"),
        )
    )
    return chunked.select(
        "doc_id",
        "chunk_index",
        F.size("ct").alias("n_tokens"),
        F.array_join("ct", " ").alias("chunk_text"),
    )
