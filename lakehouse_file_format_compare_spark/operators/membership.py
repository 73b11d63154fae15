"""Mergeable Bloom-filter membership sketch (Bloom 1970, public
textbook algorithm) — the scale PREFILTER for decontamination and
any other "is this key in that set?" join where one side is small
enough to sketch but the join itself is corpus-sized.

Representation: ``m = n_words * 32`` bits stored as LONG words
``(word, bits)`` — one row per nonzero word, built with a single
``bit_or`` aggregate. Merging two filters over the same parameters
is the same ``bit_or`` re-aggregation (mergeable partials, exactly
like the HLL/CMS families in operators/sketches.py). Bits live in
the low 32 of each LONG so no shift ever touches the sign bit —
``1::BIGINT << 31`` and ``(bits >> b) & 1`` are portable integer ops
in both Spark and DuckDB.

Hashes: ``k`` independent bit positions per key, each the first 12
hex chars of ``md5('{tag}{j}|' || key)`` cast to a 48-bit LONG, mod
``m`` (the operators/sketches.py ``_cms_bucket`` discipline) — so a
DuckDB oracle replays the ENTIRE filter: the bitmap, the probes, and
the false-positive count are exact cross-engine values.

Guarantee: no false negatives, ever — a key that was inserted always
probes positive. False positives occur at the classic
``(1 - e^(-k*n/m))^k`` rate; every user of the filter must therefore
re-verify hits against the exact set (the prefiltered
decontamination below does).

Scale shape (100 TB): the filter over an eval set is ~``n_words``
rows (a few KiB) — broadcast everywhere; the corpus side probes it
with a broadcast join and only the (rare) hits proceed to the exact
eval-set join. The corpus-sized shuffle that
``ngram_contamination``'s direct join needs on the gram key is
replaced by a broadcast probe + a join over the surviving sliver.

Cited reference scope: italovinicius18/lakehouse-file-format-compare
has no sketch surface (dags/ are format-comparison ETL); extension
per the training-data-pipeline brief (SURVEY §2 extensions —
membership companion to the HLL/Misra-Gries/Count-Min partials in
operators/sketches.py, consumed by operators/decontaminate.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: bits per stored LONG word — low half only, sign bit untouched.
WORD_BITS = 32


def _bit_index(col, j: int, m: int, tag: str):
    """Engine-portable bit position in [0, m): md5 hex prefix → 48-bit
    LONG → mod m (operators/sketches.py::_cms_bucket discipline)."""
    return F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat_ws("|", F.lit(f"{tag}{j}"), col.cast("string"))), 1, 12
            ),
            16,
            10,
        ).cast("long"),
        F.lit(m),
    )


def bloom_build(
    keys: DataFrame,
    key_col: str = "key",
    n_words: int = 1024,
    k: int = 4,
    tag: str = "bf",
) -> DataFrame:
    """Build the filter: one row per nonzero word, ``(word, bits)``.
    One scan of the key set, one ``bit_or`` aggregate (map-side
    combined). Re-aggregating the union of two builds with the same
    parameters merges them."""
    m = n_words * WORD_BITS
    idx = F.explode(
        F.array(*[_bit_index(F.col(key_col), j, m, tag) for j in range(k)])
    ).alias("__idx")
    return (
        keys.select(idx)
        .select(
            F.expr(f"__idx DIV {WORD_BITS}").alias("word"),
            F.pmod("__idx", F.lit(WORD_BITS)).alias("__bit"),
        )
        .groupBy("word")
        .agg(
            F.bit_or(F.expr("shiftleft(1L, CAST(__bit AS INT))")).alias("bits")
        )
    )


def bloom_probe(
    keys: DataFrame,
    key_col: str,
    bloom: DataFrame,
    n_words: int = 1024,
    k: int = 4,
    tag: str = "bf",
) -> DataFrame:
    """Probe each key: returns the INPUT FRAME — every column, every
    row, duplicates preserved — plus ``bf_member`` (1 = all k bits
    set — present OR a false positive; 0 = definitely absent), the
    same contract as :func:`bloom_probe_literal` (r10 advice: the old
    form returned distinct keys only and dropped carried columns).
    The filter is broadcast; the probe runs on the DISTINCT keys
    (k exploded rows per distinct key, a broadcast left join on the
    word, a per-key ``min``) and the verdict joins back onto the
    input — one shuffle keyed on ``key_col``, the same cost class as
    the old per-key groupBy."""
    m = n_words * WORD_BITS
    idx = F.explode(
        F.array(*[_bit_index(F.col(key_col), j, m, tag) for j in range(k)])
    ).alias("__idx")
    probes = keys.select(key_col).distinct().select(F.col(key_col), idx).select(
        key_col,
        F.expr(f"__idx DIV {WORD_BITS}").alias("word"),
        F.pmod("__idx", F.lit(WORD_BITS)).alias("__bit"),
    )
    hit = F.expr(
        "CAST(coalesce((shiftright(bits, CAST(__bit AS INT)) & 1), 0) AS INT)"
    )
    verdicts = (
        probes.join(F.broadcast(bloom), "word", "left")
        .select(key_col, hit.alias("__hit"))
        .groupBy(key_col)
        .agg(F.min("__hit").cast("int").alias("bf_member"))
    )
    # left join + coalesce: a NULL key never joins back (and can
    # never be in the filter) — it keeps its row with bf_member = 0,
    # matching the old groupBy form's NULL-group verdict
    return keys.join(verdicts, key_col, "left").withColumn(
        "bf_member", F.coalesce(F.col("bf_member"), F.lit(0)).cast("int")
    )


def bloom_literal(bloom: DataFrame, n_words: int = 1024) -> list[int]:
    """Collect the filter into a dense ``n_words`` LONG list — a
    BOUNDED driver read (the filter's size is a parameter, never data
    -dependent; the k-means literal-centroid discipline). Feed to
    :func:`bloom_probe_literal`."""
    words = [0] * n_words
    for r in bloom.collect():
        words[int(r["word"])] = int(r["bits"])
    return words


def bloom_probe_literal(
    keys: DataFrame,
    key_col: str,
    words: list[int],
    k: int = 4,
    tag: str = "bf",
) -> DataFrame:
    """Probe against a LITERAL filter: the bitmap rides the plan as an
    array literal, so the probe is a pure per-row projection — NO
    join, NO explode, NO shuffle (plan-pinned). This is what a Bloom
    filter is for at scale: an in-task bitmap lookup. Returns the
    input columns plus ``bf_member``; verdicts are bit-equal to
    :func:`bloom_probe` (pinned). Use the join form instead when the
    filter is too large to embed in a plan (~beyond 2^14 words)."""
    m = len(words) * WORD_BITS
    in_cols = list(keys.columns)
    staged = keys.withColumn(
        "__bfarr", F.array(*[F.lit(int(w)).cast("long") for w in words])
    )
    for j in range(k):
        staged = staged.withColumn(
            f"__bfi{j}", _bit_index(F.col(key_col), j, m, tag)
        )
    cond = " AND ".join(
        f"((shiftright(element_at(__bfarr, CAST(__bfi{j} DIV {WORD_BITS} AS INT) + 1),"
        f" CAST(__bfi{j} % {WORD_BITS} AS INT)) & 1) = 1)"
        for j in range(k)
    )
    return staged.select(
        *in_cols,
        F.expr(f"CAST(CASE WHEN {cond} THEN 1 ELSE 0 END AS INT)").alias(
            "bf_member"
        ),
    )


def bloom_prefiltered_contamination(
    corpus: DataFrame,
    eval_docs: DataFrame,
    n: int = 13,
    n_words: int = 1024,
    k: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_id_col: str = "doc_id",
    eval_text_col: str = "text",
) -> DataFrame:
    """``ngram_contamination`` with a Bloom prefilter on the corpus
    side: only corpus n-grams whose probe is positive join the exact
    eval n-gram set. IDENTICAL results to the direct join (no false
    negatives; false positives die in the exact join) — pinned in
    tests — with the corpus-side join volume cut to the probe-hit
    sliver."""
    from .decontaminate import _ngram_set

    e = _ngram_set(eval_docs, n, eval_id_col, eval_text_col, "eval_id")
    c = _ngram_set(corpus, n, id_col, text_col, "doc_id")
    words = bloom_literal(
        bloom_build(e.select("ngram").distinct(), "ngram", n_words=n_words, k=k),
        n_words,
    )
    # literal probe: the bitmap rides the plan, so the corpus side is
    # filtered IN-TASK before any shuffle — the prefilter costs one
    # projection, and only probe-positive grams reach the exact join
    survivors = (
        bloom_probe_literal(c, "ngram", words, k=k)
        .where(F.col("bf_member") == 1)
        .drop("bf_member")
    )
    return (
        survivors.join(F.broadcast(e), "ngram")
        .groupBy("doc_id", "eval_id")
        .agg(F.count(F.lit(1)).alias("shared_ngrams"))
    )


def bloom_decontaminate(
    corpus: DataFrame,
    eval_docs: DataFrame,
    n: int = 13,
    min_shared: int = 1,
    n_words: int = 1024,
    k: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_id_col: str = "doc_id",
    eval_text_col: str = "text",
) -> DataFrame:
    """Drop corpus documents with >= ``min_shared`` n-gram overlaps
    with ANY eval document — identical semantics (and pinned-identical
    results) to operators/decontaminate.py::decontaminate, with the
    corpus-side join replaced by the Bloom probe + exact-verify
    sliver. The drop-in scale path for the exact decontamination
    pass."""
    flagged = (
        bloom_prefiltered_contamination(
            corpus, eval_docs, n, n_words, k,
            id_col, text_col, eval_id_col, eval_text_col,
        )
        .groupBy("doc_id")
        .agg(F.sum("shared_ngrams").alias("total_shared"))
        .where(F.col("total_shared") >= min_shared)
        .select("doc_id")
    )
    return corpus.join(
        flagged.withColumnRenamed("doc_id", id_col), id_col, "left_anti"
    )
