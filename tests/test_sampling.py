"""Deterministic sampling, splitting and sequence packing
(operators/sampling.py, operators/packing.py): DuckDB oracle compares
for the portable md5/window paths, distribution + stability contracts
for the xxhash64 paths."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouse_file_format_compare_spark.operators.packing import (
    pack_sequences,
    pack_summary,
)
from lakehouse_file_format_compare_spark.operators.sampling import (
    fraction_sample,
    hash_split,
    stratified_sample,
)
from lakehouse_file_format_compare_spark.sources.testdata import table

from .conftest import SF_CORRECTNESS
SF = SF_CORRECTNESS
from .oracle import compare

N_PER_LANG = 20

STRATIFIED_SQL = f"""
SELECT doc_id, text, lang, source, n_chars
FROM documents
QUALIFY row_number() OVER (
    PARTITION BY lang
    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
) <= {N_PER_LANG}
"""


def _stratified(spark, sf_dir):
    return stratified_sample(
        table(spark, sf_dir, "documents"),
        strata_cols=("lang",),
        n_per_stratum=N_PER_LANG,
        key_cols=("doc_id",),
    )


def test_stratified_sample_oracle(spark):
    ok, msg = compare(spark, SF_CORRECTNESS, _stratified, STRATIFIED_SQL)
    assert ok, msg


def test_stratified_sample_partition_independent(spark):
    docs = table(spark, SF_CORRECTNESS, "documents")
    a = _stratified(spark, SF_CORRECTNESS).collect()
    b = stratified_sample(
        docs.repartition(7), ("lang",), N_PER_LANG, ("doc_id",)
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    per_lang = {}
    for r in a:
        per_lang[r["lang"]] = per_lang.get(r["lang"], 0) + 1
    assert all(n <= N_PER_LANG for n in per_lang.values())


def test_hash_split_contracts(spark):
    docs = table(spark, SF_CORRECTNESS, "documents")
    weights = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = hash_split(docs, weights, key_cols=("doc_id",))
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    total = sum(counts.values())
    assert total == docs.count()
    # proportions within ±5pp at 500 docs
    for name, w in weights.items():
        assert abs(counts.get(name, 0) / total - w) < 0.05, (name, counts)
    # per-key stability: assignment is identical on an arbitrary subset
    # (rows added/removed elsewhere never move a doc between splits)
    sub = hash_split(docs.where(F.col("doc_id") % 3 == 0), weights, key_cols=("doc_id",))
    full = {r["doc_id"]: r["split"] for r in out.select("doc_id", "split").collect()}
    for r in sub.select("doc_id", "split").collect():
        assert full[r["doc_id"]] == r["split"]


def test_fraction_sample_deterministic_and_sized(spark):
    docs = table(spark, SF_CORRECTNESS, "documents")
    s1 = fraction_sample(docs, 0.25, key_cols=("doc_id",))
    s2 = fraction_sample(docs.repartition(5), 0.25, key_cols=("doc_id",))
    ids1 = sorted(r["doc_id"] for r in s1.select("doc_id").collect())
    ids2 = sorted(r["doc_id"] for r in s2.select("doc_id").collect())
    assert ids1 == ids2
    n = docs.count()
    assert 0.15 * n < len(ids1) < 0.35 * n


BUDGET = 512

PACKING_SQL = f"""
WITH toks AS (
    SELECT doc_id, n_chars AS n_tokens FROM documents
)
SELECT doc_id, n_tokens,
       (doc_id % 4) * {1 << 40}
       + CAST(floor((SUM(n_tokens) OVER (
             PARTITION BY doc_id % 4 ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) - n_tokens) / {BUDGET}.0) AS BIGINT) AS pack_id
FROM toks
"""


def _packed(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.col("n_chars").alias("n_tokens")
    )
    return pack_sequences(docs, budget=BUDGET, groups=4)


def test_packing_oracle(spark):
    ok, msg = compare(spark, SF_CORRECTNESS, _packed, PACKING_SQL)
    assert ok, msg


def test_packing_document_atomic_overflow_bound(spark):
    packed = _packed(spark, SF_CORRECTNESS)
    max_doc = packed.agg(F.max("n_tokens")).collect()[0][0]
    fills = pack_summary(packed).collect()
    assert all(r["pack_tokens"] < BUDGET + max_doc for r in fills)
    # every doc appears exactly once
    n_docs = packed.count()
    assert sum(r["n_docs"] for r in fills) == n_docs


def test_mixture_sample_per_source_fractions(spark):
    from lakehouse_file_format_compare_spark.operators.sampling import mixture_sample

    docs = table(spark, SF_CORRECTNESS, "documents")
    # downweight half the sources to 30%, keep the rest whole
    fracs = {f"src{i}": 0.3 for i in range(10)}
    out = mixture_sample(docs, "source", fracs, key_cols=("doc_id",))
    before = {r["source"]: r["n"] for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    after = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(fracs) <= set(before), "test assumes src0..src9 exist in testdata"
    for src, n in before.items():
        if src not in fracs:
            assert after.get(src, 0) == n                          # unlisted kept whole
    down_before = sum(before[s] for s in fracs)
    down_after = sum(after.get(s, 0) for s in fracs)
    assert 0.2 < down_after / down_before < 0.4                    # ~30% aggregate
    # subset stability: same keys keep their decision on a shrunk corpus
    sub = mixture_sample(docs.where(F.col("doc_id") % 2 == 0), "source", fracs, key_cols=("doc_id",))
    kept_full = {r["doc_id"] for r in out.select("doc_id").collect()}
    kept_sub = {r["doc_id"] for r in sub.select("doc_id").collect()}
    assert kept_sub == {d for d in kept_full if d % 2 == 0}


def test_samplers_are_decorrelated_when_composed(spark):
    """Mix-then-split (the standard corpus recipe) must draw
    independent buckets per stage: without domain-separated hashes,
    mixture_sample(0.3) keeps only buckets 0-2999 and hash_split then
    maps EVERY survivor to 'train' (ADVICE r3)."""
    from lakehouse_file_format_compare_spark.operators.sampling import mixture_sample

    docs = table(spark, SF_CORRECTNESS, "documents")
    sources = [r["source"] for r in docs.select("source").distinct().collect()]
    mixed = mixture_sample(docs, "source", {s: 0.3 for s in sources}, key_cols=("doc_id",))
    weights = {"train": 0.9, "val": 0.05, "test": 0.05}
    split = hash_split(mixed, weights, key_cols=("doc_id",))
    counts = {r["split"]: r["n"] for r in split.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts.get("val", 0) > 0 and counts.get("test", 0) > 0, counts
    total = sum(counts.values())
    assert counts["train"] / total < 0.97  # not everything in train
    # fraction_sample after a split is decorrelated too
    from lakehouse_file_format_compare_spark.operators.sampling import fraction_sample

    sampled = fraction_sample(split.where(F.col("split") == "train"), 0.5, key_cols=("doc_id",))
    n_train = counts["train"]
    assert 0.35 * n_train < sampled.count() < 0.65 * n_train


def test_pack_summary_scoped_by_partition_cols(spark):
    """pack_summary must group on (*partition_cols, pack_id): scoped
    pack ids collide across splits, and an unscoped summary would
    silently merge a train pack with a val pack (ADVICE r3)."""
    docs = table(spark, SF_CORRECTNESS, "documents").select(
        "doc_id", F.col("n_chars").alias("n_tokens")
    )
    split = hash_split(docs, {"train": 0.5, "val": 0.5}, key_cols=("doc_id",))
    packed = pack_sequences(split, budget=BUDGET, groups=2, partition_cols=("split",))
    scoped = pack_summary(packed, partition_cols=("split",))
    assert scoped.count() == packed.select("split", "pack_id").distinct().count()
    # scoped totals preserve the doc count; per-row docs never exceed
    # what an unscoped merge would inflate
    assert sum(r["n_docs"] for r in scoped.collect()) == packed.count()
    # at least one pack_id appears in both splits (the collision the
    # scoped grouping protects against) — if not, the guard is moot
    dup_ids = (
        packed.select("split", "pack_id").distinct()
        .groupBy("pack_id").agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1).count()
    )
    assert dup_ids > 0


def test_chunk_documents_duckdb_oracle(spark):
    """Overlapping token-window chunking: exact DuckDB oracle (same
    tokenization, same ceil arithmetic) on the sf0.01 documents."""
    import duckdb

    from lakehouse_file_format_compare_spark.operators.packing import chunk_documents
    from lakehouse_file_format_compare_spark.sources.testdata import table

    from .conftest import SF_CORRECTNESS

    CHUNK, OVER = 40, 8
    got = sorted(
        map(tuple, chunk_documents(
            table(spark, SF_CORRECTNESS, "documents"),
            chunk_tokens=CHUNK, overlap_tokens=OVER,
        ).collect())
    )
    stride = CHUNK - OVER
    con = duckdb.connect()
    want = sorted(map(tuple, con.execute(f"""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                               t -> length(t) > 0) AS t
            FROM read_parquet('{SF_CORRECTNESS}/documents.parquet')
        ), sized AS (
            SELECT doc_id, t, len(t) AS n,
                   CASE WHEN len(t) <= {CHUNK} THEN 1
                        ELSE CAST(ceil((len(t) - {CHUNK}) / {stride}.0) AS INT) + 1
                   END AS n_chunks
            FROM toks WHERE len(t) > 0
        ), chunks AS (
            SELECT doc_id, ci AS chunk_index,
                   list_slice(t, ci * {stride} + 1, ci * {stride} + {CHUNK}) AS ct
            FROM sized, range(0, 4096) r(ci)
            WHERE ci < n_chunks
        )
        SELECT doc_id, chunk_index, len(ct) AS n_tokens,
               array_to_string(ct, ' ') AS chunk_text
        FROM chunks
    """).fetchall()))
    con.close()
    assert got == want
    assert len(got) > len({d for d, *_ in got})  # some docs really split


def test_chunk_documents_overlap_invariants(spark):
    """Every consecutive chunk pair shares exactly overlap tokens
    (except a short final chunk), no token dropped, order preserved."""
    from lakehouse_file_format_compare_spark.operators.packing import chunk_documents

    text = " ".join(f"w{i}" for i in range(103))
    docs = spark.createDataFrame([(1, text), (2, "solo"), (3, "  ")],
                                 "doc_id long, text string")
    rows = sorted(
        ((r["doc_id"], r["chunk_index"], r["chunk_text"].split()))
        for r in chunk_documents(docs, chunk_tokens=40, overlap_tokens=10).collect()
    )
    by_doc = {}
    for d, ci, ct in rows:
        by_doc.setdefault(d, []).append((ci, ct))
    assert 3 not in by_doc                       # empty doc: no chunks
    assert by_doc[2] == [(0, ["solo"])]
    chunks = [ct for _, ct in sorted(by_doc[1])]
    # stride 30: starts 0, 30, 60, 90 -> 4 chunks, last short (13)
    assert [len(c) for c in chunks] == [40, 40, 40, 13]
    reassembled = chunks[0] + [t for c in chunks[1:] for t in c[10:]]
    assert reassembled == text.split()           # lossless
    for a, b in zip(chunks, chunks[1:]):
        assert a[-10:] == b[:10]                 # exact overlap

    import pytest as _pytest
    with _pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=10, overlap_tokens=10)


def test_chunk_documents_plan_zero_shuffle(spark):
    from lakehouse_file_format_compare_spark.operators.packing import chunk_documents
    from lakehouse_file_format_compare_spark.sources.testdata import table

    from .conftest import SF_CORRECTNESS

    plan = (
        chunk_documents(table(spark, SF_CORRECTNESS, "documents"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan                # embarrassingly parallel
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_temperature_fractions_math():
    from lakehouse_file_format_compare_spark.operators.sampling import (
        temperature_fractions,
    )

    counts = {"web": 8000, "books": 1000, "code": 1000}
    # T=1: natural proportions -> every source keeps target/total
    f1 = temperature_fractions(counts, temperature=1.0, target_total=5000)
    assert all(abs(f - 0.5) < 1e-12 for f in f1.values())
    # T large: near-uniform weights -> tail sources keep (capped) more
    fu = temperature_fractions(counts, temperature=100.0, target_total=3000)
    assert fu["books"] > f1["books"] and fu["web"] < f1["web"]
    assert all(0.0 <= f <= 1.0 for f in fu.values())
    # zero-count source well-defined; impossible temperature rejected
    assert temperature_fractions({"a": 0}, 1.0, 10) == {"a": 0.0}
    import pytest as _pytest
    with _pytest.raises(ValueError):
        temperature_fractions(counts, temperature=0.0, target_total=10)


def test_temperature_mixture_end_to_end(spark):
    from lakehouse_file_format_compare_spark.operators.sampling import (
        mixture_sample,
        temperature_fractions,
    )
    from lakehouse_file_format_compare_spark.sources.testdata import table

    from .conftest import SF_CORRECTNESS

    docs = table(spark, SF_CORRECTNESS, "documents")
    counts = {r["source"]: r["n"] for r in
              docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    total = sum(counts.values())
    target = total // 2
    fr = temperature_fractions(counts, temperature=3.0, target_total=target)
    kept = mixture_sample(docs, "source", fr, key_cols=("doc_id",))
    got = {r["source"]: r["n"] for r in
           kept.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    # per-source keeps land near fraction * count (keyed-hash Bernoulli)
    for s, n in counts.items():
        expect = fr[s] * n
        assert abs(got.get(s, 0) - expect) <= max(10, 0.15 * n), (s, got.get(s), expect)
    # flattening: the rarest source keeps a larger share than the richest
    rich = max(counts, key=counts.get)
    rare = min(counts, key=counts.get)
    if counts[rare] < counts[rich]:
        assert fr[rare] >= fr[rich]


# ---------------------------------------------------------------------------
# top_k_per_group (r8): exact per-domain caps, plain vs salted equality
# ---------------------------------------------------------------------------

def test_top_k_per_group_matches_duckdb(spark):
    import duckdb
    import os

    from lakehouse_file_format_compare_spark.operators.sampling import (
        top_k_per_group,
    )
    from lakehouse_file_format_compare_spark.sources.testdata import table

    docs = table(spark, SF, "documents")
    got = sorted(
        (r["source"], r["doc_id"])
        for r in top_k_per_group(
            docs, ["source"], [F.col("n_chars").desc(), F.col("doc_id")], 7
        ).collect()
    )
    con = duckdb.connect()
    want = sorted(map(tuple, con.execute(f"""
        SELECT source, doc_id FROM (
            SELECT source, doc_id,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY n_chars DESC, doc_id) AS rn
            FROM read_parquet('{os.path.join(SF, "documents.parquet")}'))
        WHERE rn <= 7
    """).fetchall()))
    con.close()
    assert len(got) > 0 and got == want


def test_top_k_salted_equals_plain_and_handles_small_groups(spark):
    from lakehouse_file_format_compare_spark.operators.sampling import (
        top_k_per_group,
    )
    from lakehouse_file_format_compare_spark.sources.testdata import table

    docs = table(spark, SF, "documents")
    order = [F.col("n_chars").desc(), F.col("doc_id")]
    plain = sorted(map(tuple, top_k_per_group(docs, ["source"], order, 5).collect()))
    for buckets in (2, 7, 64):  # incl. buckets >> group size
        salted = sorted(map(tuple, top_k_per_group(
            docs, ["source"], order, 5, salt_buckets=buckets).collect()))
        assert salted == plain, buckets
    # k larger than every group: everything survives, both paths
    n = docs.count()
    assert top_k_per_group(docs, ["source"], order, 10**6).count() == n
    assert top_k_per_group(
        docs, ["source"], order, 10**6, salt_buckets=4).count() == n


def test_top_k_validation_and_plan(spark):
    import pytest as _pytest

    from lakehouse_file_format_compare_spark.operators.sampling import (
        top_k_per_group,
    )
    from lakehouse_file_format_compare_spark.sources.testdata import table

    docs = table(spark, SF, "documents")
    order = [F.col("n_chars").desc(), F.col("doc_id")]
    with _pytest.raises(ValueError):
        top_k_per_group(docs, ["source"], order, 0)
    with _pytest.raises(ValueError):
        top_k_per_group(docs, ["source"], order, 3, salt_buckets=1)
    df = top_k_per_group(docs, ["source"], order, 3)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    # Spark pushes the rank<=k filter into the sort
    assert "WindowGroupLimit" in plan
    assert "BatchEvalPython" not in plan


# ---------------------------------------------------------------------------
# weighted_sample (r8): A-ES without replacement, md5-derived uniforms
# ---------------------------------------------------------------------------

def test_weighted_sample_matches_duckdb(spark):
    import duckdb
    import os

    from lakehouse_file_format_compare_spark.operators.sampling import (
        weighted_sample,
    )
    from lakehouse_file_format_compare_spark.sources.testdata import table

    docs = table(spark, SF, "documents")
    # weight = n_chars: longer docs proportionally likelier
    got = sorted(
        r["doc_id"]
        for r in weighted_sample(docs, "n_chars", 40, ("doc_id",)).collect()
    )
    con = duckdb.connect()
    want = sorted(x[0] for x in con.execute(f"""
        SELECT doc_id FROM (
            SELECT doc_id,
                   floor(ln((CAST(('0x' || substr(md5('wsample' || chr(31) || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) + 0.5)
                            / 4294967296.0) / n_chars * 1000000 + 0.5) / 1000000 AS es_key
            FROM read_parquet('{os.path.join(SF, "documents.parquet")}')
            WHERE n_chars > 0)
        ORDER BY es_key DESC, doc_id LIMIT 40
    """).fetchall())
    con.close()
    assert len(got) == 40 and got == want


def test_weighted_sample_is_partition_invariant_and_weight_sensitive(spark):
    from lakehouse_file_format_compare_spark.operators.sampling import (
        weighted_sample,
    )
    from lakehouse_file_format_compare_spark.sources.testdata import table

    docs = table(spark, SF, "documents")
    a = sorted(r["doc_id"] for r in weighted_sample(docs, "n_chars", 25, ("doc_id",)).collect())
    b = sorted(r["doc_id"] for r in weighted_sample(
        docs.repartition(17), "n_chars", 25, ("doc_id",)).collect())
    assert a == b
    # heavy weights dominate: give every 50th doc a 1000x weight
    boosted = docs.withColumn(
        "w",
        F.when(F.col("doc_id") % 50 == 0, F.col("n_chars") * 1000.0)
        .otherwise(F.col("n_chars").cast("double")),
    )
    sel = [r["doc_id"] for r in weighted_sample(boosted, "w", 10, ("doc_id",)).collect()]
    assert sum(1 for d in sel if d % 50 == 0) >= 8, sel


def test_weighted_sample_excludes_nonpositive_and_validates(spark):
    import pytest as _pytest

    from lakehouse_file_format_compare_spark.operators.sampling import (
        weighted_sample,
    )

    df = spark.createDataFrame(
        [(1, 5.0), (2, 0.0), (3, -1.0), (4, None), (5, 2.0)],
        "doc_id long, w double",
    )
    got = {r["doc_id"] for r in weighted_sample(df, "w", 10, ("doc_id",)).collect()}
    assert got == {1, 5}
    with _pytest.raises(ValueError):
        weighted_sample(df, "w", 0, ("doc_id",))


def test_weighted_sample_plan_is_top_k(spark):
    from lakehouse_file_format_compare_spark.operators.sampling import (
        weighted_sample,
    )
    from lakehouse_file_format_compare_spark.sources.testdata import table

    docs = table(spark, SF, "documents")
    df = weighted_sample(docs, "n_chars", 10, ("doc_id",))
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan


# ---------------------------------------------------------------------------
# interleave_sources (r8): deterministic proportional curriculum order
# ---------------------------------------------------------------------------

def test_interleave_matches_duckdb_order(spark):
    import duckdb
    import os

    from lakehouse_file_format_compare_spark.operators.sampling import (
        interleave_sources,
    )
    from lakehouse_file_format_compare_spark.sources.testdata import table

    docs = table(spark, SF, "documents")
    got = [r["doc_id"] for r in interleave_sources(
        docs, "source", ("doc_id",)).select("doc_id").collect()]
    con = duckdb.connect()
    want = [x[0] for x in con.execute(f"""
        SELECT doc_id FROM (
            SELECT doc_id, source, md5(CAST(doc_id AS VARCHAR)) AS h,
                   floor(((row_number() OVER (PARTITION BY source
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 0.5)
                          / COUNT(*) OVER (PARTITION BY source)) * 1e9 + 0.5) / 1e9
                       AS progress
            FROM read_parquet('{os.path.join(SF, "documents.parquet")}'))
        ORDER BY progress, source, h, doc_id
    """).fetchall()]
    con.close()
    assert len(got) == len(want) > 0 and got == want


def test_interleave_is_structurally_proportional(spark):
    """At any prefix cut p, every source has contributed exactly
    floor/ceil(p * n_source) rows — proportionality by construction,
    and no long single-source runs."""
    import math

    from lakehouse_file_format_compare_spark.operators.sampling import (
        interleave_sources,
    )
    from lakehouse_file_format_compare_spark.sources.testdata import table

    docs = table(spark, SF, "documents")
    rows = interleave_sources(docs, "source", ("doc_id",)).select(
        "source", "progress"
    ).collect()
    sizes: dict = {}
    for r in rows:
        sizes[r["source"]] = sizes.get(r["source"], 0) + 1
    for p in (0.25, 0.5, 0.75):
        seen: dict = {}
        for r in rows:
            if r["progress"] <= p:
                seen[r["source"]] = seen.get(r["source"], 0) + 1
        for src, n in sizes.items():
            assert abs(seen.get(src, 0) - p * n) <= 1, (p, src, seen.get(src), n)


def test_interleave_partition_invariant(spark):
    from lakehouse_file_format_compare_spark.operators.sampling import (
        interleave_sources,
    )
    from lakehouse_file_format_compare_spark.sources.testdata import table

    docs = table(spark, SF, "documents")
    a = [r["doc_id"] for r in interleave_sources(
        docs, "source", ("doc_id",)).select("doc_id").collect()]
    b = [r["doc_id"] for r in interleave_sources(
        docs.repartition(13), "source", ("doc_id",)).select("doc_id").collect()]
    assert a == b


# ---------------------------------------------------------------------------
# leakage_safe_splits (r10): no near-dup pair may straddle a split
# boundary; weights honored at component granularity; stable under
# corpus growth; singleton behavior documented.
# ---------------------------------------------------------------------------


def _leak_fixture(spark):
    """60 docs, near-dup pairs forming chains of 3 (0-1-2, 10-11-12,
    ...): components are {3k, 3k+1, 3k+2} for k in the paired range,
    singletons elsewhere."""
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(60)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(3 * k, 3 * k + 1) for k in range(10)]
        + [(3 * k + 1, 3 * k + 2) for k in range(10)],
        "doc_a long, doc_b long",
    )
    return docs, pairs


@pytest.mark.parametrize("portable", [False, True])
def test_leakage_safe_no_pair_straddles_splits(spark, portable):
    """Both bucket hashes (xxhash64 production, md5 oracle-portable —
    r11) carry the identical guarantee."""
    from lakehouse_file_format_compare_spark.operators.sampling import (
        leakage_safe_splits,
    )

    docs, pairs = _leak_fixture(spark)
    out = leakage_safe_splits(
        docs, pairs, {"train": 0.7, "val": 0.15, "test": 0.15},
        portable=portable,
    )
    split_of = {r.doc_id: r.split for r in out.collect()}
    for a, b in [(r.doc_a, r.doc_b) for r in pairs.collect()]:
        assert split_of[a] == split_of[b], (a, b)
    # transitivity through the component: chain ends agree too
    for k in range(10):
        assert split_of[3 * k] == split_of[3 * k + 2]
    assert set(split_of.values()) <= {"train", "val", "test"}


def test_portable_bucket_matches_duckdb(spark):
    """The md5-prefix bucket is bit-replayable: DuckDB computes the
    identical bucket for the identical (tag, key, seed)."""
    import duckdb

    from lakehouse_file_format_compare_spark.operators.sampling import (
        _portable_bucket,
    )

    df = spark.createDataFrame(
        [(i,) for i in [0, 1, 7, 123456789, -5]], "canonical_id long"
    )
    got = {
        r.canonical_id: r.b
        for r in df.select(
            "canonical_id",
            _portable_bucket("leak_split", ("canonical_id",), 42).alias("b"),
        ).collect()
    }
    con = duckdb.connect()
    for cid, b in got.items():
        (want,) = con.execute(
            "SELECT CAST(('0x' || substr(md5('leak_split' || chr(31) || "
            f"CAST({cid} AS VARCHAR) || chr(31) || '42'), 1, 8)) AS BIGINT)"
            " % 10000"
        ).fetchone()
        assert b == want, (cid, b, want)


def test_leakage_safe_stable_under_growth(spark):
    """Adding new docs/pairs must not move any existing component's
    assignment (the per-key-hash contract, lifted to components) —
    as long as growth doesn't BRIDGE old components (a bridge merges
    two components and legitimately re-keys one side)."""
    from lakehouse_file_format_compare_spark.operators.sampling import (
        leakage_safe_splits,
    )
    from pyspark.sql import functions as F

    docs, pairs = _leak_fixture(spark)
    w = {"train": 0.7, "val": 0.15, "test": 0.15}
    before = {
        r.doc_id: r.split for r in leakage_safe_splits(docs, pairs, w).collect()
    }
    docs2 = docs.unionByName(
        spark.createDataFrame(
            [(i, f"text {i}") for i in range(100, 130)],
            "doc_id long, text string",
        )
    )
    pairs2 = pairs.unionByName(
        spark.createDataFrame([(100, 101)], "doc_a long, doc_b long")
    )
    after = {
        r.doc_id: r.split
        for r in leakage_safe_splits(docs2, pairs2, w).collect()
    }
    for d, s in before.items():
        assert after[d] == s, d


def test_leakage_safe_weights_roughly_honored(spark):
    """At component granularity the weights hold in expectation —
    with 600 singleton docs the 0.7/0.3 split lands well inside a
    loose band (keyed xxhash64 buckets, seed-fixed: deterministic)."""
    from lakehouse_file_format_compare_spark.operators.sampling import (
        leakage_safe_splits,
    )

    docs = spark.createDataFrame(
        [(i, "t") for i in range(600)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    out = leakage_safe_splits(docs, pairs, {"train": 0.7, "test": 0.3})
    n_train = out.where(out.split == "train").count()
    assert 0.6 * 600 < n_train < 0.8 * 600


# ---------------------------------------------------------------------------
# weighted_sample_topk (r11): Efraimidis-Spirakis A-ES without
# replacement — DuckDB bit-replay, weighted semantics, layout
# invariance, degenerate inputs.
# ---------------------------------------------------------------------------


def _ws_duck_sql(k: int, seed: int = 42, tag: str = "wsamp") -> str:
    return f"""
    SELECT o_orderkey, ws_key_nanos,
           row_number() OVER (ORDER BY ws_key_nanos, o_orderkey) AS ws_rank
    FROM (
        SELECT o_orderkey,
               CAST(floor(-ln((CAST(('0x' || substr(md5('{tag}' || chr(31)
                    || CAST(o_orderkey AS VARCHAR) || chr(31) || '{seed}'),
                    1, 13)) AS BIGINT) + 1) / 4503599627370496.0)
                    / o_totalprice * 1e9 + 0.5) AS BIGINT) AS ws_key_nanos
        FROM orders WHERE o_totalprice > 0
    ) ORDER BY ws_key_nanos, o_orderkey LIMIT {k}
    """


def test_weighted_sample_matches_duckdb(spark):
    import duckdb

    from lakehouse_file_format_compare_spark.operators.sampling import (
        weighted_sample_topk,
    )
    from lakehouse_file_format_compare_spark.sources.testdata import table
    from tests.conftest import SF_SMOKE

    orders = table(spark, SF_SMOKE, "orders")
    got = sorted(
        (r.o_orderkey, r.ws_key_nanos, r.ws_rank)
        for r in weighted_sample_topk(
            orders, "o_totalprice", 25, ("o_orderkey",)
        ).select("o_orderkey", "ws_key_nanos", "ws_rank").collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{SF_SMOKE}/orders.parquet')"
    )
    want = sorted(tuple(r) for r in con.execute(_ws_duck_sql(25)).fetchall())
    assert got == want


def test_weighted_sample_semantics(spark):
    from lakehouse_file_format_compare_spark.operators.sampling import (
        weighted_sample_topk,
    )

    df = spark.createDataFrame(
        [(i, 1e12 if i == 7 else (0.001 if i == 3 else 1.0))
         for i in range(40)] + [(100, 0.0), (101, -5.0)],
        "id long, w double",
    )
    out = weighted_sample_topk(df, "w", 10, ("id",))
    rows = out.collect()
    ids = [r.id for r in rows]
    assert len(ids) == len(set(ids)) == 10  # without replacement
    assert 7 in ids          # -ln(u)/1e12 ~ 0: giant weight always wins
    assert 100 not in ids and 101 not in ids  # non-positive dropped
    assert sorted(r.ws_rank for r in rows) == list(range(1, 11))
    # k > n: everything positive-weight comes back (ids 0..39)
    assert weighted_sample_topk(df, "w", 1000, ("id",)).count() == 40
    # layout invariance
    re_ids = {
        r.id
        for r in weighted_sample_topk(
            df.repartition(13, "w"), "w", 10, ("id",)
        ).collect()
    }
    assert re_ids == set(ids)


def test_weighted_sample_inclusion_tracks_weight(spark):
    """Across seeds, a weight-10 item is selected materially more
    often than a weight-1 item (the A-ES guarantee, checked
    statistically on a fixed seed set — deterministic, no flake)."""
    from lakehouse_file_format_compare_spark.operators.sampling import (
        weighted_sample_topk,
    )

    df = spark.createDataFrame(
        [(i, 10.0 if i == 0 else 1.0) for i in range(30)],
        "id long, w double",
    )
    hits_heavy = hits_light = 0
    for seed in range(20):
        ids = {
            r.id
            for r in weighted_sample_topk(
                df, "w", 5, ("id",), seed=seed
            ).collect()
        }
        hits_heavy += 0 in ids
        hits_light += 1 in ids
    assert hits_heavy > hits_light
    assert hits_heavy >= 12  # w=10 of total 39: P(sel) ~ 0.8+ at k=5


# ---------------------------------------------------------------------------
# upsample_mixture (r11): deterministic fractional replication — the
# upweighting half mixture_sample (drop-only) cannot express.
# ---------------------------------------------------------------------------


def test_upsample_mixture_matches_duckdb(spark):
    """Exact multiplicities replayed in DuckDB (portable bucket):
    factor 2.3 => every key twice plus a md5-bucketed 30% residual."""
    import duckdb

    from lakehouse_file_format_compare_spark.operators.sampling import (
        upsample_mixture,
    )
    from tests.conftest import SF_SMOKE

    docs = table(spark, SF_SMOKE, "documents")
    out = upsample_mixture(
        docs, "source", {"src0": 2.3, "src1": 0.0},
        key_cols=("doc_id",), portable=True,
    )
    got = sorted(
        (r.doc_id, r.copy_id)
        for r in out.select("doc_id", "copy_id").collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_SMOKE}/documents.parquet')"
    )
    want = sorted(
        tuple(r)
        for r in con.execute("""
        SELECT doc_id, unnest(generate_series(0, nc - 1)) AS copy_id
        FROM (
            SELECT doc_id,
                   CASE WHEN source = 'src1' THEN 0
                        WHEN source = 'src0' THEN 2 + CASE WHEN
                            CAST(('0x' || substr(md5('upsample' || chr(31)
                                 || CAST(doc_id AS VARCHAR) || chr(31)
                                 || '42'), 1, 8)) AS BIGINT) % 10000 < 3000
                            THEN 1 ELSE 0 END
                        ELSE 1 END AS nc
            FROM documents
        ) WHERE nc > 0
        """).fetchall()
    )
    assert got == want
    assert len(got) > docs.count()  # net upsample


def test_upsample_mixture_contracts(spark):
    from lakehouse_file_format_compare_spark.operators.sampling import (
        upsample_mixture,
    )
    from tests.conftest import SF_CORRECTNESS

    docs = table(spark, SF_CORRECTNESS, "documents")
    before = {
        r.source: r.n
        for r in docs.groupBy("source").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    out = upsample_mixture(
        docs, "source", {"src0": 3.0, "src1": 1.5}, key_cols=("doc_id",)
    )
    after = {
        r.source: r.n
        for r in out.groupBy("source").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    assert after["src0"] == 3 * before["src0"]  # integral factor exact
    assert 1.3 * before["src1"] < after["src1"] < 1.7 * before["src1"]
    unlisted = [s for s in before if s not in ("src0", "src1")]
    assert all(after[s] == before[s] for s in unlisted)
    # copies are distinct and per-key stable under subsetting
    trip = {
        (r.doc_id, r.copy_id)
        for r in out.where(F.col("source") == "src0")
        .select("doc_id", "copy_id").collect()
    }
    assert all((d, c) in trip for d, _ in trip for c in (0, 1, 2))
    sub = upsample_mixture(
        docs.where(F.col("doc_id") % 2 == 0), "source",
        {"src0": 3.0, "src1": 1.5}, key_cols=("doc_id",),
    )
    full_pairs = {
        (r.doc_id, r.copy_id)
        for r in out.select("doc_id", "copy_id").collect()
    }
    for r in sub.select("doc_id", "copy_id").collect():
        assert (r.doc_id, r.copy_id) in full_pairs


def test_weighted_sample_per_group(spark):
    """Per-group variant: exactly min(k, group size) rows per group,
    ranks 1..k, selections equal to running the global sampler on
    each group alone (same keys), and the plan carries the
    WindowGroupLimit pushdown (no group materializes whole)."""
    from lakehouse_file_format_compare_spark.operators.sampling import (
        weighted_sample_topk,
        weighted_sample_topk_per_group,
    )
    from tests.conftest import SF_SMOKE

    docs = table(spark, SF_SMOKE, "documents").withColumn(
        "w", (F.pmod("doc_id", F.lit(9)) + 1).cast("double")
    )
    out = weighted_sample_topk_per_group(
        docs, "w", 7, ("source",), ("doc_id",)
    )
    per = {
        r.source: r.n
        for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    sizes = {
        r.source: r.n
        for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert per == {s: min(7, n) for s, n in sizes.items()}
    # group-local equivalence to the global sampler
    some_source = sorted(sizes)[0]
    grp = {
        (r.doc_id, r.ws_rank)
        for r in out.where(F.col("source") == some_source)
        .select("doc_id", "ws_rank").collect()
    }
    solo = {
        (r.doc_id, r.ws_rank)
        for r in weighted_sample_topk(
            docs.where(F.col("source") == some_source), "w", 7, ("doc_id",)
        ).select("doc_id", "ws_rank").collect()
    }
    assert grp == solo
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "WindowGroupLimit" in plan


def test_upsample_mixture_rejects_runaway_factor(spark):
    from lakehouse_file_format_compare_spark.operators.sampling import (
        upsample_mixture,
    )
    from tests.conftest import SF_SMOKE

    docs = table(spark, SF_SMOKE, "documents")
    with pytest.raises(ValueError, match="1000x"):
        upsample_mixture(docs, "source", {"src0": 5000.0}, ("doc_id",))


TB_BUDGET = 1500

TOKEN_BUDGET_SQL = f"""
WITH keyed AS (
    SELECT source, doc_id, n_chars,
           md5('tbudget' || chr(31) || CAST(doc_id AS VARCHAR)) AS h
    FROM documents WHERE n_chars IS NOT NULL AND n_chars >= 0
), cum AS (
    SELECT source, doc_id, n_chars,
           SUM(n_chars) OVER (PARTITION BY source ORDER BY h, doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS c
    FROM keyed
)
SELECT source, doc_id, CAST(n_chars AS BIGINT) AS n_chars
FROM cum WHERE c - n_chars < {TB_BUDGET}
"""


def _token_budget(spark, sf_dir):
    from lakehouse_file_format_compare_spark.operators.sampling import (
        token_budget_sample,
    )

    docs = table(spark, sf_dir, "documents")
    return token_budget_sample(
        docs, TB_BUDGET, "n_chars", ("doc_id",), group_col="source"
    ).select("source", "doc_id", F.col("n_chars").cast("long").alias("n_chars"))


def test_token_budget_sample_oracle(spark):
    """r12: the md5-ordered cumulative selection replays exactly in
    DuckDB — the sample is a pure function of (keys, counts, budget)."""
    ok, msg = compare(spark, SF_CORRECTNESS, _token_budget, TOKEN_BUDGET_SQL)
    assert ok, msg


def test_token_budget_sample_contracts(spark):
    """Per group: the selection is doc-atomic (overflows by at most
    the last document), meets the budget unless the group ran out,
    and is partitioning-invariant."""
    from lakehouse_file_format_compare_spark.operators.sampling import (
        token_budget_sample,
    )

    docs = table(spark, SF_CORRECTNESS, "documents")
    sel = token_budget_sample(
        docs, TB_BUDGET, "n_chars", ("doc_id",), group_col="source"
    )
    got = sel.groupBy("source").agg(
        F.sum("n_chars").alias("tok"), F.max("n_chars").alias("mx")
    ).collect()
    group_tokens = {
        r.source: r.tot
        for r in docs.groupBy("source")
        .agg(F.sum("n_chars").alias("tot"))
        .collect()
    }
    assert got
    for r in got:
        # doc-atomic overflow bound
        assert r.tok < TB_BUDGET + r.mx
        # budget met unless the whole group fits under it
        if group_tokens[r.source] >= TB_BUDGET:
            assert r.tok >= TB_BUDGET
        else:
            assert r.tok == group_tokens[r.source]
    ids1 = sorted(r.doc_id for r in sel.select("doc_id").collect())
    sel2 = token_budget_sample(
        docs.repartition(7, "doc_id"), TB_BUDGET, "n_chars", ("doc_id",),
        group_col="source",
    )
    ids2 = sorted(r.doc_id for r in sel2.select("doc_id").collect())
    assert ids1 == ids2


def test_token_budget_priority_takes_best_first(spark):
    """priority_col (r12): greedy best-docs-until-budget — every
    selected doc's priority >= every unselected doc's priority within
    its group, modulo the single boundary doc the budget cut."""
    from lakehouse_file_format_compare_spark.operators.sampling import (
        token_budget_sample,
    )

    docs = table(spark, SF_CORRECTNESS, "documents").withColumn(
        "prio", F.pmod(F.xxhash64("text"), F.lit(1000))
    )
    sel = token_budget_sample(
        docs, TB_BUDGET, "n_chars", ("doc_id",), group_col="source",
        priority_col="prio",
    )
    sel_ids = {r.doc_id for r in sel.select("doc_id").collect()}
    rows = docs.select("source", "doc_id", "prio").collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append((r.prio, r.doc_id))
    for src, members in by_src.items():
        chosen = sorted(p for p, d in members if d in sel_ids)
        skipped = sorted(p for p, d in members if d not in sel_ids)
        if chosen and skipped:
            # at most ONE inversion depth: min(chosen) may equal the
            # boundary; everything above it must be chosen
            assert sum(1 for p in skipped if p > chosen[0]) == 0
    # determinism under repartition, with priority in play
    sel2 = token_budget_sample(
        docs.repartition(5, "doc_id"), TB_BUDGET, "n_chars", ("doc_id",),
        group_col="source", priority_col="prio",
    )
    assert sel_ids == {r.doc_id for r in sel2.select("doc_id").collect()}


EPOCH_SHUFFLE_SQL = """
SELECT doc_id,
       CAST(('0x' || substr(md5('epoch' || chr(31) || '3' || chr(31) || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 8 AS shard,
       substr(md5('epoch' || chr(31) || '3' || chr(31) || CAST(doc_id AS VARCHAR)), 9, 24) AS pos
FROM documents
"""


def _epoch_shuffled(spark, sf_dir):
    from lakehouse_file_format_compare_spark.operators.sampling import (
        epoch_shuffle,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id")
    return epoch_shuffle(docs, epoch=3, n_shards=8, key_cols=("doc_id",))


def test_epoch_shuffle_oracle(spark):
    ok, msg = compare(spark, SF_CORRECTNESS, _epoch_shuffled, EPOCH_SHUFFLE_SQL)
    assert ok, msg


def test_epoch_shuffle_contracts(spark):
    """Permutation (every row keeps exactly one (shard, pos) slot, no
    order-key collisions), near-uniform shards, and epochs are
    DIFFERENT permutations while each epoch is layout-deterministic."""
    from lakehouse_file_format_compare_spark.operators.sampling import (
        epoch_shuffle,
    )

    docs = table(spark, SF_CORRECTNESS, "documents").select("doc_id")
    n = docs.count()
    e3 = epoch_shuffle(docs, 3, 8, ("doc_id",))
    rows = e3.collect()
    assert len({(r.shard, r.pos, r.doc_id) for r in rows}) == n
    assert len({(r.shard, r.pos) for r in rows}) == n  # no slot collision
    sizes = [0] * 8
    for r in rows:
        sizes[r.shard] += 1
    assert min(sizes) > 0 and max(sizes) < 3 * (n // 8)
    order3 = [r.doc_id for r in sorted(rows, key=lambda r: (r.shard, r.pos))]
    rows4 = epoch_shuffle(docs, 4, 8, ("doc_id",)).collect()
    order4 = [r.doc_id for r in sorted(rows4, key=lambda r: (r.shard, r.pos))]
    assert sorted(order3) == sorted(order4)  # same membership
    assert order3 != order4  # different permutation per epoch
    rows3b = epoch_shuffle(
        docs.repartition(7), 3, 8, ("doc_id",)
    ).collect()
    assert sorted(map(tuple, rows3b)) == sorted(map(tuple, rows))
