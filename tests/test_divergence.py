"""Distribution-shift reporting (operators/divergence.py): exact
DuckDB replay of the per-source token divergence and PSI reports,
pure-Python reference equality on a hand corpus, the
self-divergence-zero identity, a planted-shift contract, and plan
pins (no Python UDFs, one corpus-sized tokenization pass)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from lakehouse_file_format_compare_spark.operators.divergence import (
    PSI_ALPHA,
    PSI_BINS,
    psi_report,
    token_divergence_report,
)
from lakehouse_file_format_compare_spark.sources.testdata import table
from tests.conftest import SF_SMOKE
from tests.oracle import compare

TOKEN_DIVERGENCE_SQL = r"""
WITH gw AS (
    SELECT source, word, CAST(COUNT(*) AS BIGINT) AS c FROM (
        SELECT source,
               unnest(string_split_regex(lower(trim(text)), '\s+')) AS word
        FROM documents)
    WHERE length(word) > 0
    GROUP BY source, word
), gl AS (
    SELECT word, CAST(SUM(c) AS BIGINT) AS cw FROM gw GROUP BY word
), pg AS (
    SELECT source, CAST(SUM(c) AS BIGINT) AS ng,
           CAST(COUNT(*) AS BIGINT) AS vocab_terms
    FROM gw GROUP BY source
), gr AS (
    SELECT CAST(SUM(c) AS BIGINT) AS nn FROM gw
), t0 AS (
    SELECT gw.source, gw.word, pg.ng, pg.vocab_terms,
           CAST(gw.c AS DOUBLE) / pg.ng AS p,
           CAST(gl.cw AS DOUBLE) / gr.nn AS q,
           CAST(gw.c AS DOUBLE) AS cd
    FROM gw JOIN gl USING (word) JOIN pg USING (source) CROSS JOIN gr
), terms AS (
    SELECT source, word, ng, vocab_terms,
           CAST(floor((p * ln(p / q)) * 1000000000 + 0.5) AS BIGINT) AS klt,
           CAST(floor((p / 2 * ln(p / ((p + q) / 2)) + q / 2 * ln(q / ((p + q) / 2))) * 1000000000 + 0.5) AS BIGINT) AS jst,
           CAST(floor(abs(p - q) * 1000000000 + 0.5) AS BIGINT) AS tvt,
           CAST(floor(((cd - ng * q) * (cd - ng * q) / (ng * q)) * 1000000 + 0.5) AS BIGINT) AS cht,
           CAST(floor(q * 1000000000 + 0.5) AS BIGINT) AS cvt,
           CAST(floor((-(p * ln(p))) * 1000000000 + 0.5) AS BIGINT) AS ent
    FROM t0
), ranked AS (
    SELECT *, row_number() OVER (PARTITION BY source ORDER BY klt DESC, word) AS rn
    FROM terms
), agg AS (
    SELECT source, MAX(ng) AS n_tokens, MAX(vocab_terms) AS vocab_terms,
           CAST(SUM(klt) AS BIGINT) AS kl_nanos,
           CAST(SUM(jst) AS BIGINT) AS js_nanos,
           CAST(SUM(tvt) AS BIGINT) AS tv_nanos,
           CAST(SUM(cht) AS BIGINT) AS chi2_micros,
           CAST(SUM(cvt) AS BIGINT) AS cov_nanos,
           CAST(SUM(ent) AS BIGINT) AS ent_nanos,
           MAX(CASE WHEN rn = 1 THEN word END) AS top_word
    FROM ranked GROUP BY source
)
SELECT source, n_tokens, vocab_terms,
       floor((cov_nanos / 1000000000) * 1000000 + 0.5) / 1000000 AS coverage,
       floor((kl_nanos / 1000000000) * 1000000 + 0.5) / 1000000 AS kl,
       floor((js_nanos / 1000000000 + ln(2.0) / 2 * (1 - cov_nanos / 1000000000)) * 1000000 + 0.5) / 1000000 AS js,
       floor(((tv_nanos / 1000000000 + (1 - cov_nanos / 1000000000)) / 2) * 1000000 + 0.5) / 1000000 AS tv,
       floor((chi2_micros / 1000000 + n_tokens * (1 - cov_nanos / 1000000000)) * 10000 + 0.5) / 10000 AS chi2,
       floor((ent_nanos / 1000000000) * 1000000 + 0.5) / 1000000 AS entropy,
       floor((CAST(vocab_terms AS DOUBLE) / n_tokens) * 1000000 + 0.5) / 1000000 AS ttr,
       top_word
FROM agg
"""

PSI_SQL = f"""
WITH base AS (
    SELECT source, CAST(n_chars AS BIGINT) AS v FROM documents
    WHERE n_chars IS NOT NULL
), bounds AS (
    SELECT MIN(v) AS mn, MAX(v) AS mx FROM base
), binned AS (
    SELECT source, ((v - mn) * {PSI_BINS}) // (mx - mn + 1) AS bin
    FROM base CROSS JOIN bounds
), gb AS (
    SELECT source, bin, CAST(COUNT(*) AS BIGINT) AS c
    FROM binned GROUP BY source, bin
), groups AS (
    SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM gb GROUP BY source
), dense AS (
    SELECT g.source, g.n, b.bin, COALESCE(gb.c, 0) AS c
    FROM groups g
    CROSS JOIN (SELECT unnest(generate_series(0, {PSI_BINS - 1})) AS bin) b
    LEFT JOIN gb ON gb.source = g.source AND gb.bin = b.bin
), gbl AS (
    SELECT bin, CAST(SUM(c) AS BIGINT) AS cb FROM gb GROUP BY bin
), grand AS (
    SELECT CAST(SUM(c) AS BIGINT) AS nn FROM gb
), t AS (
    SELECT d.source, d.n,
           (d.c + {PSI_ALPHA}) / (d.n + {PSI_ALPHA} * {PSI_BINS}) AS p,
           (gbl.cb + {PSI_ALPHA}) / (grand.nn + {PSI_ALPHA} * {PSI_BINS}) AS q
    FROM dense d JOIN gbl USING (bin) CROSS JOIN grand
), agg AS (
    SELECT source, MAX(n) AS n,
           CAST(SUM(CAST(floor(((p - q) * ln(p / q)) * 1000000000 + 0.5) AS BIGINT)) AS BIGINT) AS psi_nanos
    FROM t GROUP BY source
)
SELECT source, n, floor((psi_nanos / 1000000000) * 1000000 + 0.5) / 1000000 AS psi
FROM agg
"""


def test_token_divergence_matches_duckdb(spark):
    ok, msg = compare(
        spark,
        SF_SMOKE,
        lambda s, d: token_divergence_report(table(s, d, "documents"), "source"),
        TOKEN_DIVERGENCE_SQL,
    )
    assert ok, msg


def test_psi_matches_duckdb(spark):
    ok, msg = compare(
        spark,
        SF_SMOKE,
        lambda s, d: psi_report(table(s, d, "documents"), "source", "n_chars"),
        PSI_SQL,
    )
    assert ok, msg


def test_single_group_divergence_is_zero(spark):
    """A group that IS the corpus has zero divergence by identity:
    p == q for every word, coverage 1."""
    docs = table(spark, SF_SMOKE, "documents").withColumn("g", F.lit("all"))
    row = token_divergence_report(docs, "g").collect()[0]
    assert row["coverage"] == pytest.approx(1.0, abs=1e-6)
    for col in ("kl", "js", "tv"):
        assert row[col] == pytest.approx(0.0, abs=1e-6), col
    assert row["chi2"] == pytest.approx(0.0, abs=1e-3)
    psi_row = psi_report(docs, "g", "n_chars").collect()[0]
    assert psi_row["psi"] == pytest.approx(0.0, abs=1e-6)


def _hand_corpus(spark):
    rows = [
        (0, "a a a b", "base"),
        (1, "a b b c", "base"),
        (2, "zq zq zq a", "shift"),
        (3, "zq zq c c", "shift"),
        (4, "a b c a", "other"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, g string")


def test_divergence_matches_pure_python_reference(spark):
    """Independent textbook KL/JS/TV/chi2 on a hand corpus (no
    DuckDB, no nano-snapping beyond output tolerance)."""
    docs = _hand_corpus(spark)
    got = {r["g"]: r for r in token_divergence_report(docs, "g").collect()}

    corpus = {}
    groups = {}
    for _, text, g in docs.collect():
        for w in text.lower().split():
            corpus[w] = corpus.get(w, 0) + 1
            groups.setdefault(g, {})[w] = groups.setdefault(g, {}).get(w, 0) + 1
    nn = sum(corpus.values())
    for g, cnt in groups.items():
        ng = sum(cnt.values())
        kl = js = tv = chi2 = cov = ent = 0.0
        for w, c in cnt.items():
            p, q = c / ng, corpus[w] / nn
            kl += p * math.log(p / q)
            ent += -p * math.log(p)
            m = (p + q) / 2
            js += p / 2 * math.log(p / m) + q / 2 * math.log(q / m)
            tv += abs(p - q)
            chi2 += (c - ng * q) ** 2 / (ng * q)
            cov += q
        js += math.log(2) / 2 * (1 - cov)
        tv = (tv + (1 - cov)) / 2
        chi2 += ng * (1 - cov)
        row = got[g]
        assert row["n_tokens"] == ng
        assert row["vocab_terms"] == len(cnt)
        assert row["coverage"] == pytest.approx(cov, abs=1e-5)
        assert row["kl"] == pytest.approx(kl, abs=1e-5)
        assert row["js"] == pytest.approx(js, abs=1e-5)
        assert row["tv"] == pytest.approx(tv, abs=1e-5)
        assert row["chi2"] == pytest.approx(chi2, abs=1e-3)
        assert row["entropy"] == pytest.approx(ent, abs=1e-5)
        assert row["ttr"] == pytest.approx(len(cnt) / ng, abs=1e-5)
    # the shifted group's most distinctive word is the planted one
    assert got["shift"]["top_word"] == "zq"
    # and it diverges more than either in-distribution group
    assert got["shift"]["kl"] > got["base"]["kl"]
    assert got["shift"]["kl"] > got["other"]["kl"]
    # JS is bounded by ln 2; TV by 1
    for row in got.values():
        assert 0.0 <= row["js"] <= math.log(2) + 1e-9
        assert 0.0 <= row["tv"] <= 1.0 + 1e-9


def test_planted_numeric_shift_moves_psi(spark):
    """A group whose values sit in the top of the range has a much
    larger PSI than groups drawn like the overall distribution."""
    rows = [(i, "u%d" % (i % 3), i % 100) for i in range(300)]
    rows += [(1000 + i, "hot", 90 + i % 10) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, g string, v long")
    got = {r["g"]: r["psi"] for r in psi_report(df, "g", "v").collect()}
    # the planted group is far past the classic 0.2 "investigate" bar;
    # the uniform groups only diverge because the hot group skews the
    # GLOBAL distribution they are compared against (25% of the rows),
    # and they do so identically and far less
    assert got["hot"] > 1.0
    assert got["u0"] == got["u1"] == got["u2"]
    assert got["u0"] < got["hot"] / 5


def test_null_and_empty_text_are_excluded(spark):
    docs = spark.createDataFrame(
        [(0, "a b", "g1"), (1, None, "g1"), (2, "   ", "g1"), (3, "a", "g2")],
        "doc_id long, text string, g string",
    )
    rows = {r["g"]: r for r in token_divergence_report(docs, "g").collect()}
    assert rows["g1"]["n_tokens"] == 2
    assert rows["g2"]["n_tokens"] == 1
    psi_rows = psi_report(
        docs.withColumn("v", F.when(F.col("doc_id") < 3, F.col("doc_id"))),
        "g",
        "v",
    ).collect()
    # doc 3's null v is excluded -> g2 has no rows at all
    assert {r["g"] for r in psi_rows} == {"g1"}
    assert next(r["n"] for r in psi_rows) == 3


def test_divergence_plan_shape(spark):
    """No Python in the path; the corpus is tokenized in ONE scan
    (global counts / totals re-aggregate the count table); the only
    window partitions by group; PSI reads the pruned 2-column scan."""
    def fmt(df):
        return df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )

    docs = table(spark, SF_SMOKE, "documents")
    df = token_divergence_report(docs, "source")
    df.collect()  # AQE exchange reuse is a RUNTIME property: pin the final plan
    plan = fmt(df)
    assert "isFinalPlan=true" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    # the (group, word) count shuffle is the ONLY corpus-sized stage;
    # global counts, per-group totals and the grand total all REUSE it
    # (gw has 4 downstream consumers -> >= 3 ReusedExchange nodes), so
    # the corpus is scanned + tokenized exactly once at runtime
    assert plan.count("ReusedExchange") >= 3, plan

    psi_df = psi_report(docs, "source", "n_chars")
    psi_df.collect()
    psi_plan = fmt(psi_df)
    assert "isFinalPlan=true" in psi_plan
    assert "BatchEvalPython" not in psi_plan
    # the (group, bin) count shuffle is reused by groups/dense/global/
    # grand consumers; only the bounds agg reads the corpus again
    # (pruned to the two needed columns)
    assert psi_plan.count("ReusedExchange") >= 3, psi_plan
    assert "ReadSchema: struct<source:string,n_chars:bigint>" in psi_plan.replace("\n", "")


# ---------------------------------------------------------------------------
# Streaming drift monitor (windowed PSI vs a static baseline)
# ---------------------------------------------------------------------------

from lakehouse_file_format_compare_spark.operators.divergence import (  # noqa: E402
    baseline_histogram,
    psi_from_window_counts,
    windowed_bin_counts,
    windowed_psi_vs_baseline,
)

WINDOWED_PSI_SQL = f"""
WITH b AS (
    SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS v FROM events
    WHERE value IS NOT NULL
), bounds AS (
    SELECT MIN(v) AS mn, MAX(v) AS mx FROM b
), bh0 AS (
    SELECT ((v - mn) * {PSI_BINS}) // (mx - mn + 1) AS bin, CAST(COUNT(*) AS BIGINT) AS cb
    FROM b CROSS JOIN bounds GROUP BY 1
), bh AS (
    SELECT g.bin, COALESCE(bh0.cb, 0) AS cb
    FROM (SELECT unnest(generate_series(0, {PSI_BINS - 1})) AS bin) g
    LEFT JOIN bh0 USING (bin)
), tot AS (
    SELECT CAST(SUM(cb) AS BIGINT) AS nn FROM bh0
), wc AS (
    SELECT time_bucket(INTERVAL 10 MINUTE, ts) AS ws,
           LEAST(GREATEST(((CAST(floor(value * 100 + 0.5) AS BIGINT) - mn) * {PSI_BINS}) // (mx - mn + 1), 0), {PSI_BINS - 1}) AS bin,
           CAST(COUNT(*) AS BIGINT) AS c
    FROM events CROSS JOIN bounds WHERE value IS NOT NULL GROUP BY 1, 2
), wins AS (
    SELECT ws, CAST(SUM(c) AS BIGINT) AS n FROM wc GROUP BY 1
), dense AS (
    SELECT w.ws, w.n, g.bin, COALESCE(wc.c, 0) AS c
    FROM wins w
    CROSS JOIN (SELECT unnest(generate_series(0, {PSI_BINS - 1})) AS bin) g
    LEFT JOIN wc ON wc.ws = w.ws AND wc.bin = g.bin
), t AS (
    SELECT ws, n,
           (c + {PSI_ALPHA}) / (n + {PSI_ALPHA} * {PSI_BINS}) AS p,
           (cb + {PSI_ALPHA}) / (tot.nn + {PSI_ALPHA} * {PSI_BINS}) AS q
    FROM dense JOIN bh USING (bin) CROSS JOIN tot
), agg AS (
    SELECT ws, MAX(n) AS n,
           CAST(SUM(CAST(floor(((p - q) * ln(p / q)) * 1000000000 + 0.5) AS BIGINT)) AS BIGINT) AS psi_nanos
    FROM t GROUP BY 1
)
SELECT ws AS window_start, ws + INTERVAL 10 MINUTE AS window_end, n, psi_nanos,
       floor((psi_nanos / 1000000000) * 1000000 + 0.5) / 1000000 AS psi
FROM agg
"""


def _events_drift(s, d):
    ev = table(s, d, "events")
    return windowed_psi_vs_baseline(ev, ev)


def test_windowed_psi_matches_duckdb(spark):
    ok, msg = compare(spark, SF_SMOKE, _events_drift, WINDOWED_PSI_SQL)
    assert ok, msg


def test_planted_drift_window_spikes_psi(spark):
    """Baseline uniform over 0..99; one stream window mirrors it, the
    other is pinned at the top of the range -> its PSI explodes."""
    base = spark.createDataFrame(
        [(i, float(i % 100)) for i in range(1000)], "id long, value double"
    )
    ev = spark.createDataFrame(
        [("2024-01-01 10:0%d:00" % (i % 10), float(i % 100)) for i in range(200)]
        + [("2024-01-01 11:0%d:00" % (i % 10), 99.0) for i in range(200)],
        "ts_s string, value double",
    ).select(F.col("ts_s").cast("timestamp").alias("ts"), "value")
    rows = {
        r["window_start"].hour: r["psi"]
        for r in windowed_psi_vs_baseline(
            ev, base, window_duration="60 minutes"
        ).collect()
    }
    assert rows[11] > 1.0
    assert rows[10] < 0.1
    assert rows[11] > 10 * rows[10]


def test_out_of_range_values_clamp_to_edge_bins(spark):
    """Stream values beyond the baseline range cannot crash the
    monitor: they clamp into bins 0 / B-1 and every row is counted."""
    base = spark.createDataFrame(
        [(i, float(i)) for i in range(100)], "id long, value double"
    )
    ev = spark.createDataFrame(
        [("2024-01-01 10:00:00", -500.0), ("2024-01-01 10:01:00", 1e6),
         ("2024-01-01 10:02:00", 50.0)],
        "ts_s string, value double",
    ).select(F.col("ts_s").cast("timestamp").alias("ts"), "value")
    bounds, _hist = baseline_histogram(base, "value")
    wc = windowed_bin_counts(ev, bounds).collect()
    assert sum(r["c"] for r in wc) == 3
    bins = {r["bin"] for r in wc}
    assert 0 in bins and (PSI_BINS - 1) in bins


def test_windowed_counts_streaming_matches_batch(spark, tmp_path_factory):
    """The bin-count stage is the streaming piece: run it under
    readStream (file source, multi-file, complete mode) and the
    drained counts — and the PSI computed from them — must equal the
    batch plan on the same data."""
    from lakehouse_file_format_compare_spark.streaming.stateful import (
        drain_available_now,
    )

    src = str(tmp_path_factory.mktemp("drift_src"))
    full = table(spark, SF_SMOKE, "events")
    full.where(F.col("user_id") % 2 == 0).select("ts", "value").write.mode(
        "overwrite"
    ).parquet(src)
    full.where(F.col("user_id") % 2 == 1).select("ts", "value").write.mode(
        "append"
    ).parquet(src)

    baseline = full.select("value")
    bounds, hist = baseline_histogram(baseline, "value")

    stream = (
        spark.readStream.schema("ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    wc_stream = windowed_bin_counts(
        stream.withWatermark("ts", "1 hour"), bounds
    )
    ckpt = str(tmp_path_factory.mktemp("drift_ckpt"))
    q = (
        wc_stream.writeStream.format("memory")
        .queryName("drift_wc")
        .option("checkpointLocation", ckpt)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    drain_available_now(q)
    drained = spark.table("drift_wc")

    batch_psi = sorted(
        tuple(r)
        for r in windowed_psi_vs_baseline(
            spark.read.parquet(src), baseline
        ).collect()
    )
    stream_psi = sorted(
        tuple(r) for r in psi_from_window_counts(drained, hist).collect()
    )
    assert stream_psi == batch_psi
    assert len(stream_psi) > 1
    spark.catalog.dropTempView("drift_wc")


def test_psi_from_group_counts_equals_row_grain(spark):
    """r12: the count-weighted PSI over pre-aggregated (group, value,
    count) rows is bit-identical to psi_nanos on the row-grain input
    — counts are additive, so a drained store serves the same PSI."""
    from lakehouse_file_format_compare_spark.operators.divergence import (
        psi_from_group_counts,
        psi_nanos,
    )

    rows = table(spark, SF_SMOKE, "documents").select(
        F.col("source").alias("g"),
        (F.xxhash64("text") % 40).alias("v"),
    )
    want = sorted(
        tuple(r) for r in psi_nanos(rows, "g", "v").collect()
    )
    agg = rows.groupBy("g", "v").agg(F.count(F.lit(1)).alias("c"))
    got = sorted(
        tuple(r)
        for r in psi_from_group_counts(agg, "g", "v", "c").collect()
    )
    assert got == want and len(got) > 1
    # zero/negative counts are invisible, like absent rows
    padded = agg.unionByName(
        agg.limit(1).select("g", (F.col("v") + 1000).alias("v"), F.lit(0).alias("c"))
    )
    got2 = sorted(
        tuple(r)
        for r in psi_from_group_counts(padded, "g", "v", "c").collect()
    )
    assert got2 == want
