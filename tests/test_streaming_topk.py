"""Streaming heavy-hitters (streaming/topk_stream.py): the
per-group Misra-Gries-style summary must (a) equal the batch exact
top-k on a single-batch drain, (b) equal an independent Python fold
of the same merge rule on a multi-batch replay, and (c) keep the MG
guarantee — a planted hitter above the bound is always present —
with O(k) state."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from lakehouse_file_format_compare_spark.sources.testdata import table
from lakehouse_file_format_compare_spark.streaming.stateful import (
    drain_available_now,
)
from lakehouse_file_format_compare_spark.streaming.topk_stream import (
    _order_key,
    merge_and_truncate,
    topk_stream,
)

from .conftest import SF_SMOKE

EVENTS_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string"
K = 5


def _drain(spark, df, name, tmp_path_factory):
    ckpt = str(tmp_path_factory.mktemp(f"ckpt_{name}"))
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    drain_available_now(q)
    return spark.table(name)


def _final(updates):
    """Max-emit_seq summary per group (window, not self-join — a
    memory-sink self-join trips conflicting-reference resolution)."""
    from pyspark.sql import Window

    w = Window.partitionBy("grp")
    return (
        updates.withColumn("__m", F.max("emit_seq").over(w))
        .where(F.col("emit_seq") == F.col("__m"))
        .drop("__m")
    )


@pytest.fixture(scope="module")
def sliced_events_src(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("ev_topk_sliced"))
    ev = table(spark, SF_SMOKE, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    for i in range(5):
        (
            ev.where(F.pmod(F.xxhash64("event_id"), F.lit(5)) == i)
            .coalesce(1)
            .write.mode("append")
            .parquet(src)
        )
        time.sleep(0.05)
    return src


def _python_fold(batches, k):
    """Independent reference: the documented per-batch rule."""
    state: dict = {}
    for rows in batches:
        counts: dict = {}
        for grp, item in rows:
            counts.setdefault(grp, {})
            counts[grp][item] = counts[grp].get(item, 0) + 1
        for grp, cmap in counts.items():
            smap, bound, n = state.get(grp, ({}, 0, 0))
            ordered = sorted(cmap.items(), key=_order_key)
            kept = dict(ordered[:k])
            bbound = ordered[k][1] if len(ordered) > k else 0
            smap, extra = merge_and_truncate(smap, kept, k)
            state[grp] = (smap, bound + bbound + extra, n + sum(cmap.values()))
    return state


def test_single_batch_equals_exact_topk(spark, tmp_path_factory):
    """One micro-batch == the whole table: the streaming summary must
    equal the exact batch top-k (counts exact, bound = rank-k+1)."""
    ev = table(spark, SF_SMOKE, "events")
    src_dir = str(tmp_path_factory.mktemp("ev_topk_single"))
    ev.select("event_id", "ts", "user_id", "event_type").coalesce(1).write.mode(
        "overwrite"
    ).parquet(src_dir)
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(src_dir)
    out = _final(_drain(spark, topk_stream(stream, K), "topk_single", tmp_path_factory))
    got = {
        (r["grp"], r["rank"]): (r["item"], r["lower_bound"])
        for r in out.collect()
    }
    import duckdb
    import os

    con = duckdb.connect()
    want = con.execute(f"""
        SELECT event_type, rn, CAST(user_id AS VARCHAR), cnt FROM (
            SELECT event_type, user_id, COUNT(*) AS cnt,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY COUNT(*) DESC,
                                               CAST(user_id AS VARCHAR)) AS rn
            FROM read_parquet('{os.path.join(SF_SMOKE, "events.parquet")}')
            GROUP BY 1, 2)
        WHERE rn <= {K}
    """).fetchall()
    con.close()
    assert len(want) > 0
    for grp, rn, item, cnt in want:
        assert got[(grp, rn)] == (item, cnt), (grp, rn)


def test_multi_batch_equals_python_fold(spark, sliced_events_src, tmp_path_factory):
    """5-batch replay == the independent Python fold of the same
    merge rule over the same batch boundaries (file order)."""
    import os

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(sliced_events_src)
    )
    out = _final(_drain(spark, topk_stream(stream, K), "topk_multi", tmp_path_factory))
    got = {
        r["grp"]: (
            r["rank"], r["item"], r["lower_bound"], r["bound_total"], r["n_rows"]
        )
        for r in out.where(F.col("rank") == 1).collect()
    }
    got_full = {}
    for r in out.collect():
        got_full.setdefault(r["grp"], {})[r["item"]] = r["lower_bound"]

    # replay in the order the file stream consumes: modification time
    # (the fixture sleeps between writes to make mtimes distinct)
    files = sorted(
        (
            os.path.join(sliced_events_src, f)
            for f in os.listdir(sliced_events_src)
            if f.endswith(".parquet")
        ),
        key=os.path.getmtime,
    )
    import duckdb

    con = duckdb.connect()
    batches = []
    for f in files:
        batches.append(con.execute(
            f"SELECT event_type, CAST(user_id AS VARCHAR) FROM read_parquet('{f}') ORDER BY event_id"
        ).fetchall())
    con.close()
    want = _python_fold(batches, K)
    assert set(got_full) == set(want)
    for grp, (smap, bound, n) in want.items():
        assert got_full[grp] == smap, grp
        assert got[grp][3] == bound and got[grp][4] == n, grp


def test_planted_hitter_guarantee_and_state_bounded(spark, tmp_path_factory):
    """A hitter above bound_total must be present in the final
    summary (MG guarantee) even when each batch buries it mid-pack;
    and the summary never exceeds k rows per group."""
    src_dir = str(tmp_path_factory.mktemp("ev_topk_planted"))
    rows = []
    eid = 0
    for b in range(4):
        for _ in range(6):
            rows.append((eid, "g", "hot")); eid += 1
        for j in range(40):
            rows.append((eid, "g", f"b{b}_{j % 20}")); eid += 1
    df = spark.createDataFrame(rows, "event_id long, grp string, item string")
    for b in range(4):
        df.where((F.col("event_id") >= b * 46) & (F.col("event_id") < (b + 1) * 46)) \
            .coalesce(1).write.mode("append").parquet(src_dir)
        time.sleep(0.05)
    stream = (
        spark.readStream.schema("event_id long, grp string, item string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    out = _final(_drain(
        spark,
        topk_stream(stream, 3, group_col="grp", item_col="item"),
        "topk_planted", tmp_path_factory,
    ))
    rows = out.collect()
    assert 0 < len(rows) <= 3  # O(k) summary
    by_item = {r["item"]: r for r in rows}
    hot_true = 24
    bound = rows[0]["bound_total"]
    if hot_true > bound:
        assert "hot" in by_item
        assert by_item["hot"]["lower_bound"] <= hot_true
        assert hot_true <= by_item["hot"]["lower_bound"] + bound
    assert all(r["n_rows"] == 184 for r in rows)


def test_validation(spark):
    ev = table(spark, SF_SMOKE, "events")
    with pytest.raises(ValueError):
        topk_stream(ev, 0)


def test_null_items_are_counted_exactly(spark, tmp_path_factory):
    """r9 (r8 advisor): value_counts() silently dropped null items
    while batch_n counted their rows, so 'rows are counted EXACTLY'
    was violated on null-bearing streams. Nulls are now a real item
    (dropna=False), tie-breaking NULLS FIRST like Spark's batch
    window — the summary must match the batch operator, which keeps
    null keys."""
    src_dir = str(tmp_path_factory.mktemp("ev_topk_nulls"))
    rows = (
        [(i, "a", "x") for i in range(6)]
        + [(i + 10, "a", None) for i in range(4)]  # 4 null items
        + [(i + 20, "a", "y") for i in range(4)]   # tie with null on 4
        + [(i + 30, "b", None) for i in range(3)]
    )
    df = spark.createDataFrame(rows, "event_id long, grp string, item string")
    df.coalesce(1).write.mode("overwrite").parquet(src_dir)
    stream = spark.readStream.schema(
        "event_id long, grp string, item string"
    ).parquet(src_dir)
    out = _final(
        _drain(
            spark,
            topk_stream(stream, 3, group_col="grp", item_col="item"),
            "topk_nulls",
            tmp_path_factory,
        )
    )
    got = {
        (r["grp"], r["rank"]): (r["item"], r["lower_bound"], r["n_rows"])
        for r in out.collect()
    }
    # group a: x=6, null=4, y=4 -> null outranks y (NULLS FIRST tie)
    assert got[("a", 1)] == ("x", 6, 14)
    assert got[("a", 2)] == (None, 4, 14)
    assert got[("a", 3)] == ("y", 4, 14)
    # group b: only nulls; n_rows counts them
    assert got[("b", 1)] == (None, 3, 3)

    # cross-check against the batch operator on the same frame
    from lakehouse_file_format_compare_spark.operators.sketches import (
        topk_partial_summaries,
    )

    batch = {
        r["grp"]: r
        for r in topk_partial_summaries(df, ["grp"], "item", k=3).collect()
    }
    assert batch["a"]["n_rows"] == 14 and batch["b"]["n_rows"] == 3
    a_items = [(it["rank"], it["item"], it["cnt"]) for it in batch["a"]["items"]]
    assert a_items == [(1, "x", 6), (2, None, 4), (3, "y", 4)]
