"""Property-based tests (hypothesis) for the merge operator — the
engine's most semantics-critical primitive (SURVEY §7.3 'merge
semantics parity' risk): idempotency, key uniqueness, policy
invariants over arbitrary key/timestamp collision patterns."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from lakehouse_file_format_compare_spark.operators.merge import keep_latest, merge

ROW = st.tuples(
    st.integers(min_value=0, max_value=5),    # key (dense → collisions)
    st.integers(min_value=0, max_value=100),  # version/timestamp
    st.integers(min_value=-10, max_value=10), # payload
)
ROWS = st.lists(ROW, min_size=0, max_size=12)

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def _df(spark, rows):
    return spark.createDataFrame(rows or [(0, 0, 0)], "k long, v long, p long").where(
        F.lit(bool(rows))
    )


@given(target=ROWS, staging=ROWS)
@settings(**_SETTINGS)
def test_upsert_properties(spark, target, staging):
    t = _df(spark, target)
    s = keep_latest(_df(spark, staging), ["k"], ["v", "p"])
    merged = merge(t, s, keys=["k"], policy="upsert")
    got = {r["k"]: (r["v"], r["p"]) for r in merged.collect()}

    t_map = {}
    for k, v, p in target:
        t_map[k] = None  # presence only; duplicates in target stay as-is
    s_map = {}
    for k, v, p in staging:
        if k not in s_map or (v, p) > s_map[k]:
            s_map[k] = (v, p)

    # staging rows win on collision; target-only keys survive
    for k, vp in s_map.items():
        assert got[k] == vp
    assert set(got) == set(t_map) | set(s_map)
    # idempotency: re-merging the same staging changes nothing
    again = merge(merged, s, keys=["k"], policy="upsert")
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, merged.collect()))


@given(target=ROWS, staging=ROWS)
@settings(**_SETTINGS)
def test_insert_only_properties(spark, target, staging):
    t = keep_latest(_df(spark, target), ["k"], ["v", "p"])
    s = keep_latest(_df(spark, staging), ["k"], ["v", "p"])
    merged = merge(t, s, keys=["k"], policy="insert_only")
    got = {r["k"]: (r["v"], r["p"]) for r in merged.collect()}
    t_map = {r["k"]: (r["v"], r["p"]) for r in t.collect()}
    s_map = {r["k"]: (r["v"], r["p"]) for r in s.collect()}
    # existing keys untouched, new keys inserted
    for k, vp in t_map.items():
        assert got[k] == vp
    for k, vp in s_map.items():
        if k not in t_map:
            assert got[k] == vp
    assert set(got) == set(t_map) | set(s_map)


@given(rows=ROWS)
@settings(**_SETTINGS)
def test_keep_latest_properties(spark, rows):
    out = keep_latest(_df(spark, rows), ["k"], ["v", "p"]).collect()
    got = {r["k"]: (r["v"], r["p"]) for r in out}
    assert len(out) == len(got), "keep_latest left duplicate keys"
    want = {}
    for k, v, p in rows:
        if k not in want or (v, p) > want[k]:
            want[k] = (v, p)
    assert got == want


CHUNK_CASE = st.tuples(
    st.integers(min_value=0, max_value=90),   # token count
    st.integers(min_value=2, max_value=20),   # chunk_tokens
    st.integers(min_value=0, max_value=19),   # overlap (< chunk enforced below)
)


@given(cases=st.lists(CHUNK_CASE, min_size=1, max_size=6))
@settings(**_SETTINGS)
def test_chunk_documents_properties(spark, cases):
    """For arbitrary (n_tokens, chunk, overlap): reassembly is
    lossless, every chunk except the last is full-size, consecutive
    chunks share exactly `overlap` tokens, and the chunk count matches
    the closed form."""
    import math

    from lakehouse_file_format_compare_spark.operators.packing import chunk_documents

    for n, chunk, overlap in cases:
        overlap = overlap % chunk  # enforce overlap < chunk
        stride = chunk - overlap
        text = " ".join(f"t{i}" for i in range(n))
        docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
        rows = sorted(
            (r["chunk_index"], r["chunk_text"].split())
            for r in chunk_documents(docs, chunk_tokens=chunk,
                                     overlap_tokens=overlap).collect()
        )
        if n == 0:
            assert rows == []
            continue
        want_chunks = 1 if n <= chunk else math.ceil((n - chunk) / stride) + 1
        assert [ci for ci, _ in rows] == list(range(want_chunks))
        chunks = [ct for _, ct in rows]
        assert all(len(c) == chunk for c in chunks[:-1])
        reassembled = list(chunks[0])
        for c in chunks[1:]:
            assert reassembled[-overlap:] == c[:overlap] or overlap == 0
            reassembled.extend(c[overlap:])
        assert reassembled == text.split()


EVENT = st.tuples(
    st.integers(min_value=1, max_value=3),     # user (dense -> interleaving)
    st.integers(min_value=0, max_value=7200),  # offset seconds
)


@given(events=st.lists(EVENT, min_size=1, max_size=15, unique=True))
@settings(**_SETTINGS)
def test_sessionize_properties(spark, events):
    """Session assignment is order-independent (set semantics), every
    event lands in exactly one session, and consecutive events in a
    session are < gap apart while session boundaries are >= gap (the
    session_window rule)."""
    from lakehouse_file_format_compare_spark.operators.temporal import sessionize

    GAP = 600  # 10 minutes
    rows = [
        (i, u, f"2026-01-01 00:00:00", off)
        for i, (u, off) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, base string, off long"
    ).select(
        "event_id", "user_id",
        (F.to_timestamp("base") + F.make_interval(secs=F.col("off"))).alias("ts"),
    )
    out = sessionize(df, gap="10 minutes").collect()
    assert len(out) == len(events)
    by_user: dict[int, list] = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append((r["ts"], r["event_id"], r["session_seq"]))
    for _, evs in by_user.items():
        evs.sort()
        for (t0, _, s0), (t1, _, s1) in zip(evs, evs[1:]):
            delta = (t1 - t0).total_seconds()
            if s1 == s0:
                assert delta < GAP
            else:
                assert s1 == s0 + 1 and delta >= GAP
        assert evs[0][2] == 1  # first session is 1


@given(events=st.lists(EVENT, min_size=1, max_size=15, unique=True),
       slice_sec=st.sampled_from([601, 900, 1800, 3600]))
@settings(**_SETTINGS)
def test_sessionize_salted_equals_unsalted_property(spark, events, slice_sec):
    """For ANY event set and any slice width > gap, the time-sliced
    two-phase variant must reproduce the single-window operator's
    session assignment exactly — including chains that cross several
    slice boundaries."""
    from lakehouse_file_format_compare_spark.operators.temporal import (
        sessionize,
        sessionize_salted,
    )

    rows = [
        (i, u, "2026-01-01 00:00:00", off)
        for i, (u, off) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, base string, off long"
    ).select(
        "event_id", "user_id",
        (F.to_timestamp("base") + F.make_interval(secs=F.col("off"))).alias("ts"),
    )
    a = sorted(
        (r["event_id"], r["user_id"], r["session_seq"], r["session_id"])
        for r in sessionize(df, gap="10 minutes").collect()
    )
    b = sorted(
        (r["event_id"], r["user_id"], r["session_seq"], r["session_id"])
        for r in sessionize_salted(df, gap="10 minutes", slice_sec=slice_sec).collect()
    )
    assert a == b


# ---------------------------------------------------------------------------
# SCD2 (r7): arbitrary key/attribute collision patterns over two
# monotone batches — structural invariants + idempotency.
# ---------------------------------------------------------------------------

UPD = st.tuples(
    st.integers(min_value=0, max_value=4),   # key (dense -> collisions)
    st.integers(min_value=0, max_value=3),   # attr (small -> no-op hits)
)
UPDS = st.lists(UPD, min_size=0, max_size=8)


def _scd2_hist(spark, rows):
    import datetime

    d0 = datetime.date(2025, 1, 1)
    data = [(k, a, d0, None, True) for k, a in rows]
    return spark.createDataFrame(
        data or [(0, 0, d0, None, True)],
        "k long, a long, valid_from date, valid_to date, is_current boolean",
    ).where(F.lit(bool(data)))


def _scd2_batch(spark, rows, day):
    import datetime

    d = datetime.date(2025, day, 1)
    # one row per key (real MERGE precondition): last occurrence wins
    dedup = {k: a for k, a in rows}
    data = [(k, a, d) for k, a in dedup.items()]
    return spark.createDataFrame(
        data or [(0, 0, d)], "k long, a long, effective_date date"
    ).where(F.lit(bool(data)))


@given(initial=UPDS, b1=UPDS, b2=UPDS)
@settings(**_SETTINGS)
def test_scd2_properties(spark, initial, b1, b2):
    from lakehouse_file_format_compare_spark.operators.merge import scd2_apply

    init = {k: a for k, a in initial}
    hist = _scd2_hist(spark, list(init.items()))
    out = scd2_apply(
        scd2_apply(hist, _scd2_batch(spark, b1, 3), keys=["k"], compare_cols=["a"]),
        _scd2_batch(spark, b2, 6), keys=["k"], compare_cols=["a"],
    )
    rows = out.collect()
    per_key = {}
    for r in rows:
        per_key.setdefault(r["k"], []).append(r)
    for k, versions in per_key.items():
        open_rows = [v for v in versions if v["is_current"]]
        # exactly one open version per key, and it is the only NULL-to
        assert len(open_rows) == 1, (k, versions)
        assert open_rows[0]["valid_to"] is None
        assert all(v["valid_to"] is not None for v in versions if not v["is_current"])
        ordered = sorted(versions, key=lambda v: v["valid_from"])
        for prev, nxt in zip(ordered, ordered[1:]):
            assert prev["valid_to"] == nxt["valid_from"], (k, versions)
        # consecutive versions always differ in the tracked attribute
        for prev, nxt in zip(ordered, ordered[1:]):
            assert prev["a"] != nxt["a"], (k, versions)
    # idempotency: re-applying the final batch changes nothing
    again = scd2_apply(
        out, _scd2_batch(spark, b2, 6), keys=["k"], compare_cols=["a"]
    )
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, rows))
