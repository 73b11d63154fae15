"""Stateful streaming funnel: the batch chained-min funnel
(operators/funnel.py::funnel_user_steps) as an incremental
``applyInPandasWithState`` operator that stays EXACT under
out-of-order arrival across micro-batches.

Why naive state is wrong: keeping only the current chain
(t_1 .. t_K) breaks on late data. Example (steps signup -> view):
batch 1 delivers signup@10:00 and view@09:30 — the view is "before
step 1", so a chain-only state discards it; batch 2 delivers a LATE
signup@09:00, moving t_1 down — and the correct t_2 is the 09:30
view that naive state already threw away. The batch operator over
the union gets this right; an incremental operator must too.

The fix is the monotonicity argument: with more data every chain
value t_i can only DECREASE (a min over a superset, with a
loosening ``> t_{i-1}`` constraint and a ``<= t_1 + span`` deadline
that also only moves down). Therefore a type-i event time x can
still matter in the future iff

    min(t_{i-1}, W)  <=  x  <=  t_i        (t_i = +inf if unreached,
                                            t_{i-1} = W if unreached)

where W is the event-time watermark: future arrivals are >= W, so
t_{i-1} can never drop below min(t_{i-1}, W). State per user is the
current chain plus exactly those candidate times — bounded by the
per-user event count inside the watermark lag window, the same
bounded-state story as stream-stream joins (and pruned to {t_1} for
step 1, since a min needs no runner-ups). Without a watermark the
operator is still exact, just unpruned (W = 0).

Emission: update-mode — a row per user per micro-batch in which the
chain changed, tagged with a monotone ``emit_seq`` so the final
state of a drain is the max-seq row (every chain column is also
monotone non-increasing, making the last row the componentwise min).
``n_candidates`` exposes the state size for the bound tests.

Cited batch counterpart: operators/funnel.py (same semantics,
tests/test_streaming_funnel.py proves equivalence on shuffled
multi-batch replays, including the late-signup revival case above).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)


def _output_schema(n_steps: int) -> StructType:
    fields = [
        StructField("user_id", LongType(), False),
        StructField("emit_seq", LongType(), False),
    ]
    fields += [
        StructField(f"step{i}_ts", TimestampType(), True)
        for i in range(1, n_steps + 1)
    ]
    fields.append(StructField("n_candidates", IntegerType(), False))
    return StructType(fields)


def _state_schema(n_steps: int) -> StructType:
    fields = [StructField("seq", LongType(), True)]
    fields += [
        StructField(f"t{i}", LongType(), True) for i in range(1, n_steps + 1)
    ]
    fields += [
        StructField(f"cand{i}", ArrayType(LongType()), True)
        for i in range(2, n_steps + 1)
    ]
    return StructType(fields)


def _funnel_fn_factory(
    steps: list[str], max_span_us: int | None, has_watermark: bool
):
    n_steps = len(steps)

    def fn(key, pdfs, state: GroupState):
        import datetime as _dt

        import pandas as _pd

        (user_id,) = key
        if state.exists:
            st = state.get
            seq = st[0]
            chain = list(st[1 : 1 + n_steps])
            cands = [
                list(c) if c is not None else []
                for c in st[1 + n_steps :]
            ]
        else:
            seq = 0
            chain = [None] * n_steps
            cands = [[] for _ in range(n_steps - 1)]

        new_by_step: list[list[int]] = [[] for _ in range(n_steps)]
        idx = {s: i for i, s in enumerate(steps)}
        for pdf in pdfs:
            for ts, et in zip(pdf["ts"], pdf["event_type"]):
                i = idx.get(et)
                if i is not None:
                    new_by_step[i].append(int(_pd.Timestamp(ts).value // 1000))

        # candidate pools: step 1 keeps only its current min; later
        # steps keep the pruned lists plus this batch's arrivals
        pools = [sorted(([chain[0]] if chain[0] is not None else []) + new_by_step[0])]
        for i in range(1, n_steps):
            pools.append(sorted(cands[i - 1] + new_by_step[i]))

        # greedy chain recompute over the pools (exact: pools contain
        # every time that could matter, per the prune invariant)
        new_chain: list[int | None] = [None] * n_steps
        if pools[0]:
            new_chain[0] = pools[0][0]
            deadline = (
                new_chain[0] + max_span_us if max_span_us is not None else None
            )
            prev = new_chain[0]
            for i in range(1, n_steps):
                nxt = None
                for x in pools[i]:
                    if x > prev and (deadline is None or x <= deadline):
                        nxt = x
                        break
                new_chain[i] = nxt
                if nxt is None:
                    break
                prev = nxt

        # prune under the monotonicity + watermark invariant
        # (getCurrentWatermarkMs raises when the query has no
        # watermark — W = 0 then: exact, unpruned)
        wm_us = state.getCurrentWatermarkMs() * 1000 if has_watermark else 0
        new_cands: list[list[int]] = []
        for i in range(1, n_steps):
            t_prev = new_chain[i - 1]
            lower = wm_us if t_prev is None else min(t_prev, wm_us)
            upper = new_chain[i]
            kept = [
                x
                for x in pools[i]
                if x >= lower and (upper is None or x <= upper)
            ]
            if max_span_us is not None and new_chain[0] is not None:
                cap = new_chain[0] + max_span_us
                kept = [x for x in kept if x <= cap]
            new_cands.append(kept)

        changed = (not state.exists) or new_chain != chain
        seq += 1
        state.update((seq, *new_chain, *[list(c) for c in new_cands]))

        cols = (
            ["user_id", "emit_seq"]
            + [f"step{i}_ts" for i in range(1, n_steps + 1)]
            + ["n_candidates"]
        )
        if changed:
            out = [
                (
                    user_id,
                    seq,
                    *[
                        None
                        if t is None
                        # naive-UTC construction (utcfromtimestamp is
                        # deprecated since Python 3.12): valid because
                        # funnel_stream() asserts the UTC session tz
                        else _dt.datetime.fromtimestamp(
                            t / 1e6, tz=_dt.timezone.utc
                        ).replace(tzinfo=None)
                        for t in new_chain
                    ],
                    sum(len(c) for c in new_cands),
                )
            ]
            yield _pd.DataFrame(out, columns=cols)
        else:
            yield _pd.DataFrame([], columns=cols)

    return fn


def funnel_stream(
    events_stream: DataFrame,
    steps: list[str],
    *,
    max_span_seconds: int | None = None,
    watermark_delay: str | None = None,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Streaming funnel over an events stream (user_id, ts,
    event_type). Emits update rows; the max-``emit_seq`` row per user
    is the current funnel chain. ``watermark_delay`` (e.g. "1 hour")
    bounds both late-data acceptance and candidate state.

    PRECONDITION (asserted): ``spark.sql.session.timeZone`` must be
    UTC. The stateful worker compares epoch-microsecond candidate
    times (derived from session-timezone-naive pandas timestamps)
    against ``getCurrentWatermarkMs()`` epoch values; under any other
    session timezone the two scales diverge by the UTC offset and
    live candidates could be pruned (wrong chains). session.py pins
    UTC for engine-built sessions; this check makes the requirement
    explicit for externally-built ones (r7 advisor)."""
    if len(set(steps)) != len(steps) or not steps:
        raise ValueError("steps must be non-empty and distinct")
    tz = events_stream.sparkSession.conf.get("spark.sql.session.timeZone", "")
    if tz not in ("UTC", "Etc/UTC", "GMT", "+00:00", "Z"):
        raise ValueError(
            f"funnel_stream requires spark.sql.session.timeZone=UTC "
            f"(got {tz!r}): watermark pruning compares session-naive "
            f"event times against epoch watermarks"
        )
    src = events_stream.select(
        events_stream[user_col].alias("user_id"),
        events_stream[ts_col].alias("ts"),
        events_stream[type_col].alias("event_type"),
    )
    if watermark_delay is not None:
        src = src.withWatermark("ts", watermark_delay)
    span_us = (
        int(max_span_seconds) * 1_000_000 if max_span_seconds is not None else None
    )
    return src.groupBy("user_id").applyInPandasWithState(
        _funnel_fn_factory(list(steps), span_us, watermark_delay is not None),
        outputStructType=_output_schema(len(steps)),
        stateStructType=_state_schema(len(steps)),
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
