"""Custom stateful streaming operator: per-user sessionization with an
inactivity gap, via ``applyInPandasWithState`` — the escape hatch for
stateful semantics Spark's built-in operators can't express
(F.session_window gives gap-sessions, but not custom per-session
logic like running value totals with early emission rules).

Design (100 TB): state is per-key and tiny (start, last_ts, count,
value_sum); the runtime shuffles by user_id once and keeps state in
the state store, so cost per micro-batch is O(batch + touched keys).
The UDF closure is self-contained (no package imports on executors).

A closed session is emitted when a new event arrives ``gap`` or
more after the previous one (the session_window rule: the window
spans [start, last + gap), so an event at exactly last + gap starts
a new session); the final open session per key is
emitted on state timeout (processing-time) in continuous operation.
Under AvailableNow test runs the open tails stay in the store —
asserted against the equivalent batch computation over closed
sessions only.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType([
    StructField("user_id", LongType(), False),
    StructField("session_start", TimestampType(), True),
    StructField("session_end", TimestampType(), True),
    StructField("n_events", IntegerType(), True),
    StructField("value_sum", DoubleType(), True),
])

STATE_SCHEMA = StructType([
    StructField("start_us", LongType(), True),
    StructField("last_us", LongType(), True),
    StructField("n", IntegerType(), True),
    StructField("vsum", DoubleType(), True),
])


def _naive_utc(_dt, epoch_us: int):
    """Epoch-us -> naive-UTC datetime (utcfromtimestamp is deprecated
    since Python 3.12); the engine pins the UTC session timezone so
    naive values round-trip exactly through Arrow."""
    return _dt.datetime.fromtimestamp(
        epoch_us / 1e6, tz=_dt.timezone.utc
    ).replace(tzinfo=None)


def _session_fn_factory(gap_seconds: int):
    gap_us = gap_seconds * 1_000_000

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        import datetime as _dt

        import pandas as _pd

        (user_id,) = key
        if state.exists:
            start_us, last_us, n, vsum = state.get
        else:
            start_us = last_us = None
            n, vsum = 0, 0.0
        closed = []
        events = []
        for pdf in pdfs:
            for ts, value in zip(pdf["ts"], pdf["value"]):
                events.append((int(_pd.Timestamp(ts).value // 1000), float(value)))
        events.sort()
        for ts_us, value in events:
            if last_us is not None and ts_us - last_us >= gap_us:
                closed.append((user_id,
                               _naive_utc(_dt, start_us),
                               _naive_utc(_dt, last_us),
                               n, round(vsum, 2)))
                start_us, n, vsum = ts_us, 0, 0.0
            if start_us is None:
                start_us = ts_us
            last_us = ts_us
            n += 1
            vsum += value
        if state.hasTimedOut:
            closed.append((user_id,
                           _naive_utc(_dt, start_us),
                           _naive_utc(_dt, last_us),
                           n, round(vsum, 2)))
            state.remove()
        else:
            state.update((start_us, last_us, n, vsum))
            # long idle timeout: open sessions flush after an hour of
            # no arrivals in continuous operation (and never during a
            # short AvailableNow drain, keeping tests deterministic)
            state.setTimeoutDuration(3600 * 1000)
        cols = ["user_id", "session_start", "session_end", "n_events", "value_sum"]
        yield _pd.DataFrame(closed, columns=cols)

    return fn


def sessionize_stream(events_stream: DataFrame, gap_seconds: int = 300) -> DataFrame:
    """Apply gap-based sessionization to a STREAMING events DataFrame
    (columns: user_id, ts, value). Returns the closed-session stream."""
    return (
        events_stream.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn_factory(gap_seconds),
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def drain_available_now(query, idle_checks: int = 3, poll_sec: float = 1.0,
                        max_wait_sec: float = 300.0) -> None:
    """Wait until an AvailableNow stateful query has consumed all
    input, then stop it. Needed because a query with registered
    processing-time timeouts keeps running ("no new data but cleaning
    up state") instead of terminating after the drain."""
    import time

    t0 = time.time()
    idle = 0
    while query.isActive and time.time() - t0 < max_wait_sec:
        msg = (query.status or {}).get("message", "")
        if "No new data" in msg or "Waiting for data" in msg:
            idle += 1
            if idle >= idle_checks:
                break
        else:
            idle = 0
        time.sleep(poll_sec)
    if query.isActive:
        query.stop()
    query.awaitTermination(30)


def sessionize_batch(events: DataFrame, gap_seconds: int = 300) -> DataFrame:
    """Batch oracle for the streaming operator: identical gap logic as
    window expressions — session boundaries where the gap to the
    previous event exceeds the threshold. Returns ALL sessions
    (including each user's final one)."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    with_gap = events.select("user_id", "ts", "value").withColumn(
        "prev_ts", F.lag("ts").over(w)
    ).withColumn(
        "new_session",
        (F.col("prev_ts").isNull())
        | (F.col("ts").cast("double") - F.col("prev_ts").cast("double") >= gap_seconds),
    ).withColumn("session_id", F.sum(F.col("new_session").cast("int")).over(w))
    return (
        with_gap.groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).cast("int").alias("n_events"),
            F.round(F.sum("value"), 2).alias("value_sum"),
        )
        .drop("session_id")
    )


from pyspark.sql.streaming.stateful_processor import (  # noqa: E402
    StatefulProcessor,
)


class _SessionProcessor(StatefulProcessor):
    """StatefulProcessor for :func:`sessionize_stream_tws` — defined
    module-level with plain instance attributes so cloudpickle ships
    it whole (same self-containment rule as the closure operators)."""

    def __init__(self, gap_us: int):
        self.gap_us = gap_us

    def init(self, handle) -> None:
        self.state = handle.getValueState("sess", STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        import datetime as _dt

        import pandas as _pd

        (user_id,) = key
        existing = self.state.get() if self.state.exists() else None
        if existing is not None:
            start_us, last_us, n, vsum = existing
        else:
            start_us = last_us = None
            n, vsum = 0, 0.0
        closed = []
        events = []
        for pdf in rows:
            for ts, value in zip(pdf["ts"], pdf["value"]):
                events.append((int(_pd.Timestamp(ts).value // 1000), float(value)))
        events.sort()
        for ts_us, value in events:
            if last_us is not None and ts_us - last_us >= self.gap_us:
                closed.append((user_id,
                               _naive_utc(_dt, start_us),
                               _naive_utc(_dt, last_us),
                               n, round(vsum, 2)))
                start_us, n, vsum = ts_us, 0, 0.0
            if start_us is None:
                start_us = ts_us
            last_us = ts_us
            n += 1
            vsum += value
        self.state.update((start_us, last_us, n, vsum))
        cols = ["user_id", "session_start", "session_end", "n_events", "value_sum"]
        yield _pd.DataFrame(closed, columns=cols)

    def close(self) -> None:
        pass


def sessionize_stream_tws(events_stream: DataFrame, gap_seconds: int = 300) -> DataFrame:
    """Spark-4-native sessionization via ``transformWithStateInPandas``
    (the StatefulProcessor successor to applyInPandasWithState): same
    gap semantics and output as :func:`sessionize_stream`, expressed
    against the new arbitrary-state API (named ValueState handle,
    Append output, no time mode — open tails stay in the store).
    Requires the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass``), which is what
    a 100 TB deployment runs anyway for state that exceeds executor
    heap — and a working ``protobuf`` install for the TWS Python
    runner (this container ships none, so the operator is wired but
    the equivalence test skips; applyInPandasWithState above is the
    proven path here)."""
    proc = _SessionProcessor(gap_seconds * 1_000_000)
    return (
        events_stream.select("user_id", "ts", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            proc,
            outputStructType=SESSION_SCHEMA,
            outputMode="Append",
            timeMode="None",
        )
    )
