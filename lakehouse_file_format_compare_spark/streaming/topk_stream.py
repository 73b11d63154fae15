"""Streaming heavy-hitters: a Misra-Gries/SpaceSaving-style top-k
summary maintained per group over a stream, with the SAME mergeable
semantics as the batch sketch family (operators/sketches.py:
topk_partial_summaries + topk_rollup) so the two are cross-checkable.

Semantics per group and micro-batch:

1. the batch's rows are counted EXACTLY (per-batch partial: the
   top ``k`` items by (count desc, item asc), ``bound`` = the count
   at rank k+1, ``n_rows`` = all batch rows);
2. the partial merges into the carried state the way topk_rollup
   merges partials — per-item counts sum, bounds sum;
3. the merged map is truncated back to ``k`` entries, adding the
   LARGEST dropped count to the bound (the standard mergeable-
   summaries truncation: every dropped item's recorded mass is
   covered by it).

Invariant carried by the state (the classic MG guarantee): for every
item, true count so far <= (its lower_bound if kept else 0) +
bound_total; therefore any item whose true count exceeds
``bound_total`` is guaranteed PRESENT in the summary. State is
O(k) per group regardless of stream length or item cardinality.

Determinism: batch counts are exact and every tie breaks on the item
value, so given the same batch boundaries the state evolution is a
pure function of the data — pinned in tests against an independent
Python fold AND against the batch operator on a single-batch drain.

The reference has no streaming analytics surface (SURVEY §2.9 covers
its cron micro-batch contract only); this extends the engine's
streaming family (funnel_stream.py, stateful.py) with the
heavy-hitters use case (trending items, hot keys, abuse detection).

Scale: state per group is k items; the per-batch work is one exact
pandas count per group partition — the same applyInPandasWithState
envelope as the sessionization operator. Hot groups are bounded by
the batch size, not history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType([
    StructField("grp", StringType(), False),
    StructField("emit_seq", LongType(), False),
    StructField("rank", LongType(), False),
    StructField("item", StringType(), True),
    StructField("lower_bound", LongType(), False),
    StructField("bound_total", LongType(), False),
    StructField("n_rows", LongType(), False),
])

STATE_SCHEMA = StructType([
    StructField("seq", LongType(), True),
    StructField("items", ArrayType(StringType()), True),
    StructField("cnts", ArrayType(LongType()), True),
    StructField("bound", LongType(), True),
    StructField("n_rows", LongType(), True),
])


def _order_key(kv):
    """(count desc, item asc) with a NULL item sorting FIRST among
    equal counts — exactly Spark's default ASC NULLS FIRST, so the
    streaming summary tie-breaks like the batch operator's window
    (operators/sketches.py topk_partial_summaries)."""
    item, cnt = kv
    return (-cnt, 0 if item is None else 1, item or "")


def merge_and_truncate(
    state_map: dict, batch_map: dict, k: int
) -> tuple[dict, int]:
    """The shared merge rule (also used by the test's Python fold):
    sum per-item counts, keep the top k by (count desc, item asc,
    nulls first), return (kept map, extra bound = largest dropped
    count or 0)."""
    merged = dict(state_map)
    for item, c in batch_map.items():
        merged[item] = merged.get(item, 0) + c
    ordered = sorted(merged.items(), key=_order_key)
    kept = dict(ordered[:k])
    extra = ordered[k][1] if len(ordered) > k else 0
    return kept, extra


def _topk_fn_factory(k: int):
    def fn(key, pdfs, state: GroupState):
        import pandas as _pd

        (grp,) = key
        if state.exists:
            seq, items, cnts, bound, n_rows = state.get
            smap = dict(zip(list(items or []), list(cnts or [])))
        else:
            seq, smap, bound, n_rows = 0, {}, 0, 0

        batch_counts: dict = {}
        batch_n = 0
        for pdf in pdfs:
            batch_n += len(pdf)
            # dropna=False: null items are rows too — batch_n counts
            # them, so the counts must as well or "rows are counted
            # EXACTLY" breaks and the summary diverges from the batch
            # operator (Spark groupBy keeps null keys). r8 advisor.
            for item, c in pdf["item"].value_counts(dropna=False).items():
                key = None if _pd.isna(item) else str(item)
                batch_counts[key] = batch_counts.get(key, 0) + int(c)

        # exact per-batch partial: top-k kept, rank-(k+1) count is the
        # batch bound (same construction as topk_partial_summaries)
        ordered = sorted(batch_counts.items(), key=_order_key)
        batch_kept = dict(ordered[:k])
        batch_bound = ordered[k][1] if len(ordered) > k else 0

        smap, extra = merge_and_truncate(smap, batch_kept, k)
        bound = bound + batch_bound + extra
        n_rows += batch_n
        seq += 1

        keys = sorted(smap.items(), key=_order_key)
        state.update((
            seq, [i for i, _ in keys], [c for _, c in keys], bound, n_rows
        ))
        out = [
            (grp, seq, rank, item, cnt, bound, n_rows)
            for rank, (item, cnt) in enumerate(keys, start=1)
        ]
        yield _pd.DataFrame(
            out, columns=[f.name for f in OUTPUT_SCHEMA.fields]
        )

    return fn


def topk_stream(
    events_stream: DataFrame,
    k: int,
    *,
    group_col: str = "event_type",
    item_col: str = "user_id",
) -> DataFrame:
    """Streaming per-group heavy-hitter summary. Emits the full
    current summary each batch (update mode); the max-``emit_seq``
    rows per group are the live state."""
    if k < 1:
        raise ValueError("k must be >= 1")
    src = events_stream.select(
        events_stream[group_col].cast("string").alias("grp"),
        events_stream[item_col].cast("string").alias("item"),
    )
    return src.groupBy("grp").applyInPandasWithState(
        _topk_fn_factory(int(k)),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
