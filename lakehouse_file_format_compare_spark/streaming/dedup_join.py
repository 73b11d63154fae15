"""Streaming dedup and stream joins — the ingest-time counterparts of
the batch dedup/join families.

- ``dedup_stream``: ``dropDuplicatesWithinWatermark`` keyed dedup.
  State is bounded by the watermark horizon (keys older than the delay
  are evicted), which is the property that makes streaming dedup
  viable at 100 TB/day — unbounded ``dropDuplicates`` state would OOM.
  The reference's only dedup is batch ``dropDuplicates`` at silver
  load (dags/2_bronze_to_silver.py:219); this is its streaming analog
  with an explicit correctness horizon.
- ``enrich_stream``: stream-static broadcast join (dimension
  enrichment on ingest; the static side is re-read per micro-batch,
  so dim updates are picked up without restarts).
- ``interval_join``: stream-stream inner join on key + event-time
  interval. Watermarks on BOTH sides bound the join state; the
  interval condition lets Spark evict rows once the other side's
  watermark passes ``upper``.

All three are tested by batch-equivalence (tests/test_streaming_ops.py):
the AvailableNow drain over file sources must reproduce the batch
DataFrame result on the same data — same oracle pattern as the
stateful sessionizer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(
    stream: DataFrame,
    keys: tuple[str, ...],
    watermark_col: str = "ts",
    delay: str = "30 minutes",
) -> DataFrame:
    """Keyed streaming dedup with watermark-bounded state. Duplicates
    arriving within ``delay`` of the first occurrence are dropped;
    later ones would re-emit (document the horizon, don't pretend
    exactly-once beyond it)."""
    return stream.withWatermark(watermark_col, delay).dropDuplicatesWithinWatermark(list(keys))


def enrich_stream(stream: DataFrame, dim: DataFrame, on: str | list[str]) -> DataFrame:
    """Stream-static dimension enrichment; broadcast keeps every
    micro-batch shuffle-free on the stream side."""
    return stream.join(F.broadcast(dim), on)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_sec: int = 0,
    upper_sec: int = 1800,
    delay: str = "30 minutes",
) -> DataFrame:
    """Stream-stream inner join: rows pair when keys match and
    ``right_ts`` falls in [left_ts + lower_sec, left_ts + upper_sec].
    Both sides watermarked so state is evictable."""
    lw = left.withWatermark(left_ts, delay)
    rw = right.withWatermark(right_ts, delay)
    cond = (
        (lw[key] == rw[key])
        & (rw[right_ts] >= lw[left_ts] + F.expr(f"INTERVAL {lower_sec} SECONDS"))
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {upper_sec} SECONDS"))
    )
    return lw.join(rw, cond)
