"""DELETE / UPDATE / change feed on snapshot-versioned tables
(storage.py) — the rest of the table-format mutation surface next to
MERGE: copy-on-write row deletes and updates committed as snapshots,
and the Delta-CDF-style ``table_changes`` snapshot diff incremental
consumers build on."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouse_file_format_compare_spark.storage import Warehouse


@pytest.fixture()
def wh(spark, tmp_path):
    return Warehouse(spark, str(tmp_path))


def _base(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, None, 40.0)],
        "k long, tag string, price double",
    )


def test_delete_from_commits_snapshot_and_counts(spark, wh):
    wh.merge_table(_base(spark), "silver", "t", keys=["k"])
    n = wh.delete_from("silver", "t", "price >= 30.0")
    assert n == 2
    cur = {r["k"] for r in wh.read_table("silver", "t").collect()}
    assert cur == {1, 2}
    # pre-delete snapshot intact; history records the predicate
    assert len(wh.read_table("silver", "t", version=1).collect()) == 4
    assert wh.history("silver", "t")[-1]["op"] == "delete:price >= 30.0"


def test_delete_null_predicate_rows_are_kept(spark, wh):
    """SQL DELETE semantics: a NULL predicate does NOT delete (three-
    valued logic — only TRUE deletes). Row 4 has tag NULL."""
    wh.merge_table(_base(spark), "silver", "t", keys=["k"])
    n = wh.delete_from("silver", "t", "tag = 'a'")
    assert n == 1
    assert {r["k"] for r in wh.read_table("silver", "t").collect()} == {2, 3, 4}


def test_update_table_sets_matching_rows_only(spark, wh):
    wh.merge_table(_base(spark), "silver", "t", keys=["k"])
    n = wh.update_table(
        "silver", "t", {"price": "price * 2", "tag": "upper(tag)"},
        predicate="k <= 2",
    )
    assert n == 2
    rows = {r["k"]: r for r in wh.read_table("silver", "t").collect()}
    assert rows[1]["price"] == 20.0 and rows[1]["tag"] == "A"
    assert rows[2]["price"] == 40.0 and rows[2]["tag"] == "B"
    assert rows[3]["price"] == 30.0 and rows[3]["tag"] == "c"  # untouched
    # time travel to the pre-update snapshot
    old = {r["k"]: r["price"] for r in wh.read_table("silver", "t", version=1).collect()}
    assert old[1] == 10.0


def test_update_unknown_column_raises(spark, wh):
    wh.merge_table(_base(spark), "silver", "t", keys=["k"])
    with pytest.raises(ValueError, match="unknown columns"):
        wh.update_table("silver", "t", {"nope": "1"})


def test_change_feed_tags_inserts_updates_deletes(spark, wh):
    wh.merge_table(_base(spark), "silver", "t", keys=["k"])            # v1
    staging = spark.createDataFrame(
        [(2, "b", 99.0), (5, "e", 50.0)], "k long, tag string, price double"
    )
    wh.merge_table(staging, "silver", "t", keys=["k"])                 # v2
    wh.delete_from("silver", "t", "k = 1")                             # v3

    c12 = wh.table_changes("silver", "t", keys=["k"], from_version=1, to_version=2)
    by_type = {}
    for r in c12.collect():
        by_type.setdefault(r["_change_type"], []).append(r)
    assert [r["k"] for r in by_type["insert"]] == [5]
    assert [r["k"] for r in by_type["update_preimage"]] == [2]
    assert by_type["update_preimage"][0]["price"] == 20.0
    assert by_type["update_postimage"][0]["price"] == 99.0
    assert "delete" not in by_type

    c23 = wh.table_changes("silver", "t", keys=["k"], from_version=2, to_version=3)
    types = {r["_change_type"]: r for r in c23.collect()}
    assert set(types) == {"delete"}
    assert types["delete"]["k"] == 1 and types["delete"]["price"] == 10.0


def test_change_feed_null_safe_and_no_false_updates(spark, wh):
    """Unchanged rows (including NULL-valued columns) must NOT appear
    in the feed — the null-safe compare matters: NULL = NULL is not
    TRUE in SQL, so a naive inequality check would tag every
    NULL-carrying row as an update."""
    wh.merge_table(_base(spark), "silver", "t", keys=["k"])
    wh.merge_table(_base(spark), "silver", "t", keys=["k"])  # no-op merge
    c = wh.table_changes("silver", "t", keys=["k"], from_version=1, to_version=2)
    assert c.count() == 0


def test_change_feed_across_schema_evolution(spark, wh):
    """Diff across an add-column boundary: preimages read NULL in the
    evolved column (union schema), postimages carry it."""
    wh.merge_table(_base(spark), "silver", "t", keys=["k"])            # v1
    evolved = spark.createDataFrame(
        [(2, "b", 20.0, "web")], "k long, tag string, price double, channel string"
    )
    wh.merge_table(evolved, "silver", "t", keys=["k"], merge_schema=True)  # v2
    c = wh.table_changes("silver", "t", keys=["k"], from_version=1, to_version=2)
    types = {r["_change_type"]: r for r in c.collect()}
    # row 2 changed only by the new column appearing
    assert set(types) == {"update_preimage", "update_postimage"}
    assert types["update_preimage"]["channel"] is None
    assert types["update_postimage"]["channel"] == "web"


def test_concurrent_commit_detection(spark, wh):
    """Optimistic concurrency: a writer that computed its merge
    against version N must NOT silently clobber a commit that moved
    the table to N+1 meanwhile — the lost-update anomaly every
    lakehouse format's conflict check exists for. Simulated by
    driving _commit_version with the stale expectation directly."""
    from lakehouse_file_format_compare_spark.storage import ConcurrentCommitError

    wh.merge_table(_base(spark), "silver", "t", keys=["k"])           # v1
    stale_base = wh.current_version("silver", "t")
    # another writer lands v2
    wh.merge_table(_base(spark), "silver", "t", keys=["k"])           # v2
    with pytest.raises(ConcurrentCommitError, match="concurrent commit"):
        wh._commit_version(
            _base(spark), "silver", "t", "parquet", op="merge_upsert",
            expected_current=stale_base,
        )
    # the conflicting commit left no trace; a fresh retry succeeds
    assert wh.current_version("silver", "t") == 2
    wh.merge_table(_base(spark), "silver", "t", keys=["k"])           # v3
    assert wh.current_version("silver", "t") == 3


def test_commit_recheck_under_lock_defeats_toctou(spark, wh):
    """The r7-advisor lost-update window: a competing commit that
    lands AFTER the pre-check but BEFORE manifest install must still
    be detected. Forced deterministically by interposing on the
    commit lock: the moment the victim acquires it, a rival commit
    has already moved the pointer — the locked re-read must raise,
    and the rival's snapshot must survive untouched."""
    from contextlib import contextmanager

    from lakehouse_file_format_compare_spark.storage import ConcurrentCommitError

    wh.merge_table(_base(spark), "silver", "t", keys=["k"])          # v1
    rival_rows = _base(spark).withColumn("price", F.col("price") * 2)

    real_lock = wh._commit_lock
    fired = {"done": False}

    @contextmanager
    def ambushed_lock(root, timeout_sec=30.0):
        if not fired["done"]:
            fired["done"] = True
            # rival lands v2 inside the victim's check-then-act window
            wh._commit_lock = real_lock
            wh.merge_table(rival_rows, "silver", "t", keys=["k"])
            wh._commit_lock = ambushed_lock
        with real_lock(root, timeout_sec):
            yield

    wh._commit_lock = ambushed_lock
    try:
        with pytest.raises(ConcurrentCommitError, match="concurrent commit"):
            wh.merge_table(_base(spark), "silver", "t", keys=["k"])
    finally:
        wh._commit_lock = real_lock
    # the rival's commit is intact and current; no lost update
    assert wh.current_version("silver", "t") == 2
    prices = {r["k"]: r["price"] for r in wh.read_table("silver", "t").collect()}
    assert prices[1] == 20.0
    # the loser left no staging garbage behind
    import os

    root = wh.path("silver", "t", "parquet")
    assert not [e for e in os.listdir(root) if e.startswith("_staging_")]


def test_partitioned_commit_recheck_under_lock(spark, wh):
    """Same TOCTOU ambush for the partitioned COW path, which had no
    conflict check at all before r8: the carried-partition map is
    computed against a base snapshot, so a pointer moved mid-merge
    means silently dropping the rival's partitions."""
    from contextlib import contextmanager

    from lakehouse_file_format_compare_spark.storage import ConcurrentCommitError

    df = spark.createDataFrame(
        [(1, "2024-01", 1.0), (2, "2024-02", 2.0)], "k long, m string, v double"
    )
    wh.merge_table_partitioned(df, "gold", "t", keys=["k"], partition_col="m")
    rival = spark.createDataFrame([(9, "2024-03", 9.0)], "k long, m string, v double")

    real_lock = wh._commit_lock
    fired = {"done": False}

    @contextmanager
    def ambushed_lock(root, timeout_sec=30.0):
        if not fired["done"]:
            fired["done"] = True
            wh._commit_lock = real_lock
            wh.merge_table_partitioned(rival, "gold", "t", keys=["k"], partition_col="m")
            wh._commit_lock = ambushed_lock
        with real_lock(root, timeout_sec):
            yield

    wh._commit_lock = ambushed_lock
    try:
        with pytest.raises(ConcurrentCommitError, match="concurrent commit"):
            wh.merge_table_partitioned(
                spark.createDataFrame([(1, "2024-01", 5.0)], "k long, m string, v double"),
                "gold", "t", keys=["k"], partition_col="m",
            )
    finally:
        wh._commit_lock = real_lock
    # the rival's 2024-03 partition survives; the loser published nothing
    got = {r["m"] for r in wh.read_table_partitioned("gold", "t").collect()}
    assert got == {"2024-01", "2024-02", "2024-03"}
    assert {r["v"] for r in wh.read_table_partitioned(
        "gold", "t", partition_values=["2024-01"]).collect()} == {1.0}


def test_commit_lock_timeout_names_the_lock(spark, wh, tmp_path):
    import os

    from lakehouse_file_format_compare_spark.storage import ConcurrentCommitError

    wh.merge_table(_base(spark), "silver", "t", keys=["k"])
    root = wh.path("silver", "t", "parquet")
    lock = os.path.join(root, "_commit.lock")
    fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)  # crashed writer
    try:
        with pytest.raises(ConcurrentCommitError, match="_commit.lock"):
            with wh._commit_lock(root, timeout_sec=0.2):
                pass
    finally:
        os.close(fd)
        os.unlink(lock)
    # lock released -> commits flow again
    wh.merge_table(_base(spark), "silver", "t", keys=["k"])
    assert wh.current_version("silver", "t") == 2


def test_vacuum_removes_orphan_staging_dirs(spark, wh):
    """Stale staging dirs (older than the retention window) are
    crashed writers and get reaped; mtime is set back to simulate
    the crash happening hours ago."""
    import os
    import time

    wh.merge_table(_base(spark), "silver", "t", keys=["k"])
    root = wh.path("silver", "t", "parquet")
    dead = os.path.join(root, "_staging_deadbeef")
    os.makedirs(dead)  # crashed writer
    old = time.time() - 7200
    os.utime(dead, (old, old))
    removed = wh.vacuum("silver", "t", keep_last=5)
    assert removed >= 1
    assert not [e for e in os.listdir(root) if e.startswith("_staging_")]
    assert len(wh.read_table("silver", "t").collect()) == 4


def test_vacuum_spares_in_flight_staging_dirs(spark, wh):
    """r9 (r8 advisor): the data write into a staging dir runs OUTSIDE
    the commit lock and can take minutes — a concurrent vacuum must
    NOT delete a staging dir younger than the retention window (it
    could rip files out from under an in-flight commit, or let a
    partial snapshot be published as v{N})."""
    import os

    wh.merge_table(_base(spark), "silver", "t", keys=["k"])
    root = wh.path("silver", "t", "parquet")
    live = os.path.join(root, "_staging_cafef00d")
    os.makedirs(live)  # fresh mtime == writer still in flight
    wh.vacuum("silver", "t", keep_last=5)
    assert os.path.isdir(live), "vacuum reaped an in-flight staging dir"
    # but an explicit no-retention vacuum (maintenance mode, caller
    # asserts no writers) still reaps it (-1: immune to coarse-mtime
    # filesystems where a fresh dir's age can round to <= 0)
    wh.vacuum("silver", "t", keep_last=5, staging_retention_s=-1.0)
    assert not os.path.isdir(live)
