"""Snapshot versioning of merge targets: metadata-pointer commits,
time travel, rollback — the local-FS scale-down of Iceberg snapshots
the reference relies on for its silver merges."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouse_file_format_compare_spark.storage import Warehouse


@pytest.fixture()
def wh(spark, tmp_path):
    return Warehouse(spark, str(tmp_path))


def _orders(spark, n, price):
    return spark.range(n).select(
        F.col("id").alias("k"), F.lit(price).cast("double").alias("price")
    )


def test_merge_commits_versions(spark, wh):
    wh.merge_table(_orders(spark, 5, 1.0), "silver", "t", keys=["k"])
    wh.merge_table(_orders(spark, 8, 2.0), "silver", "t", keys=["k"])
    assert wh.current_version("silver", "t") == 2
    ops = [v["op"] for v in wh.history("silver", "t")]
    assert ops == ["create", "merge_upsert"]
    # current: 8 rows all at price 2.0 (upsert overwrote)
    cur = wh.read_table("silver", "t").collect()
    assert len(cur) == 8 and all(r.price == 2.0 for r in cur)


def test_time_travel_reads_old_snapshot(spark, wh):
    wh.merge_table(_orders(spark, 5, 1.0), "silver", "t", keys=["k"])
    wh.merge_table(_orders(spark, 8, 2.0), "silver", "t", keys=["k"])
    v1 = wh.read_table("silver", "t", version=1).collect()
    assert len(v1) == 5 and all(r.price == 1.0 for r in v1)


def test_rollback_is_metadata_only(spark, wh):
    wh.merge_table(_orders(spark, 5, 1.0), "silver", "t", keys=["k"])
    wh.merge_table(_orders(spark, 8, 2.0), "silver", "t", keys=["k"])
    wh.rollback("silver", "t", "parquet", 1)
    assert wh.read_table("silver", "t").count() == 5
    # rolling forward again still possible: v2 data untouched
    assert wh.read_table("silver", "t", version=2).count() == 8
    # a new merge on top of the rollback builds from v1 — and gets a
    # FRESH snapshot number (v3), never clobbering v2's data dir
    wh.merge_table(_orders(spark, 2, 9.0), "silver", "t", keys=["k"])
    assert wh.current_version("silver", "t") == 3
    cur = {r.k: r.price for r in wh.read_table("silver", "t").collect()}
    assert len(cur) == 5 and cur[0] == 9.0 and cur[4] == 1.0
    # time travel to the rolled-over v2 still sees its original data
    v2 = wh.read_table("silver", "t", version=2).collect()
    assert len(v2) == 8 and all(r.price == 2.0 for r in v2)


def test_rollback_unknown_version_rejected(spark, wh):
    wh.merge_table(_orders(spark, 3, 1.0), "silver", "t", keys=["k"])
    with pytest.raises(ValueError):
        wh.rollback("silver", "t", "parquet", 7)


def test_rollback_after_rollback_validates_against_snapshots(spark, wh):
    """Regression: rollback entries repeat version numbers, so an
    entry-count check would accept a never-created version after any
    rollback — bricking every subsequent read."""
    wh.merge_table(_orders(spark, 5, 1.0), "silver", "t", keys=["k"])
    wh.merge_table(_orders(spark, 8, 2.0), "silver", "t", keys=["k"])
    wh.rollback("silver", "t", "parquet", 1)
    # 3 manifest entries now, but only snapshots {1, 2} exist
    with pytest.raises(ValueError, match="unknown version 3"):
        wh.rollback("silver", "t", "parquet", 3)
    # table still readable, still at v1
    assert wh.read_table("silver", "t").count() == 5
    # rolling back to a real snapshot still works after the rejection
    wh.rollback("silver", "t", "parquet", 2)
    assert wh.read_table("silver", "t").count() == 8


def test_plain_tables_unaffected(spark, wh):
    wh.write_table(_orders(spark, 4, 1.0), "gold", "plain")
    assert wh.exists("gold", "plain", "parquet")
    assert wh.current_version("gold", "plain") is None
    with pytest.raises(ValueError):
        wh.read_table("gold", "plain", version=1)


def test_partitioned_cow_merge_touches_only_staged_partitions(spark, wh):
    import os

    from pyspark.sql import functions as F

    def batch(months, price):
        return (
            spark.range(len(months) * 10)
            .select(
                F.col("id").alias("k"),
                F.lit(price).cast("double").alias("price"),
            )
            .withColumn("mes", F.element_at(
                F.array(*[F.lit(m) for m in months]), (F.col("k") % len(months) + 1).cast("int")
            ))
        )

    r1 = wh.merge_table_partitioned(
        batch([1, 2, 3], 1.0), "gold", "mb", keys=["k"], partition_col="mes"
    )
    assert sorted(r1["touched"]) == [1, 2, 3]
    m1 = wh._read_manifest("gold", "mb", "parquet")
    dirs_v1 = dict(m1["versions"][-1]["partitions"])

    # second merge touches month 2 only
    delta = batch([2], 9.0)
    r2 = wh.merge_table_partitioned(delta, "gold", "mb", keys=["k"], partition_col="mes")
    assert r2["touched"] == [2] and r2["carried"] == 2
    m2 = wh._read_manifest("gold", "mb", "parquet")
    dirs_v2 = dict(m2["versions"][-1]["partitions"])
    # untouched partitions carried BY REFERENCE (same dirs)
    assert dirs_v2["1"] == dirs_v1["1"] and dirs_v2["3"] == dirs_v1["3"]
    assert dirs_v2["2"] != dirs_v1["2"]

    # reads: current reflects the upsert in month 2 only
    cur = wh.read_table_partitioned("gold", "mb")
    assert cur.where(F.col("price") == 9.0).count() == delta.count()
    # partition-pruned read loads only month 2's dir
    pruned = wh.read_table_partitioned("gold", "mb", partition_values=[2])
    assert pruned.count() == cur.where(F.col("mes") == 2).count()
    # time travel to v1 still sees old month 2
    old = wh.read_table_partitioned("gold", "mb", version=1)
    assert old.where(F.col("price") == 9.0).count() == 0


def _jobs_run(spark, fn):
    import uuid

    sc = spark.sparkContext
    group = uuid.uuid4().hex
    sc.setJobGroup(group, "job-count probe")
    try:
        fn()
    finally:
        sc.setJobGroup("", "")
    return len(sc.statusTracker().getJobIdsForGroup(group))


def test_partitioned_cow_merge_is_constant_job_count(spark, wh):
    """The 100 TB contract: Spark job count must NOT grow with the
    number of touched partitions (the old design ran one job per
    touched partition)."""
    from pyspark.sql import functions as F

    def batch(months, price):
        return (
            spark.range(len(months) * 10)
            .select(F.col("id").alias("k"), F.lit(price).cast("double").alias("price"))
            .withColumn("mes", F.element_at(
                F.array(*[F.lit(m) for m in months]), (F.col("k") % len(months) + 1).cast("int")
            ))
        )

    wh.merge_table_partitioned(batch(list(range(1, 13)), 1.0), "gold", "jc",
                               keys=["k"], partition_col="mes")
    jobs_2 = _jobs_run(spark, lambda: wh.merge_table_partitioned(
        batch([1, 2], 2.0), "gold", "jc", keys=["k"], partition_col="mes"))
    jobs_12 = _jobs_run(spark, lambda: wh.merge_table_partitioned(
        batch(list(range(1, 13)), 3.0), "gold", "jc", keys=["k"], partition_col="mes"))
    assert jobs_12 <= jobs_2 + 1, f"job count grew with partitions: {jobs_2} -> {jobs_12}"
    # and the data is right: 12 months all at price 3.0
    cur = wh.read_table_partitioned("gold", "jc")
    assert cur.count() == 120 and cur.where(F.col("price") != 3.0).count() == 0


def test_partitioned_cow_merge_rejects_null_partition(spark, wh):
    from pyspark.sql import functions as F

    staging = spark.range(4).select(
        F.col("id").alias("k"), F.lit(1.0).alias("price"),
        F.when(F.col("id") % 2 == 0, F.col("id")).alias("mes"),
    )
    with pytest.raises(ValueError, match="NULL"):
        wh.merge_table_partitioned(staging, "gold", "np", keys=["k"], partition_col="mes")


def test_partitioned_table_rollback_readable(spark, wh):
    """read_table_partitioned must resolve the real snapshot entry, not
    the rollback marker that repeats its version number."""
    from pyspark.sql import functions as F

    def batch(price):
        return spark.range(10).select(
            F.col("id").alias("k"), F.lit(price).cast("double").alias("price"),
            (F.col("id") % 3).alias("mes"),
        )

    wh.merge_table_partitioned(batch(1.0), "gold", "rb", keys=["k"], partition_col="mes")
    wh.merge_table_partitioned(batch(2.0), "gold", "rb", keys=["k"], partition_col="mes")
    wh.rollback("gold", "rb", "parquet", 1)
    rows = wh.read_table_partitioned("gold", "rb").collect()
    assert len(rows) == 10 and all(r.price == 1.0 for r in rows)
    # merging on top of the rollback builds from v1
    wh.merge_table_partitioned(batch(5.0), "gold", "rb", keys=["k"], partition_col="mes")
    cur = wh.read_table_partitioned("gold", "rb").collect()
    assert len(cur) == 10 and all(r.price == 5.0 for r in cur)


def test_vacuum_removes_unreachable_snapshots(spark, wh):
    import os

    from pyspark.sql import functions as F

    df = spark.range(5).select(F.col("id").alias("k"), F.lit(1.0).alias("price"))
    for i in range(4):
        wh.merge_table(df, "silver", "t", keys=["k"])
    root = wh.path("silver", "t", "parquet")
    assert len([e for e in os.listdir(root) if e.startswith("v")]) == 4
    removed = wh.vacuum("silver", "t", keep_last=2)
    assert removed == 2
    remaining = {e for e in os.listdir(root) if e.startswith("v")}
    assert remaining == {"v3", "v4"}
    assert wh.read_table("silver", "t").count() == 5


def test_compact_reduces_files_and_preserves_data(spark, wh):
    import glob
    import os

    df = _orders(spark, 2000, 1.0).repartition(16)
    wh.merge_table(df, "silver", "big", keys=["k"])
    root = wh.path("silver", "big", "parquet")
    v1_files = glob.glob(os.path.join(root, "v1", "part-*"))
    assert len(v1_files) >= 16
    before = sorted(map(tuple, wh.read_table("silver", "big").collect()))
    wh.compact("silver", "big", target_file_bytes=10 * 1024 * 1024)
    v2_files = glob.glob(os.path.join(root, "v2", "part-*"))
    assert len(v2_files) < len(v1_files)
    after = sorted(map(tuple, wh.read_table("silver", "big").collect()))
    assert after == before
    # pre-compaction snapshot still time-travelable
    assert wh.read_table("silver", "big", version=1).count() == 2000


def test_time_travel_to_vacuumed_version_named_error(spark, wh):
    df = _orders(spark, 5, 1.0)
    for _ in range(3):
        wh.merge_table(df, "silver", "tv", keys=["k"])
    wh.vacuum("silver", "tv", keep_last=1)
    with pytest.raises(ValueError, match="vacuumed"):
        wh.read_table("silver", "tv", version=1)
    # retained snapshots still fine
    assert wh.read_table("silver", "tv").count() == 5


def test_cluster_by_produces_disjoint_file_ranges(spark, wh):
    """cluster_by must turn overlapping per-file min/max intervals on
    the clustering column into pairwise-disjoint ones (the layout
    property parquet row-group pruning skips on), preserve content,
    and keep the unclustered snapshot time-travelable."""
    import glob
    import os

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    # deliberately scatter ts across files: round-robin partitioning
    # of a shuffled id order -> every file spans ~the whole ts range
    from lakehouse_file_format_compare_spark.sources.testdata import table

    ev = (
        table(spark, "/root/testdata/sf0.01", "events")
        .select("event_id", "ts", "user_id", "value")
        .repartition(8, F.col("event_id") % 8)
    )
    wh.write_table(ev, "silver", "ev_cluster")
    wh.merge_table(ev, "silver", "ev_clustered", keys=["event_id"])  # v1 snapshot
    root = wh.path("silver", "ev_clustered", "parquet")

    def file_ranges(version):
        ranges = []
        for f in sorted(glob.glob(os.path.join(root, f"v{version}", "part-*.parquet"))):
            md = pq.read_metadata(f)
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                col = next(
                    md.row_group(rg).column(i)
                    for i in range(md.row_group(rg).num_columns)
                    if md.row_group(rg).column(i).path_in_schema == "ts"
                )
                mins.append(col.statistics.min)
                maxs.append(col.statistics.max)
            if mins:
                ranges.append((min(mins), max(maxs)))
        return ranges

    before = sorted(map(tuple, wh.read_table("silver", "ev_clustered").collect()))
    v2 = wh.cluster_by("silver", "ev_clustered", ["ts"], n_files=6)
    assert v2 == 2

    r1 = sorted(file_ranges(1))
    r2 = sorted(file_ranges(2))
    assert len(r1) > 1 and len(r2) > 1

    def overlaps(rs):
        return sum(1 for (a, b) in zip(rs, rs[1:]) if a[1] > b[0])

    assert overlaps(r1) > 0          # scattered layout: ranges overlap
    assert overlaps(r2) == 0         # clustered: pairwise disjoint

    after = sorted(map(tuple, wh.read_table("silver", "ev_clustered").collect()))
    assert after == before           # content identical
    assert wh.read_table("silver", "ev_clustered", version=1).count() == len(before)
    assert wh.history("silver", "ev_clustered")[-1]["op"] == "cluster"


def test_cluster_by_zorder_tightens_all_dimensions(spark, wh):
    """Z-order clustering must shrink per-file min/max spans on EVERY
    clustered column simultaneously — the multi-dimensional skipping
    property 1-D range clustering cannot give (its trailing columns
    still span the full domain per file). Content preserved, old
    layout time-travelable."""
    import glob
    import os

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from lakehouse_file_format_compare_spark.sources.testdata import table

    ev = (
        table(spark, "/root/testdata/sf0.01", "events")
        .select("event_id", "user_id", "value")
        .repartition(8, F.col("event_id") % 8)   # scatter both dims across files
    )
    wh.merge_table(ev, "silver", "ev_zorder", keys=["event_id"])
    root = wh.path("silver", "ev_zorder", "parquet")

    def avg_span(version, column):
        glo_min, glo_max, spans = None, None, []
        per_file = []
        for f in sorted(glob.glob(os.path.join(root, f"v{version}", "part-*.parquet"))):
            md = pq.read_metadata(f)
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                col = next(
                    md.row_group(rg).column(i)
                    for i in range(md.row_group(rg).num_columns)
                    if md.row_group(rg).column(i).path_in_schema == column
                )
                mins.append(col.statistics.min)
                maxs.append(col.statistics.max)
            if mins:
                per_file.append((min(mins), max(maxs)))
        glo_min = min(mn for mn, _ in per_file)
        glo_max = max(mx for _, mx in per_file)
        width = float(glo_max - glo_min) or 1.0
        spans = [(mx - mn) / width for mn, mx in per_file]
        return sum(spans) / len(spans), len(per_file)

    v1 = wh.current_version("silver", "ev_zorder")
    v_1d = wh.cluster_by("silver", "ev_zorder", ["value"], n_files=16)
    v_z = wh.cluster_by_zorder("silver", "ev_zorder", ["value", "user_id"], n_files=16)

    # scattered baseline: both dims near-full span per file
    for colname in ("value", "user_id"):
        s, _ = avg_span(v1, colname)
        assert s > 0.7, (colname, s)
    # 1-D clustering: leading dim tight, trailing dim still full
    s_val, _ = avg_span(v_1d, "value")
    s_uid, _ = avg_span(v_1d, "user_id")
    assert s_val < 0.3 and s_uid > 0.7, (s_val, s_uid)
    # z-order: BOTH dims tight
    z_val, n_files = avg_span(v_z, "value")
    z_uid, _ = avg_span(v_z, "user_id")
    assert n_files > 4
    assert z_val < 0.55 and z_uid < 0.55, (z_val, z_uid)

    # content identical across layouts; old layout still readable
    base = wh.read_table("silver", "ev_zorder", "parquet", version=v1)
    zed = wh.read_table("silver", "ev_zorder", "parquet")
    assert zed.count() == base.count()
    chk = lambda df: df.agg(F.bit_xor(F.xxhash64("event_id", "user_id"))).collect()[0][0]
    assert chk(zed) == chk(base)


def test_cluster_by_zorder_rejects_non_numeric_columns(spark, wh):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from lakehouse_file_format_compare_spark.sources.testdata import table

    ev = table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "event_type", "value"
    )
    wh.merge_table(ev, "silver", "ev_ztype", keys=["event_id"])
    with _pytest.raises(ValueError, match="event_type"):
        wh.cluster_by_zorder("silver", "ev_ztype", ["event_type", "value"])
