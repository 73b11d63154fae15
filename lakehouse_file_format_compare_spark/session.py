"""SparkSession factory.

The reference builds sessions per Airflow task with Iceberg extensions,
two Hive catalogs and S3A credentials (dags/2_bronze_to_silver.py:22-58,
dags/3_silver_to_gold.py:22-57). This engine is local-first and
infra-free: one factory, deterministic configs, optional format
extensions applied only when their jars are actually on the classpath.

Scale posture (100 TB): every setting here is either
cluster-size-neutral (UTC, Arrow, AQE) or explicitly overridable. AQE +
skew-join + coalesce mirrors the reference's only tuning
(dags/3_silver_to_gold.py:55-57) and is exactly what a 1000-executor
deployment wants for runtime re-planning.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


# Format-extension session config (SURVEY §7.3: "session-extension
# config, not code"). Applying these requires the respective jars on
# the classpath (delta-spark pip package / iceberg-spark-runtime);
# storage.available_formats probes whether they actually work.
FORMAT_EXTENSION_CONF: dict[str, dict[str, str]] = {
    "delta": {
        "spark.sql.extensions": "io.delta.sql.DeltaSparkSessionExtension",
        "spark.sql.catalog.spark_catalog": "org.apache.spark.sql.delta.catalog.DeltaCatalog",
    },
    "iceberg": {
        "spark.sql.extensions": "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
        "spark.sql.catalog.local": "org.apache.iceberg.spark.SparkCatalog",
        "spark.sql.catalog.local.type": "hadoop",
    },
}


def build_session(
    app_name: str = "lakehouse-ffc-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    table_format_extensions: tuple[str, ...] = (),
) -> SparkSession:
    """Create (or reuse) a SparkSession with the engine's defaults.

    Defaults are safe for both ``local[*]`` tests and a real cluster:
    - UTC session timezone (kills YEAR/MONTH/DATE tz drift — SURVEY §7.3)
    - AQE + partition coalescing + skew-join (reference parity)
    - Arrow for pandas interchange (fast path for the ext/ operators)
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = SparkSession.builder.appName(app_name).master(
        master or f"local[{cpus}]"
    )
    conf = {
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.shuffle.partitions": str(
            shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS
        ),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # r14 (guide §3.1/§9): let the planner pick a shuffled-hash
        # join when its size conditions hold instead of always
        # preferring sort-merge. Plan-proven mechanism: the pagerank
        # loop-body join over the cached loop invariants flips
        # SMJ→SHJ and its per-iteration Sorts go 4→0
        # (plans/r14/pagerank_loop_iter2_{before,after}.txt) — an
        # iterative join re-SORTED the unsorted cached base table
        # every iteration under sort-merge. The planner stays
        # conservative elsewhere (sb/events/filter_eval plans are
        # node-identical under the flip — their SMJs' size conditions
        # don't qualify), so the blast radius is exactly the joins
        # whose build side provably fits. Interleaved A/B
        # (scripts/ab_conf.py, min-of-4 across alternating sessions):
        # pagerank 5.74→5.08 s, no entry regressed; full oracle board
        # re-verified green under the flip (join strategy is
        # value-neutral).
        "spark.sql.join.preferSortMergeJoin": "false",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.parquet.compression.codec": "snappy",
        # Spark's default INT96 parquet timestamps carry NO column
        # statistics, silently defeating row-group min/max pruning on
        # event-time predicates — at 100 TB that turns every
        # time-range query into a full scan. INT64 micros restores
        # stats (and matches DuckDB/pyarrow interop).
        "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
        # 128 MB target files, mirroring write.target-file-size-bytes
        # (dags/2_bronze_to_silver.py:247)
        "spark.sql.files.maxPartitionBytes": "134217728",
        "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        "spark.ui.enabled": "false",
    }
    for ext in table_format_extensions:
        conf.update(FORMAT_EXTENSION_CONF[ext])
    # r14 (guide §9, r13 verdict #5): deployment-tuning overrides ride
    # an env JSON so a cluster launch can flip them WITHOUT code edits
    # and the local bench stays on the longitudinal defaults. Measured
    # candidates and their 100 TB rationale live in
    # OPTIMIZATION_r14.md §9 (preferSortMergeJoin=false for the
    # iterative cached-invariant joins; zstd shuffle/parquet codecs
    # for network/storage-bound clusters). Defaults OFF: none of them
    # reproducibly wins on local[32] at sf0.1, and a config that only
    # moves the local bench is exactly the kind of win the rounds
    # exclude.
    env_conf = os.environ.get("SPARK_GRAFT_EXTRA_CONF")
    if env_conf:
        import json

        conf.update({str(k): str(v) for k, v in json.loads(env_conf).items()})
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def apply_runtime_defaults(spark: SparkSession) -> SparkSession:
    """Pin runtime-settable confs on an externally-provided session.

    The correctness driver hands us its own SparkSession; timezone and
    AQE are runtime-settable so we pin them here instead of trusting
    the ambient config.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    # INT64-micros timestamps keep parquet min/max stats (INT96 has
    # none -> no row-group pruning on event time); runtime-settable
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    # join-strategy preference is runtime-settable and value-neutral;
    # keep the external-session path consistent with build_session
    # (r14 §9 — see the rationale on the builder conf)
    spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
    return spark
