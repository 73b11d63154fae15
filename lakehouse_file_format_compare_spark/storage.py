"""Uniform table-format layer — the engine's answer to the reference's
format matrix (Iceberg × {parquet, orc, avro}, dags/2_bronze_to_silver.py:164,
245-258) without requiring any external jars or services.

A *table* is a directory under a warehouse root:
``{warehouse}/{layer}/{table}_{fmt}``, mirroring the reference's
``silver_catalog.silver.{table}_{fmt}`` naming (2_…py:233). Formats:

  parquet | orc | csv | json   — always available (Spark built-ins)
  avro                         — only with the spark-avro module jar
  delta / iceberg              — only with their extensions configured

``available_formats()`` probes at runtime; callers (bench, tests)
iterate over whatever the environment actually supports. MERGE is
implemented as read → relational merge (operators/merge.py) →
atomic directory swap: the copy-on-write strategy every lakehouse
format uses, minus file-level pruning. When Delta/Iceberg jars are
present their native row-level MERGE is used instead.

Scale notes (100 TB): writes partition by a caller-supplied column
(reference: batch_id bronze partitions 1_…py:144, gold value
partitions 3_…py:193,333), so downstream reads partition-prune. The
atomic swap keeps readers consistent on local/HDFS; on object stores
a manifest-based commit (Delta/Iceberg) replaces it — which is why
the format axis is pluggable.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time
import uuid
from collections.abc import Sequence
from contextlib import contextmanager
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from .operators.merge import keep_latest, merge

CORE_FORMATS = ("parquet", "orc", "csv", "json")
OPTIONAL_FORMATS = ("avro", "delta", "iceberg")

_availability_cache: dict[str, bool] = {}


def _probe_format(spark: SparkSession, fmt: str) -> bool:
    if fmt in CORE_FORMATS:
        return True
    if fmt in _availability_cache:
        return _availability_cache[fmt]
    ok = False
    try:
        tmp = os.path.join(tempfile.gettempdir(), f"_fmt_probe_{fmt}_{uuid.uuid4().hex}")
        spark.range(1).write.format(fmt).mode("overwrite").save(tmp)
        shutil.rmtree(tmp, ignore_errors=True)
        ok = True
    except Exception:
        ok = False
    _availability_cache[fmt] = ok
    return ok


def available_formats(spark: SparkSession) -> tuple[str, ...]:
    return CORE_FORMATS + tuple(f for f in OPTIONAL_FORMATS if _probe_format(spark, f))


class ConcurrentCommitError(RuntimeError):
    """A snapshot commit found the table pointer moved past the
    version the writer based its computation on (optimistic
    concurrency — the Iceberg/Delta commit-conflict contract)."""


@dataclass
class Warehouse:
    """Layered warehouse root (bronze/silver/gold directories like the
    reference's MinIO buckets, docker-compose.override.yml:73-76)."""

    spark: SparkSession
    root: str

    def path(self, layer: str, name: str, fmt: str | None = None) -> str:
        suffix = f"_{fmt}" if fmt else ""
        return os.path.join(self.root, layer, f"{name}{suffix}")

    def exists(self, layer: str, name: str, fmt: str | None = None) -> bool:
        p = self.path(layer, name, fmt)
        if not os.path.isdir(p):
            return False
        if fmt and self._read_manifest(layer, name, fmt) is not None:
            return True
        return any(not e.startswith((".", "_")) for e in os.listdir(p))

    def write_table(
        self,
        df: DataFrame,
        layer: str,
        name: str,
        fmt: str = "parquet",
        mode: str = "overwrite",
        partition_by: Sequence[str] | None = None,
    ) -> str:
        """K1/K2/K3/K6/K7 analog: format-parameterized write, optional
        value partitioning (reference: partitionedBy at 3_…py:193)."""
        path = self.path(layer, name, fmt)
        writer = df.write.format(fmt).mode(mode)
        if fmt == "csv":
            writer = writer.option("header", "true")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.save(path)
        return path

    def read_table(
        self,
        layer: str,
        name: str,
        fmt: str = "parquet",
        schema: StructType | None = None,
        version: int | None = None,
    ) -> DataFrame:
        """S2/S4/S5 analog. CSV/JSON require an explicit schema — the
        engine never re-infers (SURVEY §1.4 hazard). For snapshot-
        versioned tables (merge targets), resolves the manifest's
        current snapshot — or ``version=N`` for time travel."""
        path = self.path(layer, name, fmt)
        manifest = self._read_manifest(layer, name, fmt)
        if manifest is not None:
            v = version if version is not None else manifest["current"]
            known = {entry["version"] for entry in manifest["versions"]}
            if v not in known:
                raise ValueError(
                    f"unknown version {v} for {layer}/{name}_{fmt}; known: {sorted(known)}"
                )
            vdir = os.path.join(path, f"v{v}")
            if not os.path.isdir(vdir):
                raise ValueError(
                    f"version {v} of {layer}/{name}_{fmt} was vacuumed; "
                    f"time travel is limited to retained snapshots"
                )
            path = vdir
        elif version is not None:
            raise ValueError(f"{layer}/{name}_{fmt} is not a versioned table")
        reader = self.spark.read.format(fmt)
        if fmt in ("csv", "json"):
            if schema is None:
                raise ValueError(f"{fmt} read of {layer}/{name} requires an explicit schema")
            reader = reader.schema(schema).option("header", "true")
        elif schema is not None:
            reader = reader.schema(schema)
        return reader.load(path)

    # -- snapshot-versioned tables (merge path) --------------------------
    #
    # MERGE targets use the lakehouse metadata-pointer commit protocol
    # (what Iceberg snapshots / Delta log give on object stores, scaled
    # down to a JSON manifest on local/HDFS):
    #
    #   {table}_{fmt}/_manifest.json   {"current": N, "versions": [...]}
    #   {table}_{fmt}/v{N}/            immutable data snapshot
    #
    # A merge writes the NEW snapshot dir first, then atomically
    # replaces the manifest (os.replace). Readers resolve the manifest
    # at plan time → snapshot isolation, time travel (version=), and
    # rollback, with no destructive swap.

    def _manifest_path(self, layer: str, name: str, fmt: str) -> str:
        return os.path.join(self.path(layer, name, fmt), "_manifest.json")

    def _read_manifest(self, layer: str, name: str, fmt: str) -> dict | None:
        p = self._manifest_path(layer, name, fmt)
        if not os.path.isfile(p):
            return None
        with open(p) as f:
            return json.load(f)

    @contextmanager
    def _commit_lock(self, root: str, timeout_sec: float = 30.0):
        """Serialize the manifest publish step per table.

        O_EXCL lock file: the read-validate-replace of the manifest is
        a critical section — without it two overlapping writers can
        both pass the ``expected_current`` check before either
        publishes, and the later ``os.replace`` silently discards the
        other's snapshot pointer (the exact lost-update anomaly the
        Iceberg/Delta commit contract exists to prevent; r7 advisor,
        medium). Only the (milliseconds) metadata step holds the lock
        — the long Spark data write happens outside it into a
        uniquely-named staging dir. On an object store this lock is
        replaced by the store's conditional-put (what Delta/Iceberg
        commit services do); the per-table scope means it never
        serializes commits across tables.
        """
        lock = os.path.join(root, "_commit.lock")
        deadline = time.monotonic() + timeout_sec
        while True:
            try:
                fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                break
            except FileExistsError:
                if time.monotonic() >= deadline:
                    raise ConcurrentCommitError(
                        f"commit lock {lock} held for >{timeout_sec}s — "
                        f"crashed writer? remove the lock file to recover"
                    ) from None
                time.sleep(0.02)
        try:
            yield
        finally:
            os.close(fd)
            os.unlink(lock)

    def _publish_manifest(self, root: str, layer: str, name: str, fmt: str,
                          manifest: dict) -> None:
        """Atomic manifest install (write-temp + rename). Callers must
        hold the commit lock when the manifest was derived from a
        read-validate step."""
        tmp = os.path.join(root, f"_manifest_{uuid.uuid4().hex}.json")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, self._manifest_path(layer, name, fmt))

    def _check_expected(self, layer: str, name: str, fmt: str,
                        manifest: dict, expected_current: int | None) -> None:
        if expected_current is not None and manifest["current"] != expected_current:
            # optimistic concurrency (the Iceberg commit-conflict
            # contract): the writer computed its snapshot against
            # expected_current; another writer advanced the pointer in
            # the meantime, so committing would silently drop that
            # writer's rows. Fail the commit — the caller re-reads and
            # retries against the new snapshot.
            raise ConcurrentCommitError(
                f"{layer}/{name}_{fmt}: expected current version "
                f"{expected_current}, found {manifest['current']} — "
                f"concurrent commit detected; re-read and retry"
            )

    def _commit_version(
        self, df: DataFrame, layer: str, name: str, fmt: str, op: str,
        expected_current: int | None = None,
    ) -> int:
        root = self.path(layer, name, fmt)
        os.makedirs(root, exist_ok=True)
        # fail-fast pre-check BEFORE the expensive data write; the
        # authoritative check re-runs under the commit lock below
        manifest = self._read_manifest(layer, name, fmt) or {"current": 0, "versions": []}
        self._check_expected(layer, name, fmt, manifest, expected_current)
        # data lands in a uniquely-named staging dir outside the lock:
        # two overlapping writers can no longer clobber each other's
        # v{N} files by both computing the same next version
        staging_dir = os.path.join(root, f"_staging_{uuid.uuid4().hex}")
        writer = df.write.format(fmt).mode("overwrite")
        if fmt == "csv":
            writer = writer.option("header", "true")
        writer.save(staging_dir)
        try:
            with self._commit_lock(root):
                # re-read + re-validate immediately before install —
                # the check-then-act window is now inside the lock
                manifest = self._read_manifest(layer, name, fmt) or {
                    "current": 0, "versions": []
                }
                self._check_expected(layer, name, fmt, manifest, expected_current)
                version = _next_version(manifest)
                os.rename(staging_dir, os.path.join(root, f"v{version}"))
                manifest["current"] = version
                manifest["versions"].append({
                    "version": version,
                    "op": op,
                    # per-snapshot schema: what Iceberg snapshot metadata /
                    # the Delta log record — lets schema_history() show when
                    # a column appeared without opening the data files
                    "schema": [
                        (f.name, f.dataType.simpleString()) for f in df.schema.fields
                    ],
                })
                self._publish_manifest(root, layer, name, fmt, manifest)
        except ConcurrentCommitError:
            shutil.rmtree(staging_dir, ignore_errors=True)
            raise
        return version

    def current_version(self, layer: str, name: str, fmt: str = "parquet") -> int | None:
        m = self._read_manifest(layer, name, fmt)
        return m["current"] if m else None

    def history(self, layer: str, name: str, fmt: str = "parquet") -> list[dict]:
        m = self._read_manifest(layer, name, fmt)
        return m["versions"] if m else []

    def rollback(self, layer: str, name: str, fmt: str, version: int) -> None:
        """Re-point the table to an earlier snapshot (metadata-only).

        Validates against the SET of real snapshot versions — not the
        manifest entry count: rollback entries repeat version numbers,
        so after any rollback the entry count exceeds the newest
        snapshot number and a count-based check would accept
        never-created versions (bricking subsequent reads)."""
        root = self.path(layer, name, fmt)
        with self._commit_lock(root):
            m = self._read_manifest(layer, name, fmt)
            snapshots = (
                {e["version"] for e in m["versions"] if e["op"] != "rollback"}
                if m else set()
            )
            if version not in snapshots:
                raise ValueError(
                    f"unknown version {version} for {layer}/{name}_{fmt}; "
                    f"snapshots: {sorted(snapshots)}"
                )
            m["current"] = version
            m["versions"].append({"version": version, "op": "rollback"})
            self._publish_manifest(root, layer, name, fmt, m)

    def merge_table(
        self,
        staging: DataFrame,
        layer: str,
        name: str,
        keys: Sequence[str],
        fmt: str = "parquet",
        policy: str = "upsert",
        dedup_order_by: Sequence[str] | None = None,
        schema: StructType | None = None,
        merge_schema: bool = False,
    ) -> None:
        """K4/K5: MERGE INTO {layer}.{name}_{fmt}. First load is a CTAS
        (2_…py:239-258); after that, relational merge committed as a
        new snapshot version (copy-on-write + metadata-pointer
        commit). Staging is deduped to one row per key first
        (2_…py:219, deterministically).

        ``merge_schema=True`` enables ADDITIVE schema evolution (the
        Delta ``mergeSchema`` / Iceberg add-column semantics): new
        staging columns are appended to the table (existing rows read
        NULL), and same-name numeric columns widen (int→long,
        float→double). Staging must still carry every existing table
        column (``UPDATE SET *`` needs a full row), and incompatible
        type changes raise. Earlier snapshots keep their own schema —
        time travel returns the table as it WAS (tests/
        test_schema_evolution.py)."""
        if dedup_order_by:
            staging = keep_latest(staging, list(keys), list(dedup_order_by))
        if not self.exists(layer, name, fmt):
            self._commit_version(staging, layer, name, fmt, op="create")
            return
        base_version = self.current_version(layer, name, fmt)
        target = self.read_table(layer, name, fmt, schema=schema)
        op = f"merge_{policy}"
        if merge_schema:
            target, staging, added = evolve_schemas(target, staging)
            if added:
                op += "+add:" + ",".join(added)
        merged = merge(target, staging, keys=keys, policy=policy)
        self._commit_version(
            merged, layer, name, fmt, op=op, expected_current=base_version
        )

    def delete_from(
        self,
        layer: str,
        name: str,
        predicate: str,
        fmt: str = "parquet",
    ) -> int:
        """DELETE FROM {layer}.{name} WHERE predicate — the third leg
        of the MERGE/UPDATE/DELETE table-format trio (Delta `DELETE
        FROM` / Iceberg row-delete, as copy-on-write against the
        snapshot-versioned table). Commits the surviving rows as a new
        snapshot; returns the number of rows deleted. Predicate is a
        SQL boolean expression over the table's columns."""
        base_version = self.current_version(layer, name, fmt)
        target = self.read_table(layer, name, fmt)
        cond = F.expr(predicate)
        kept = target.where(~F.coalesce(cond, F.lit(False)))
        n_deleted = target.count() - kept.count()
        self._commit_version(
            kept, layer, name, fmt, op=f"delete:{predicate}",
            expected_current=base_version,
        )
        return n_deleted

    def update_table(
        self,
        layer: str,
        name: str,
        set_exprs: dict[str, str],
        predicate: str = "true",
        fmt: str = "parquet",
    ) -> int:
        """UPDATE {layer}.{name} SET col = expr, ... WHERE predicate
        (copy-on-write). ``set_exprs`` maps existing columns to SQL
        expressions (evaluated per matching row; non-matching rows are
        carried verbatim). Returns the number of rows updated."""
        base_version = self.current_version(layer, name, fmt)
        target = self.read_table(layer, name, fmt)
        unknown = [c for c in set_exprs if c not in target.columns]
        if unknown:
            raise ValueError(f"UPDATE of unknown columns: {unknown}")
        cond = F.coalesce(F.expr(predicate), F.lit(False))
        updated = target.select(
            *[
                F.when(cond, F.expr(set_exprs[c]).cast(target.schema[c].dataType))
                .otherwise(F.col(c))
                .alias(c)
                if c in set_exprs
                else F.col(c)
                for c in target.columns
            ]
        )
        n_updated = target.where(cond).count()
        self._commit_version(
            updated, layer, name, fmt, op=f"update:{predicate}",
            expected_current=base_version,
        )
        return n_updated

    def table_changes(
        self,
        layer: str,
        name: str,
        keys: Sequence[str],
        from_version: int,
        to_version: int,
        fmt: str = "parquet",
    ) -> DataFrame:
        """Change feed between two snapshots (the Delta CDF /
        `table_changes` analog, computed as key-level snapshot diff):
        rows tagged ``_change_type`` in {insert, delete,
        update_preimage, update_postimage}. An update is a key present
        in both snapshots whose NON-KEY columns differ; both images
        are emitted, the CDF contract incremental consumers build on.
        Columns are the union schema (schema evolution safe: a column
        absent from the older snapshot reads NULL in preimages).

        Scale shape: one co-partitioned full-outer join on the key —
        no full-table collect, no version log replay; cost is the two
        snapshot scans + one key shuffle.
        """
        return snapshot_diff(
            self.read_table(layer, name, fmt, version=from_version),
            self.read_table(layer, name, fmt, version=to_version),
            keys,
        )

    def schema_history(
        self, layer: str, name: str, fmt: str = "parquet"
    ) -> list[tuple[int, list[tuple[str, str]]]]:
        """Per-version (version, [(column, type), ...]) from the
        manifest — schema evolution is inspectable without opening
        data files (the Iceberg snapshot-metadata affordance)."""
        return [
            (e["version"], [tuple(c) for c in e.get("schema", [])])
            for e in self.history(layer, name, fmt)
        ]

    def scd2_table(
        self,
        updates: DataFrame,
        layer: str,
        name: str,
        keys: Sequence[str],
        compare_cols: Sequence[str],
        effective_col: str = "effective_date",
        fmt: str = "parquet",
        dedup_order_by: Sequence[str] | None = None,
        schema: StructType | None = None,
    ) -> None:
        """SCD Type-2 MERGE INTO a snapshot-versioned dimension: the
        batch apply (operators/merge.py::scd2_apply — history scanned
        once, batch keys broadcast) committed through the same
        metadata-pointer protocol as :meth:`merge_table`, so dimension
        history composes with snapshot isolation, time travel to any
        pre-batch state, and rollback. First load turns the batch into
        the initial open versions (valid_from = effective, NULL
        valid_to, is_current)."""
        from .operators.merge import scd2_apply

        if dedup_order_by:
            updates = keep_latest(updates, list(keys), list(dedup_order_by))
        if not self.exists(layer, name, fmt):
            eff_type = dict(updates.dtypes)[effective_col]
            initial = updates.select(
                *keys, *compare_cols,
                F.col(effective_col).alias("valid_from"),
                F.lit(None).cast(eff_type).alias("valid_to"),
                F.lit(True).alias("is_current"),
            )
            self._commit_version(initial, layer, name, fmt, op="create")
            return
        target = self.read_table(layer, name, fmt, schema=schema)
        applied = scd2_apply(
            target, updates, keys=keys, compare_cols=compare_cols,
            effective_col=effective_col,
        )
        self._commit_version(applied, layer, name, fmt, op="scd2")

    def vacuum(
        self,
        layer: str,
        name: str,
        fmt: str = "parquet",
        keep_last: int = 2,
        staging_retention_s: float = 3600.0,
    ) -> int:
        """Remove snapshot data dirs no longer reachable from the last
        ``keep_last`` manifest entries (and not the current). Returns
        number of snapshots removed. The production companion of
        time travel — old snapshots otherwise accumulate forever.

        Staging dirs (``_staging_*``) are reaped only past
        ``staging_retention_s`` (mtime-based): the data write into a
        staging dir happens OUTSIDE the commit lock and can run for
        minutes, so "any surviving staging dir belongs to a crashed
        writer" is false while a commit is in flight — an
        unconditional reap could delete files mid-write or let a
        partial snapshot get renamed to v{N} (r8 advisor). Mirrors
        Delta/Iceberg orphan-file retention: default 1h, far past any
        single write at dashboard scale; size it to your longest write
        at 100 TB."""
        m = self._read_manifest(layer, name, fmt)
        if not m:
            return 0
        keep = {e["version"] for e in m["versions"][-keep_last:]} | {m["current"]}
        reachable_partition_dirs = set()
        for e in m["versions"]:
            if e["version"] in keep:
                # pointers may be nested leaf dirs (p_x/__part=v); the
                # unit of retention is the top-level snapshot dir
                reachable_partition_dirs.update(
                    rel.split("/", 1)[0] for rel in e.get("partitions", {}).values()
                )
        root = self.path(layer, name, fmt)
        removed = 0
        now = time.time()
        for entry in os.listdir(root):
            full = os.path.join(root, entry)
            is_stale_snapshot = (
                entry.startswith("v") and entry[1:].isdigit() and int(entry[1:]) not in keep
            )
            is_stale_partition = entry.startswith("p_") and entry not in reachable_partition_dirs
            # staging dirs are pre-commit; reap only past the retention
            # window — a younger one may belong to an IN-FLIGHT writer
            # whose data lands outside the commit lock
            is_orphan_staging = False
            if entry.startswith("_staging_"):
                try:
                    age = now - os.path.getmtime(full)
                except OSError:
                    age = 0.0  # racing writer just renamed/removed it
                is_orphan_staging = age > staging_retention_s
            if is_stale_snapshot or is_stale_partition or is_orphan_staging:
                shutil.rmtree(full, ignore_errors=True)
                removed += 1
        return removed

    # -- partition-level copy-on-write merge -----------------------------
    #
    # The 100 TB merge path: the table is bucketed by a partition
    # column (the reference partitions gold by ano/mes and
    # data_transacao, 3_…py:193,333); a merge rewrites ONLY the
    # partitions the staging batch touches and carries every other
    # partition forward BY REFERENCE in the manifest. Merge cost is
    # O(touched partitions), not O(table) — the same file-level
    # copy-on-write contract Iceberg/Delta implement.

    def merge_table_partitioned(
        self,
        staging: DataFrame,
        layer: str,
        name: str,
        keys: Sequence[str],
        partition_col: str,
        fmt: str = "parquet",
        policy: str = "upsert",
        dedup_order_by: Sequence[str] | None = None,
        merge_schema: bool = False,
    ) -> dict:
        """Partition-level COW MERGE. Returns {"touched": [...],
        "carried": n} for observability.

        ``merge_schema=True`` allows ADD-COLUMN evolution only: new
        staging columns are recorded in the snapshot's manifest schema
        and the reader back-fills NULL for the untouched partitions'
        older files (explicit-schema read — no footer-merge scan).
        Numeric WIDENING is rejected here by design: untouched
        partitions keep their original files, and a plain parquet/orc
        reader cannot upcast a file's int32 column to a bigint table
        schema — widening a partitioned table requires rewriting the
        carried partitions (compact + full rewrite), so asking for it
        implicitly would hide a 100 TB rewrite behind a flag.

        O(1) Spark jobs regardless of how many partitions the batch
        touches: ONE small distinct scan discovers the touched values,
        ONE scan reads exactly those partitions' previous data, and
        ONE ``partitionBy`` write lands every rewritten partition as a
        leaf dir of a single snapshot directory — the manifest then
        points each touched value at its leaf and carries every
        untouched partition forward by reference. (The previous
        design looped a separate Spark job per touched partition,
        which serializes into N jobs at 100 TB batch sizes.)

        NULL partition values are rejected (identity-partitioning
        contract — the reference's gold partition columns ano/mes and
        data_transacao are never NULL, dags/3_silver_to_gold.py:193,333).
        """
        if dedup_order_by:
            staging = keep_latest(staging, list(keys), list(dedup_order_by))
        root = self.path(layer, name, fmt)
        os.makedirs(root, exist_ok=True)
        manifest = self._read_manifest(layer, name, fmt) or {"current": 0, "versions": []}
        # the snapshot this merge is computed AGAINST: the commit step
        # re-validates it under the lock (same optimistic-concurrency
        # contract as _commit_version; r7 advisor — this path had no
        # check at all, so an overlapping writer's partitions were
        # silently dropped from the carried-forward map)
        base_current = manifest["current"]
        prev = {}
        ptype = staging.schema[partition_col].dataType.simpleString()
        if manifest["versions"]:
            last = next(
                e for e in reversed(manifest["versions"])
                if e["version"] == manifest["current"] and e["op"] != "rollback"
            )
            if "partitions" not in last:
                raise ValueError(f"{layer}/{name}_{fmt} is not a partitioned table")
            prev = dict(last["partitions"])
            ptype = last["partition_type"]

        touched_vals = [
            r[0] for r in staging.select(partition_col).distinct().collect()
        ]
        if any(v is None for v in touched_vals):
            raise ValueError(
                f"NULL {partition_col} in staging batch: partitioned COW "
                f"merge requires non-null identity partition values"
            )

        added: list[str] = []
        last_schema = None
        if manifest["versions"]:
            cur_entries = [
                e for e in manifest["versions"]
                if e["version"] == manifest["current"] and "partitions" in e
            ]
            if cur_entries:
                last_schema = cur_entries[-1].get("schema")
        old_paths = [os.path.join(root, prev[str(v)]) for v in touched_vals if str(v) in prev]
        if old_paths:
            reader = self.spark.read.format(fmt)
            if last_schema is not None:
                # the current TABLE schema (may already be wider than
                # any single old file after a previous add-column)
                reader = reader.schema(_schema_from_manifest(last_schema))
            old = reader.load(old_paths)
            if merge_schema:
                conflicts = {
                    f.name: f.dataType.simpleString()
                    for f in old.schema.fields
                }
                for f in staging.schema.fields:
                    tt = conflicts.get(f.name)
                    st = f.dataType.simpleString()
                    if tt is not None and tt != st:
                        raise ValueError(
                            f"partitioned evolution is add-column only: "
                            f"column {f.name!r} would change {tt} -> {st}; "
                            f"widening requires rewriting carried partitions"
                        )
                old, staging, added = evolve_schemas(old, staging)
            merged = merge(old, staging.select(*old.columns), keys=keys, policy=policy)
        else:
            merged = staging
            if last_schema is not None:
                tbl_types = dict(last_schema)
                missing = [c for c in tbl_types if c not in staging.columns]
                if missing:
                    raise ValueError(
                        f"staging is missing target columns: {missing}"
                    )
                for f in staging.schema.fields:
                    tt = tbl_types.get(f.name)
                    st = f.dataType.simpleString()
                    if tt is not None and tt != st:
                        raise ValueError(
                            f"partitioned evolution is add-column only: "
                            f"column {f.name!r} would change {tt} -> {st}; "
                            f"widening requires rewriting carried partitions"
                        )
                extra = [
                    f.name for f in staging.schema.fields if f.name not in tbl_types
                ]
                if extra and not merge_schema:
                    merged = staging.select(*tbl_types)
                else:
                    added = extra
        # partition by a COPY of the column so the real column stays in
        # the data files: manifest pointers reference the leaf dirs
        # directly and readers need no basePath/partition inference
        rel = f"p_{uuid.uuid4().hex}"
        out_dir = os.path.join(root, rel)
        (
            merged.withColumn("__part", F.col(partition_col).cast("string"))
            .write.format(fmt).partitionBy("__part").mode("overwrite").save(out_dir)
        )
        from urllib.parse import unquote

        partitions = dict(prev)
        written = {
            unquote(entry[len("__part="):]): f"{rel}/{entry}"
            for entry in os.listdir(out_dir)
            if entry.startswith("__part=")
        }
        missing = {str(v) for v in touched_vals} - set(written)
        if missing:  # defensive: a touched value must land as a leaf dir
            raise RuntimeError(f"partitioned write lost partitions: {sorted(missing)}")
        partitions.update(written)

        op = f"merge_{policy}_partitioned"
        if added:
            op += "+add:" + ",".join(added)
        try:
            with self._commit_lock(root):
                # re-read + validate the base snapshot under the lock:
                # the merged data and the carried-partition map were
                # computed against base_current, so a pointer moved by
                # a concurrent writer makes this commit a lost update
                manifest = self._read_manifest(layer, name, fmt) or {
                    "current": 0, "versions": []
                }
                self._check_expected(layer, name, fmt, manifest, base_current)
                version = _next_version(manifest)
                manifest["current"] = version
                manifest["versions"].append({
                    "version": version,
                    "op": op,
                    "partitions": partitions,
                    "partition_type": ptype,
                    "partition_col": partition_col,
                    "schema": [
                        (f.name, f.dataType.simpleString())
                        for f in merged.schema.fields
                    ],
                })
                self._publish_manifest(root, layer, name, fmt, manifest)
        except ConcurrentCommitError:
            shutil.rmtree(out_dir, ignore_errors=True)
            raise
        return {"touched": touched_vals, "carried": len(prev) - sum(1 for v in touched_vals if str(v) in prev)}

    def read_table_partitioned(
        self, layer: str, name: str, fmt: str = "parquet", version: int | None = None,
        partition_values: Sequence | None = None,
    ) -> DataFrame:
        """Read a partitioned-COW table: union of the manifest's
        partition dirs (partition-pruned when ``partition_values`` is
        given — the reader-side analog of partition pruning)."""
        root = self.path(layer, name, fmt)
        manifest = self._read_manifest(layer, name, fmt)
        if not manifest:
            raise ValueError(f"{layer}/{name}_{fmt} has no manifest")
        want = version if version is not None else manifest["current"]
        # skip rollback markers (they repeat a version number but carry
        # no partition map — the real snapshot entry does)
        entries = [e for e in manifest["versions"]
                   if e["version"] == want and "partitions" in e]
        if not entries:
            raise ValueError(f"{layer}/{name}_{fmt} v{want} is not a partitioned snapshot")
        entry = entries[-1]
        wanted = (
            {str(v) for v in partition_values} if partition_values is not None
            else set(entry["partitions"])
        )
        paths = [os.path.join(root, rel) for val, rel in entry["partitions"].items() if val in wanted]
        if not paths:
            raise ValueError(f"no matching partitions among {sorted(entry['partitions'])}")
        reader = self.spark.read.format(fmt)
        if entry.get("schema"):
            # the snapshot's recorded TABLE schema: carried partitions
            # written before an add-column read the new column as NULL
            # (explicit schema — no per-file footer-merge scan)
            reader = reader.schema(_schema_from_manifest(entry["schema"]))
        return reader.load(paths)

    def compact(
        self, layer: str, name: str, fmt: str = "parquet",
        target_file_bytes: int = 134_217_728,
    ) -> int:
        """Compact the current snapshot into ~target-sized files
        (the reference's write.target-file-size-bytes=128MB as an
        explicit maintenance op, 2_…py:247). Small-file proliferation
        is the chronic cost of frequent incremental merges; compaction
        rewrites the CURRENT snapshot as a new version with
        ceil(size/target) files — time travel to pre-compaction
        versions still works. Returns the new file count."""
        import math

        manifest = self._read_manifest(layer, name, fmt)
        if not manifest:
            raise ValueError(f"{layer}/{name}_{fmt} is not a versioned table")
        current_dir = os.path.join(self.path(layer, name, fmt), f"v{manifest['current']}")
        size = _dir_bytes(current_dir)
        n_files = max(1, math.ceil(size / target_file_bytes))
        df = self.spark.read.format(fmt).load(current_dir).coalesce(n_files)
        self._commit_version(df, layer, name, fmt, op="compact")
        return n_files

    def cluster_by(
        self, layer: str, name: str, cols: Sequence[str],
        fmt: str = "parquet", n_files: int = 8,
    ) -> int:
        """Rewrite the current snapshot range-clustered on ``cols``
        (repartitionByRange + sortWithinPartitions) — the maintenance
        op behind Delta OPTIMIZE ZORDER / Iceberg sort orders, in its
        1-D form. Range partitioning makes per-file min/max intervals
        on the leading column pairwise disjoint, so format-level
        statistics (parquet row-group min/max, ORC stripe stats) prune
        point/range predicates to ~1 file instead of all of them —
        data skipping is a LAYOUT property, free at read time once
        paid at write time. At 100 TB this is the difference between
        a timestamp-range query scanning one clustered file span and
        scanning the whole fact table. Committed as a new snapshot
        version (``op='cluster'``); time travel to the unclustered
        layout still works. Returns the new version number."""
        manifest = self._read_manifest(layer, name, fmt)
        if not manifest:
            raise ValueError(f"{layer}/{name}_{fmt} is not a versioned table")
        current_dir = os.path.join(self.path(layer, name, fmt), f"v{manifest['current']}")
        df = self.spark.read.format(fmt).load(current_dir)
        out = df.repartitionByRange(n_files, *[F.col(c) for c in cols]).sortWithinPartitions(
            *[F.col(c) for c in cols]
        )
        return self._commit_version(out, layer, name, fmt, op="cluster")

    def cluster_by_zorder(
        self, layer: str, name: str, cols: Sequence[str],
        fmt: str = "parquet", n_files: int = 16, bits: int = 16,
    ) -> int:
        """Rewrite the current snapshot MULTI-dimensionally clustered
        on ``cols`` via a Z-order (Morton) curve — the full analog of
        Delta ``OPTIMIZE ZORDER BY`` / Iceberg's z-ordered sort.
        Where :meth:`cluster_by` makes per-file ranges tight on the
        LEADING column only (later columns still span the full
        domain), z-ordering interleaves the bit patterns of all
        columns so every file covers a small hyper-rectangle:
        per-file min/max shrink on EVERY clustered column
        simultaneously and predicates on any subset of them prune.

        Each column is min/max-normalized to a ``bits``-bit integer
        (one tiny agg for the bounds, broadcast), the bits are
        interleaved into a single long with pure bitwise expressions
        (codegen'd — no UDF), and the rewrite range-partitions + sorts
        on that z-value. NULLs map to 0 (cluster low, standard
        z-order convention). Committed as a new snapshot version
        (``op='zorder'``); time travel to the old layout still works.
        Returns the new version number."""
        if not cols or bits * len(cols) > 63:
            raise ValueError(
                f"need 1..{63 // max(1, bits)} columns at {bits} bits "
                f"(got {len(cols)}): the interleaved z-value must fit a long"
            )
        manifest = self._read_manifest(layer, name, fmt)
        if not manifest:
            raise ValueError(f"{layer}/{name}_{fmt} is not a versioned table")
        current_dir = os.path.join(self.path(layer, name, fmt), f"v{manifest['current']}")
        df = self.spark.read.format(fmt).load(current_dir)

        # columns must be orderable on a numeric axis: numerics and
        # timestamps cast straight to double, dates via timestamp.
        # Anything else (strings!) would either crash mid-rewrite under
        # ANSI mode or silently z-order on constant 0 with ANSI off —
        # fail fast instead, like the bits*cols check above.
        numeric = {"tinyint", "smallint", "int", "bigint", "float", "double"}
        dtypes = dict(df.dtypes)
        def _axis(c: str):
            t = dtypes.get(c, "")
            if t in numeric or t.startswith("decimal"):
                return F.col(c).cast("double")
            if t.startswith("timestamp"):
                return F.col(c).cast("double")
            if t == "date":
                return F.col(c).cast("timestamp").cast("double")
            raise ValueError(
                f"cluster_by_zorder needs numeric/timestamp/date columns; "
                f"{c!r} is {t or 'missing'}"
            )
        axes = {c: _axis(c) for c in cols}

        bounds = df.agg(
            *[F.min(axes[c]).alias(f"__mn_{c}") for c in cols],
            *[F.max(axes[c]).alias(f"__mx_{c}") for c in cols],
        )
        scaled = df.crossJoin(F.broadcast(bounds))
        top = (1 << bits) - 1
        ints = []
        for c in cols:
            mn, mx = F.col(f"__mn_{c}"), F.col(f"__mx_{c}")
            span = F.when(mx > mn, mx - mn).otherwise(F.lit(1.0))
            norm = (axes[c] - mn) / span * top
            ints.append(
                F.coalesce(
                    F.least(F.greatest(F.floor(norm), F.lit(0)), F.lit(top)),
                    F.lit(0),
                ).cast("long")
            )
        z = F.lit(0).cast("long")
        for k in range(bits):
            for j, ic in enumerate(ints):
                bit = F.shiftright(ic, k).bitwiseAND(F.lit(1))
                z = z.bitwiseOR(F.shiftleft(bit, k * len(cols) + j))
        out = (
            scaled.withColumn("__z", z)
            .repartitionByRange(n_files, F.col("__z"))
            .sortWithinPartitions("__z")
            .drop("__z", *[f"__mn_{c}" for c in cols], *[f"__mx_{c}" for c in cols])
        )
        return self._commit_version(out, layer, name, fmt, op="zorder")


# numeric widening lattice for additive schema evolution — the safe
# promotions Delta's mergeSchema performs (never narrowing, never
# cross-family casts)
_WIDEN = {
    ("int", "bigint"): "bigint",
    ("bigint", "int"): "bigint",
    ("smallint", "int"): "int",
    ("int", "smallint"): "int",
    ("smallint", "bigint"): "bigint",
    ("bigint", "smallint"): "bigint",
    ("float", "double"): "double",
    ("double", "float"): "double",
}


def evolve_schemas(
    target: DataFrame, staging: DataFrame
) -> tuple[DataFrame, DataFrame, list[str]]:
    """Additive schema reconciliation (Delta ``mergeSchema`` / Iceberg
    add-column semantics): returns (target', staging', added_columns)
    on the union schema.

    - staging columns absent from target are APPENDED — target rows
      read NULL of the staging type;
    - same-name columns with different numeric types widen via the
      safe lattice (int→long, float→double), both sides cast;
    - any other type conflict raises (no silent narrowing or
      cross-family coercion);
    - target columns missing from staging are NOT defaulted — the
      caller's UPDATE SET * contract still requires full staging rows
      (operators/merge.py raises there).
    """
    t_types = {f.name: f.dataType.simpleString() for f in target.schema.fields}
    s_types = {f.name: f.dataType.simpleString() for f in staging.schema.fields}

    for name, st in s_types.items():
        tt = t_types.get(name)
        if tt is None or tt == st:
            continue
        wide = _WIDEN.get((tt, st))
        if wide is None:
            raise ValueError(
                f"incompatible type change for column {name!r}: "
                f"table has {tt}, staging has {st}"
            )
        if tt != wide:
            target = target.withColumn(name, F.col(name).cast(wide))
        if st != wide:
            staging = staging.withColumn(name, F.col(name).cast(wide))

    added = [n for n in s_types if n not in t_types]
    for name in added:
        target = target.withColumn(
            name, F.lit(None).cast(staging.schema[name].dataType)
        )
    # preserve target column order, new columns appended in staging
    # order (the add-column convention)
    order = [f.name for f in target.schema.fields]
    staging = staging.select(
        *[c for c in order if c in staging.columns]
    )
    return target, staging, added


def snapshot_diff(old: DataFrame, new: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Key-level diff of two table snapshots (the engine behind
    Warehouse.table_changes; pure DataFrame-in/DataFrame-out so plan
    libraries can drive it without a warehouse on disk). Rows tagged
    ``_change_type`` in {insert, delete, update_preimage,
    update_postimage}; update = key in both with any NON-KEY column
    differing under null-safe comparison; columns are the union schema
    (a column absent from one side reads NULL there). One
    co-partitioned full-outer join on the key."""
    keys = list(keys)
    # union schema (additive evolution: new columns NULL on old)
    for c in new.columns:
        if c not in old.columns:
            old = old.withColumn(c, F.lit(None).cast(new.schema[c].dataType))
    for c in old.columns:
        if c not in new.columns:
            new = new.withColumn(c, F.lit(None).cast(old.schema[c].dataType))
    cols = list(old.columns)
    value_cols = [c for c in cols if c not in keys]
    o = old.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(f"__o_{c}") for c in value_cols],
    )
    n = new.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(f"__n_{c}") for c in value_cols],
    )
    # presence flags via marker columns (value NULLs are legal)
    o_present = F.col("__o_present").isNotNull()
    n_present = F.col("__n_present").isNotNull()
    j = (
        o.withColumn("__o_present", F.lit(1))
        .join(n.withColumn("__n_present", F.lit(1)), keys, "full_outer")
    )
    differs = F.lit(False)
    for c in value_cols:
        a, b = F.col(f"__o_{c}"), F.col(f"__n_{c}")
        differs = differs | ~(
            (a.isNull() & b.isNull()) | (a.isNotNull() & b.isNotNull() & (a == b))
        )
    tag_cond = {
        "insert": n_present & ~o_present,
        "delete": o_present & ~n_present,
        "update_preimage": o_present & n_present & differs,
        "update_postimage": o_present & n_present & differs,
    }

    def _image(side: str, tag: str) -> DataFrame:
        return j.where(tag_cond[tag]).select(
            *keys,
            *[F.col(f"__{side}_{c}").alias(c) for c in value_cols],
            F.lit(tag).alias("_change_type"),
        )

    return (
        _image("n", "insert")
        .unionByName(_image("o", "delete"))
        .unionByName(_image("o", "update_preimage"))
        .unionByName(_image("n", "update_postimage"))
    )


def _schema_from_manifest(schema_entry: list) -> StructType:
    """Rebuild a StructType from the manifest's [(name, simpleString)]
    pairs — the explicit read schema that makes add-column evolution
    work on carried (unrewritten) partition files."""
    return StructType.fromDDL(
        ", ".join(f"`{name}` {dtype}" for name, dtype in schema_entry)
    )


def _next_version(manifest: dict) -> int:
    """Next snapshot number = max REAL snapshot + 1 (never current+1):
    after a rollback, current points at an old snapshot and current+1
    would silently overwrite a later snapshot's data dir, destroying
    time travel to it. Iceberg likewise never reuses snapshot ids."""
    return max(
        (e["version"] for e in manifest["versions"] if e["op"] != "rollback"), default=0
    ) + 1


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total
