"""SCD Type-2 batch apply (operators/merge.py::scd2_apply):
hand-checkable transitions on a tiny dim, an exact DuckDB oracle
replaying the full semantics over the customer table, idempotency,
multi-batch chaining, interval invariants, and a plan pin (history is
never shuffled — batch keys broadcast into every join)."""

from __future__ import annotations

import datetime
import os

import duckdb
import pytest
from pyspark.sql import functions as F

from lakehouse_file_format_compare_spark.operators.merge import scd2_apply
from lakehouse_file_format_compare_spark.sources.testdata import table

from .conftest import SF_CORRECTNESS

D0 = datetime.date(2025, 1, 1)
D1 = datetime.date(2025, 6, 1)
D2 = datetime.date(2025, 9, 1)


def _tiny_history(spark):
    return spark.createDataFrame(
        [
            (1, "alice", "gold", D0, None, True),
            (2, "bob", "silver", D0, None, True),
            (3, "carol", "bronze", D0, D1, False),
            (3, "carol", "silver", D1, None, True),
        ],
        "id long, name string, tier string, valid_from date, valid_to date, is_current boolean",
    )


def test_hand_transitions(spark):
    hist = _tiny_history(spark)
    updates = spark.createDataFrame(
        [
            (1, "alice", "platinum", D2),   # changed -> close + insert
            (2, "bob", "silver", D2),       # unchanged -> no-op
            (4, "dave", "gold", D2),        # new key -> insert
        ],
        "id long, name string, tier string, effective_date date",
    )
    out = scd2_apply(hist, updates, keys=["id"], compare_cols=["name", "tier"]).collect()
    rows = {(r["id"], r["valid_from"]): r for r in out}
    assert len(out) == 6  # 4 history + 1 closed-replacement + 1 new key
    closed = rows[(1, D0)]
    assert closed["valid_to"] == D2 and closed["is_current"] is False
    opened = rows[(1, D2)]
    assert opened["tier"] == "platinum" and opened["valid_to"] is None and opened["is_current"]
    assert rows[(2, D0)]["is_current"] and rows[(2, D0)]["valid_to"] is None
    assert rows[(3, D1)]["is_current"]          # untouched key unaffected
    assert rows[(4, D2)]["is_current"] and rows[(4, D2)]["name"] == "dave"


def test_idempotent_reapply(spark):
    hist = _tiny_history(spark)
    updates = spark.createDataFrame(
        [(1, "alice", "platinum", D2), (4, "dave", "gold", D2)],
        "id long, name string, tier string, effective_date date",
    )
    once = scd2_apply(hist, updates, keys=["id"], compare_cols=["name", "tier"])
    twice = scd2_apply(once, updates, keys=["id"], compare_cols=["name", "tier"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_interval_invariants_after_chained_batches(spark):
    """After any batch sequence: exactly one open version per live
    key, no interval overlap (next valid_from == previous valid_to)."""
    hist = _tiny_history(spark)
    b1 = spark.createDataFrame(
        [(1, "alice", "platinum", D1), (5, "erin", "silver", D1)],
        "id long, name string, tier string, effective_date date",
    )
    b2 = spark.createDataFrame(
        [(1, "alice", "diamond", D2), (5, "erin", "gold", D2)],
        "id long, name string, tier string, effective_date date",
    )
    out = scd2_apply(
        scd2_apply(hist, b1, keys=["id"], compare_cols=["name", "tier"]),
        b2, keys=["id"], compare_cols=["name", "tier"],
    )
    per_key = {}
    for r in out.collect():
        per_key.setdefault(r["id"], []).append(r)
    for key, versions in per_key.items():
        open_rows = [v for v in versions if v["is_current"]]
        assert len(open_rows) == 1, key
        assert open_rows[0]["valid_to"] is None
        ordered = sorted(versions, key=lambda v: v["valid_from"])
        for prev, nxt in zip(ordered, ordered[1:]):
            assert prev["valid_to"] == nxt["valid_from"], key


UPD_MOD = 4     # c_custkey % 4 == 0 -> changed segment
NEW_MOD = 10    # c_custkey % 10 == 0 -> also emit a brand-new key
NEW_OFFSET = 1_000_000


def _customer_history(spark):
    cust = table(spark, SF_CORRECTNESS, "customer")
    return cust.select(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("name"),
        F.col("c_mktsegment").alias("segment"),
        F.lit(D0).alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )


def _customer_updates(spark):
    cust = table(spark, SF_CORRECTNESS, "customer")
    changed = cust.where(F.pmod("c_custkey", F.lit(UPD_MOD)) == 0).select(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("name"),
        F.concat(F.col("c_mktsegment"), F.lit("-V2")).alias("segment"),
        F.lit(D1).alias("effective_date"),
    )
    unchanged = cust.where(F.pmod("c_custkey", F.lit(UPD_MOD)) == 1).select(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("name"),
        F.col("c_mktsegment").alias("segment"),
        F.lit(D1).alias("effective_date"),
    )
    new = cust.where(F.pmod("c_custkey", F.lit(NEW_MOD)) == 0).select(
        (F.col("c_custkey") + NEW_OFFSET).alias("id"),
        F.concat(F.lit("new-"), F.col("c_name")).alias("name"),
        F.lit("STARTUP").alias("segment"),
        F.lit(D1).alias("effective_date"),
    )
    return changed.unionByName(unchanged).unionByName(new)


SCD2_ORACLE_SQL = f"""
WITH hist AS (
    SELECT c_custkey AS id, c_name AS name, c_mktsegment AS segment,
           DATE '2025-01-01' AS valid_from, CAST(NULL AS DATE) AS valid_to,
           true AS is_current
    FROM customer
), upd AS (
    SELECT c_custkey AS id, c_name AS name, c_mktsegment || '-V2' AS segment,
           DATE '2025-06-01' AS eff
    FROM customer WHERE c_custkey % {UPD_MOD} = 0
    UNION ALL
    SELECT c_custkey, c_name, c_mktsegment, DATE '2025-06-01'
    FROM customer WHERE c_custkey % {UPD_MOD} = 1
    UNION ALL
    SELECT c_custkey + {NEW_OFFSET}, 'new-' || c_name, 'STARTUP', DATE '2025-06-01'
    FROM customer WHERE c_custkey % {NEW_MOD} = 0
), cur AS (SELECT * FROM hist WHERE is_current),
joined AS (
    SELECT u.id, u.name, u.segment, u.eff,
           c.id IS NOT NULL AS key_exists,
           (u.name IS DISTINCT FROM c.name
            OR u.segment IS DISTINCT FROM c.segment) AS attrs_differ
    FROM upd u LEFT JOIN cur c USING (id)
), needs AS (SELECT * FROM joined WHERE NOT key_exists OR attrs_differ),
closed AS (
    SELECT c.id, c.name, c.segment, c.valid_from, n.eff AS valid_to,
           false AS is_current
    FROM cur c JOIN needs n USING (id)
), untouched AS (
    SELECT * FROM cur WHERE id NOT IN (SELECT id FROM needs WHERE key_exists)
), new_versions AS (
    SELECT id, name, segment, eff AS valid_from, CAST(NULL AS DATE) AS valid_to,
           true AS is_current
    FROM needs
)
SELECT * FROM (
    SELECT * FROM hist WHERE NOT is_current
    UNION ALL SELECT * FROM untouched
    UNION ALL SELECT * FROM closed
    UNION ALL SELECT * FROM new_versions
)
ORDER BY id, valid_from
"""


def test_oracle_on_customer(spark):
    hist = _customer_history(spark)
    upd = _customer_updates(spark)
    out = scd2_apply(hist, upd, keys=["id"], compare_cols=["name", "segment"])
    got = sorted(map(tuple, out.collect()))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW customer AS SELECT * FROM read_parquet('%s')"
        % os.path.join(SF_CORRECTNESS, "customer.parquet")
    )
    want = sorted(map(tuple, con.execute(SCD2_ORACLE_SQL).fetchall()))
    con.close()
    assert len(got) > 0 and got == want


def test_plan_history_not_shuffled(spark):
    """The dimension scan must not shuffle: batch keys broadcast into
    the change-detection semi-join, the close join and the anti join."""
    hist = _customer_history(spark)
    upd = _customer_updates(spark)
    df = scd2_apply(hist, upd, keys=["id"], compare_cols=["name", "segment"])
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastExchange") >= 3
    # the only shuffle allowed is within the batch-sized frames; the
    # customer scan feeds broadcast-probe joins directly
    assert "BroadcastHashJoin" in plan


def test_validation_errors(spark):
    hist = _tiny_history(spark)
    upd = spark.createDataFrame(
        [(1, "x", D2)], "id long, name string, effective_date date"
    )
    with pytest.raises(ValueError, match="updates is missing"):
        scd2_apply(hist, upd, keys=["id"], compare_cols=["name", "tier"])
    with pytest.raises(ValueError, match="history is missing"):
        scd2_apply(
            hist.drop("valid_to"),
            upd.withColumn("tier", F.lit("x")),
            keys=["id"], compare_cols=["name", "tier"],
        )


def test_empty_updates_is_identity(spark):
    hist = _tiny_history(spark)
    empty = spark.createDataFrame(
        [], "id long, name string, tier string, effective_date date"
    )
    out = scd2_apply(hist, empty, keys=["id"], compare_cols=["name", "tier"])
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, hist.collect()))


def test_batch_dedup_keeps_latest(spark):
    hist = _tiny_history(spark)
    updates = spark.createDataFrame(
        [
            (1, "alice", "platinum", D1),
            (1, "alice", "diamond", D2),   # later row must win
        ],
        "id long, name string, tier string, effective_date date",
    )
    out = scd2_apply(
        hist, updates, keys=["id"], compare_cols=["name", "tier"],
        dedup_order_by=["effective_date"],
    )
    open_rows = [r for r in out.collect() if r["id"] == 1 and r["is_current"]]
    assert len(open_rows) == 1 and open_rows[0]["tier"] == "diamond"


def test_scd2_table_versioned_warehouse(spark, tmp_path):
    """SCD2 composes with the snapshot-versioned storage layer:
    each batch is a new immutable snapshot; time travel reaches any
    pre-batch history; rollback re-points without data loss."""
    from lakehouse_file_format_compare_spark.storage import Warehouse

    wh = Warehouse(spark, str(tmp_path))
    b1 = spark.createDataFrame(
        [(1, "alice", "gold", D0), (2, "bob", "silver", D0)],
        "id long, name string, tier string, effective_date date",
    )
    wh.scd2_table(b1, "silver", "dim_customer", keys=["id"],
                  compare_cols=["name", "tier"])
    assert wh.current_version("silver", "dim_customer") == 1

    b2 = spark.createDataFrame(
        [(1, "alice", "platinum", D1), (3, "carol", "bronze", D1)],
        "id long, name string, tier string, effective_date date",
    )
    wh.scd2_table(b2, "silver", "dim_customer", keys=["id"],
                  compare_cols=["name", "tier"])
    assert wh.current_version("silver", "dim_customer") == 2

    cur = wh.read_table("silver", "dim_customer")
    rows = {(r["id"], r["valid_from"]): r for r in cur.collect()}
    assert len(rows) == 4  # closed v1 of id=1, open v2, bob, carol
    assert rows[(1, D0)]["is_current"] is False and rows[(1, D0)]["valid_to"] == D1
    assert rows[(1, D1)]["tier"] == "platinum" and rows[(1, D1)]["is_current"]

    # time travel: version 1 still shows the pre-batch open state
    v1 = {r["id"]: r for r in wh.read_table("silver", "dim_customer", version=1).collect()}
    assert set(v1) == {1, 2} and v1[1]["tier"] == "gold" and v1[1]["is_current"]

    # rollback then re-apply reproduces the same history
    wh.rollback("silver", "dim_customer", "parquet", 1)
    wh.scd2_table(b2, "silver", "dim_customer", keys=["id"],
                  compare_cols=["name", "tier"])
    again = {(r["id"], r["valid_from"]): tuple(r)
             for r in wh.read_table("silver", "dim_customer").collect()}
    assert again == {k: tuple(v) for k, v in rows.items()}
