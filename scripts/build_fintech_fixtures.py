"""Materialize the deterministic fintech silver frames as committed
parquet fixtures (fixtures/fintech_silver/<table>/part-*.parquet).

These are the shared input of the ``fintech_gold_suite`` driver row:
the Spark side runs the four reference gold queries
(pipeline/gold.py <- dags/3_silver_to_gold.py) over them, and the
DuckDB oracle replicates the same queries via read_parquet on the same
files — a full value oracle instead of the rows-only check the suite
carried through r2-r4. tests/test_fintech_fixture.py asserts the
fixture equals a fresh seeded-generator run (seed 42, frozen clock,
2 batches), so end-to-end generator coverage is preserved.

Rerun after any generator/schema change:
    python scripts/build_fintech_fixtures.py
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "..", "fixtures", "fintech_silver")
GOLD_INPUT_TABLES = (
    "f_transactions", "d_transaction_types", "d_customers", "f_contracts", "d_products",
)


def main() -> None:
    from lakehouse_file_format_compare_spark.plans.fintech_plans import _frames
    from lakehouse_file_format_compare_spark.session import build_session

    spark = build_session(
        app_name="fintech-fixtures", master="local[4]", shuffle_partitions=4
    )
    frames = _frames(spark)
    root = os.path.abspath(FIXTURE_DIR)
    for name in GOLD_INPUT_TABLES:
        path = os.path.join(root, name)
        if os.path.exists(path):
            shutil.rmtree(path)
        frames[name].coalesce(1).write.mode("overwrite").parquet(path)
        # drop writer noise; keep only the data file
        for f in os.listdir(path):
            if not f.endswith(".parquet"):
                os.remove(os.path.join(path, f))
        print(f"wrote {path}: {spark.read.parquet(path).count()} rows")
    spark.stop()


if __name__ == "__main__":
    main()
