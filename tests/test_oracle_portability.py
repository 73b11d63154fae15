"""Registry-wide oracle output-type portability contract (r11 verdict
#2).

The driver's value-hasher serializes DuckDB HUGEINT (int128)
differently from BIGINT *at equal values* — the root cause of the
5-round ``op_approx_distinct`` driver-red (rows ✓ / schema ✓ / hash ✗):
``mg_top1_lb`` / ``mg_bound_total`` were uncast ``SUM()``-derived
columns, the only HUGEINT outputs across all 50 oracles. The repo's
own pytest oracle (tests/oracle.py) fetches native Python ints, so it
can NEVER see the difference — this test checks the *declared* DuckDB
types instead, so any future SUM-derived widening (HUGEINT) or
DECIMAL-typed aggregate fails loudly here before it reaches a driver
round.

Portable set = the types every driver row has historically hashed
green on: VARCHAR, BIGINT, BOOLEAN, DOUBLE, DATE, TIMESTAMP, and
arrays thereof. Anything else (HUGEINT, DECIMAL, INTEGER/SMALLINT
narrowings, FLOAT) must be CAST in the oracle SQL to the type the
Spark side actually produces.
"""

from __future__ import annotations

import pytest

from lakehouse_file_format_compare_spark.plans import all_oracles

from .conftest import SF_CORRECTNESS
from .oracle import duck_connection

PORTABLE_BASE_TYPES = {
    "VARCHAR",
    "BIGINT",
    "BOOLEAN",
    "DOUBLE",
    "DATE",
    "TIMESTAMP",
    # INTEGER is empirically portable: 5 registry rows (op_filter_project's
    # parquet-sourced l_linenumber, the sim_knn_* literal k, mm_image_features
    # width/height/channels) have emitted it every round since they landed
    # and have always hashed green at the driver — int32 vs int32 on both
    # sides. The proven-dangerous widenings are HUGEINT and DECIMAL, which
    # stay excluded.
    "INTEGER",
}

ORACLES = all_oracles()


def _base_type(duck_type: str) -> str:
    """Strip array suffixes: 'BIGINT[]' / 'DOUBLE[][]' → base name."""
    t = duck_type.strip()
    while t.endswith("[]"):
        t = t[: -2].strip()
    return t


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_CORRECTNESS)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_output_types_are_portable(duck, name):
    desc = duck.execute(f"DESCRIBE ({ORACLES[name]})").fetchall()
    bad = [
        (col, typ)
        for col, typ, *_ in desc
        if _base_type(typ) not in PORTABLE_BASE_TYPES
    ]
    assert not bad, (
        f"{name}: non-portable DuckDB output types {bad} — CAST them in "
        "the oracle SQL (HUGEINT/DECIMAL hash differently from BIGINT at "
        "the driver even at equal values; see plans/adhoc.py mg_* note)"
    )
