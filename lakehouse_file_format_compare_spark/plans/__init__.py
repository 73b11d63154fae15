"""Query library.

Each plan module exposes:
- pure DataFrame functions ``fn(spark, sf_dir) -> DataFrame``
- an ``ORACLES`` dict mapping query name → equivalent DuckDB SQL string

The oracle SQL lives next to the Spark implementation so the two stay
in sync; ``__spark_entry__.py`` aggregates them for the driver's
correctness gate. Column aliases MUST match between the two sides
(the driver sorts columns by name before value-hashing), and every
oracle's DuckDB output types must stay in the portable set
{VARCHAR, BIGINT, BOOLEAN, DOUBLE, DATE, TIMESTAMP, INTEGER, arrays}
— enforced by tests/test_oracle_portability.py. In particular CAST
any SUM()-derived column AS BIGINT: DuckDB types it HUGEINT (int128),
which the driver's value-hasher distinguishes from BIGINT even at
equal values (the 5-round op_approx_distinct red, r7-r11).
"""

from . import (
    adhoc,
    corpus_plans,
    dedup_plans,
    ext_plans,
    fintech_plans,
    gold,
    hygiene_plans,
    pipeline_plans,
    similarity_plans,
    streaming_plans,
    temporal_plans,
    text_plans,
    tpch,
)

# Order matters: the driver records the first 50 entries of the
# aggregated dict, so oracle-bearing modules come first and the
# registry is kept at exactly <= 50 queries (merged entries:
# op_semi_anti_join, op_rollup_cube_revenue, fintech_gold_suite;
# demoted to pytest-only: op_distinct_projection — swapped for
# corpus_build_summary in r4; op_scalar_subquery — swapped for
# corpus_hygiene_suite in r5; op_explode_token_counts — swapped for
# op_sessionization in r5).
ALL_PLAN_MODULES = (
    gold, tpch, adhoc, text_plans, dedup_plans, similarity_plans, streaming_plans,
    temporal_plans, corpus_plans, pipeline_plans, ext_plans, hygiene_plans,
    fintech_plans,
)


def all_queries():
    out = {}
    for mod in ALL_PLAN_MODULES:
        out.update(mod.QUERIES)
    return out


def all_oracles():
    out = {}
    for mod in ALL_PLAN_MODULES:
        out.update(mod.ORACLES)
    return out
