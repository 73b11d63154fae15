from __future__ import annotations

import pytest

from lakehouse_file_format_compare_spark.session import build_session

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = build_session(app_name="lakehouse-ffc-tests", master="local[8]", shuffle_partitions=8)
    yield spark
    from lakehouse_file_format_compare_spark.functions.cacheslot import clear_slots

    clear_slots()
