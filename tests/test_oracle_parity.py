"""Every registry query must match its DuckDB oracle (driver t2 replica).

Runs at sf0.001 by default for speed; set ``SPARK_GRAFT_TEST_SF_DIR`` to
``/root/testdata/sf0.01`` for the driver-equivalent check.
"""

from __future__ import annotations

import os

import pytest

from pos_pipeline_core_etl_spark import registry
from tests.oracle_utils import compare_query

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

_ALL = registry._collect()


@pytest.mark.parametrize("name", sorted(_ALL))
def test_oracle_parity(spark, name):
    fn, sql = _ALL[name]
    compare_query(spark, name, fn, sql, sf_dir=SF_DIR)
