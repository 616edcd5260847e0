from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pos_pipeline_core_etl_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(
        app_name="tests",
        extra_conf={
            "spark.sql.shuffle.partitions": "8",
            "spark.sql.warehouse.dir": "/tmp/spark-warehouse-tests",
        },
    )
    yield spark
    spark.stop()
