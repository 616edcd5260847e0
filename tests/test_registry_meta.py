"""Registry hygiene: every oracle parses under DuckDB, names are sane."""

from __future__ import annotations

import duckdb

from pos_pipeline_core_etl_spark import registry
from tests.oracle_utils import duckdb_connection


def test_every_oracle_parses_under_duckdb():
    con = duckdb_connection("/root/testdata/sf0.001")
    try:
        for name, sql in registry.all_oracles().items():
            try:
                con.execute(f"EXPLAIN {sql}")
            except duckdb.Error as e:  # pragma: no cover - failure message aid
                raise AssertionError(f"oracle for {name!r} does not parse: {e}") from e
    finally:
        con.close()


def test_registry_names_unique_and_snake():
    names = list(registry.all_queries())
    assert len(names) == len(set(names))
    for n in names:
        assert n == n.lower() and " " not in n


def test_registry_size_floor():
    # the driver's t2 gate iterates this — shrinking it is a regression
    assert len(registry.all_queries()) >= 70
    assert len(registry.all_oracles()) >= 69
