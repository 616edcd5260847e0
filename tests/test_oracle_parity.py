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

# Default pytest budget (VERDICT r12 #2): the full 241-query sweep alone
# costs ~550 s, so the default run keeps a DETERMINISTIC 1-in-5 sample
# (same subset every run — no rotation, failures reproduce) and marks
# the rest ``slow``.  The full sweep still runs every round via
# tools/verify_replica.py and the driver's own t2 gate; locally:
# pytest --runslow (or SPARK_GRAFT_FULL_TESTS=1).
_SAMPLE_EVERY = 5

# measured outliers (10-40 s EACH at sf0.001 — recursive-CTE oracles and
# multi-stage corpus compositions): always slow regardless of sample
# position, or four queries alone would eat ~100 s of the default budget
_ALWAYS_SLOW = {
    "corpus_build_manifest",
    "corpus_build_manifest_decon",
    "corpus_decon_decisions",
    "corpus_prep_decisions",
    "dedup_ngram_jaccard",
    "dedup_minhash_recall",
    "dedup_containment_recall",
    "fuzzy_part_entities_final",
    "fuzzy_part_entities_recall",
}

_PARAMS = [
    pytest.param(
        name,
        marks=()
        if i % _SAMPLE_EVERY == 0 and name not in _ALWAYS_SLOW
        else (pytest.mark.slow,),
        id=name,
    )
    for i, name in enumerate(sorted(_ALL))
]


@pytest.mark.parametrize("name", _PARAMS)
def test_oracle_parity(spark, name):
    fn, sql = _ALL[name]
    compare_query(spark, name, fn, sql, sf_dir=SF_DIR)
