"""Executor-side serialization helper.

The engine may be loaded by path (the driver imports
``__spark_entry__.py`` by location), in which case the package is NOT
importable by name inside executor Python workers. Any module that
defines functions shipped to executors (pandas UDFs, applyInPandas /
mapInPandas callables) must register itself for cloudpickle
pickle-BY-VALUE so the closure travels with the task instead of being
looked up by module name on the worker.
"""

from __future__ import annotations

import sys


def register_self(module_name: str) -> None:
    try:
        from pyspark import cloudpickle

        cloudpickle.register_pickle_by_value(sys.modules[module_name])
    except Exception:  # pragma: no cover - best effort; import path envs differ
        pass
