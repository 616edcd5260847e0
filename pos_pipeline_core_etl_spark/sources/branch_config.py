"""Branch (sucursal) dimension with validity windows (SURVEY §1.1.5).

Reference parity: ``CodeWindow`` / ``load_branch_config`` /
``BranchRegistry`` (``/root/reference/src/pos_core/etl/branch_config.py:
21-87``, ``branches.py:21-126``): branch → POS-code mappings with
``valid_from``/``valid_to`` windows (SCD-2), loaded from
``sucursales.json``, with overlap validation, point-in-time resolution,
and the CEDIS exclusion set.

Config handling is driver-side (a handful of branches); for data-plane
joins the registry converts to a broadcast DataFrame with a range
predicate (see ``plans.relational.join_validity_window`` for the join
shape).
"""

from __future__ import annotations

import datetime as dt
import json
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

EXCLUDED_BRANCHES = {"CEDIS"}  # etl/branch_config.py:17


@dataclass(frozen=True)
class CodeWindow:
    code: str
    valid_from: dt.date
    valid_to: dt.date | None  # None = open-ended

    def contains(self, day: dt.date) -> bool:
        return self.valid_from <= day and (self.valid_to is None or day <= self.valid_to)


def _parse_date(s: str | None) -> dt.date | None:
    return None if s is None else dt.date.fromisoformat(s)


def _logical_name(name: str) -> str:
    """Suffixed names (``Kavia_OLD``) group to the logical branch."""
    return name.split("_")[0]


def load_branch_config(
    config: dict | str, include_excluded: bool = False
) -> dict[str, list[CodeWindow]]:
    """``{name: {code, valid_from, valid_to}}`` (or a JSON path) →
    logical branch → sorted windows; overlapping windows are an error."""
    if isinstance(config, str):
        with open(config, encoding="utf-8") as f:
            config = json.load(f)
    out: dict[str, list[CodeWindow]] = {}
    for raw_name, spec in config.items():
        name = _logical_name(raw_name)
        if not include_excluded and name in EXCLUDED_BRANCHES:
            continue
        specs = spec if isinstance(spec, list) else [spec]
        for s in specs:
            out.setdefault(name, []).append(
                CodeWindow(
                    code=str(s["code"]),
                    valid_from=_parse_date(s["valid_from"]),
                    valid_to=_parse_date(s.get("valid_to")),
                )
            )
    for name, windows in out.items():
        windows.sort(key=lambda w: w.valid_from)
        for a, b in zip(windows, windows[1:]):
            a_end = a.valid_to or dt.date.max
            if b.valid_from <= a_end:
                raise ValueError(
                    f"overlapping validity windows for branch {name!r}: "
                    f"{a} vs {b}"
                )
    return out


class BranchRegistry:
    """Point-in-time branch→code resolution (branches.py:21-126)."""

    def __init__(self, windows: dict[str, list[CodeWindow]]):
        self._windows = windows

    @property
    def branches(self) -> list[str]:
        return sorted(self._windows)

    def get_code_for_date(self, branch: str, day: dt.date) -> str | None:
        for w in self._windows.get(branch, ()):
            if w.contains(day):
                return w.code
        return None

    def windows_for(self, branch: str) -> list[CodeWindow]:
        return list(self._windows.get(branch, ()))

    def to_dataframe(self, spark: SparkSession) -> DataFrame:
        """Broadcast-able dimension: (sucursal, code, valid_from, valid_to)."""
        rows = [
            (b, w.code, w.valid_from, w.valid_to)
            for b, ws in self._windows.items()
            for w in ws
        ]
        return spark.createDataFrame(
            rows, "sucursal string, code string, valid_from date, valid_to date"
        )
