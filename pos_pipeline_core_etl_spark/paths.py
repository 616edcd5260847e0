"""Medallion filesystem layout (reference parity: ``src/pos_core/paths.py``).

Bronze (``a_raw``) holds unmodified source exports; silver
(``b_clean``) the typed facts; gold (``c_processed``) the marts. In the
rebuild silver/gold are Parquet directories (partition-pruning layout,
see ``sources/writers.py``); bronze stays raw files.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

DOMAINS = ("payments", "sales", "transfers", "order_times")


@dataclass(frozen=True)
class DataPaths:
    root: str
    raw_dir: str = field(default="a_raw")
    clean_dir: str = field(default="b_clean")
    mart_dir: str = field(default="c_processed")

    @classmethod
    def from_root(cls, root: str) -> "DataPaths":
        return cls(root=root)

    def _p(self, layer: str, domain: str) -> str:
        if domain not in DOMAINS:
            raise ValueError(f"unknown domain {domain!r}; expected one of {DOMAINS}")
        return os.path.join(self.root, layer, domain)

    def raw(self, domain: str) -> str:
        return self._p(self.raw_dir, domain)

    def clean(self, domain: str) -> str:
        return self._p(self.clean_dir, domain)

    def mart(self, domain: str) -> str:
        return self._p(self.mart_dir, domain)

    def meta(self) -> str:
        return os.path.join(self.root, "_meta")

    def ensure_dirs(self) -> None:
        for layer in (self.raw_dir, self.clean_dir, self.mart_dir):
            for domain in DOMAINS:
                os.makedirs(os.path.join(self.root, layer, domain), exist_ok=True)
        os.makedirs(self.meta(), exist_ok=True)
