"""Raw/clean tree interval discovery (SURVEY §2.12).

Re-expresses the reference's filesystem coverage scans
(``/root/reference/src/pos_core/etl/utils.py:250-405``): walk a bronze
directory layout, extract the date range each export file covers —
primarily from the chunk directory name ``<start>_<end>``, falling back
to the filename — and merge per-branch-code intervals. The result is the
``already_downloaded`` input of
:func:`sources.http_client.chunked_download_plan`, closing the
discover → plan → fetch incremental loop.

Driver-side by design: these trees are ingestion staging (hundreds of
files), not data-sized. The data-sized analog is Parquet partition
listing, which the silver/gold layers use instead.

Expected bronze layout (utils.py:270-271)::

    <root>/<branch>/<code>/<start>_<end>/Payments_*.xlsx
"""

from __future__ import annotations

import datetime as dt
import re
from pathlib import Path

from pos_pipeline_core_etl_spark.operators.intervals import Interval, merge_intervals

# chunk directory: 2022-11-01_2023-04-29  (utils.py:31)
CHUNK_DIR_RE = re.compile(r"^(?P<start>\d{4}-\d{2}-\d{2})_(?P<end>\d{4}-\d{2}-\d{2})$")

# raw export file: Payments_<label>_YYYY-MM-DD_YYYY-MM-DD.xlsx  (utils.py:34-38)
FILE_DATE_RE = re.compile(
    r"^Payments_(?P<label>.+?)_(?P<start>\d{4}-\d{2}-\d{2})_(?P<end>\d{4}-\d{2}-\d{2})\.xlsx$",
    re.IGNORECASE,
)

# clean csv: forma_pago_<sucursal_slug>_<start>_<end>.csv  (utils.py:40-43)
CLEAN_CSV_RE = re.compile(
    r"^forma_pago_.+?_(?P<start>\d{4}-\d{2}-\d{2})_(?P<end>\d{4}-\d{2}-\d{2})\.csv$",
    re.IGNORECASE,
)


def _parse(s: str) -> dt.date:
    return dt.date.fromisoformat(s)


def discover_existing_intervals(
    raw_root: str | Path, file_glob: str = "Payments_*.xlsx"
) -> dict[str, list[Interval]]:
    """Scan a bronze tree for export files; merged intervals per code.

    Mirrors utils.py:250-316: the branch code is the grandparent
    directory of each file, dates come from the chunk directory name
    when it matches, else from the filename; files matching neither are
    skipped.
    """
    root = Path(raw_root)
    found: dict[str, list[Interval]] = {}
    if not root.exists():
        return found
    for path in root.rglob(file_glob):
        chunk_dir = path.parent
        code = chunk_dir.parent.name
        m = CHUNK_DIR_RE.match(chunk_dir.name)
        if m:
            start, end = _parse(m.group("start")), _parse(m.group("end"))
        else:
            m2 = FILE_DATE_RE.match(path.name)
            if not m2:
                continue
            start, end = _parse(m2.group("start")), _parse(m2.group("end"))
        found.setdefault(code, []).append((start, end))
    return {code: merge_intervals(ivs) for code, ivs in found.items()}


def discover_existing_clean_intervals(clean_root: str | Path) -> list[Interval]:
    """Scan a silver tree for clean CSVs; one merged interval list
    (utils.py:319-364 — clean files don't preserve the code structure)."""
    root = Path(clean_root)
    found: list[Interval] = []
    if not root.exists():
        return found
    for path in root.rglob("*.csv"):
        m = CLEAN_CSV_RE.match(path.name)
        if not m:
            continue
        try:
            found.append((_parse(m.group("start")), _parse(m.group("end"))))
        except ValueError:
            continue
    return merge_intervals(found)


def get_raw_file_date_range(raw_file: str | Path) -> Interval | None:
    """Date range of one export file: chunk dir first, filename fallback
    (utils.py:367-405)."""
    path = Path(raw_file)
    m = CHUNK_DIR_RE.match(path.parent.name)
    if m:
        try:
            return (_parse(m.group("start")), _parse(m.group("end")))
        except ValueError:
            pass
    m2 = FILE_DATE_RE.match(path.name)
    if m2:
        try:
            return (_parse(m2.group("start")), _parse(m2.group("end")))
        except ValueError:
            pass
    return None
