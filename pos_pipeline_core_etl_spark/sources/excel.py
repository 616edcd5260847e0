"""Bronze-layer Excel ingestion (SURVEY §2.1 — driver-side parse).

Re-expresses the reference's raw-sheet handling:
- ``find_sheet_case_insensitive`` (payments_cleaner.py:83-92): exact
  then substring match, case-insensitive.
- ``detect_header_row`` (payments_cleaner.py:95-108 and the
  token-scoring variant transfer_cleaner.py:93-115): probe the first N
  raw rows for sentinel tokens / the best-scoring header row.
- ``normalize_headers`` (payments_cleaner.py:156-191): rename map +
  POSITIONAL disambiguation of duplicated headers (the two "Propina"
  columns → ``total_day_tips`` / ``ticket_tip``) + snake_case + dedup.

Raw cell grids are parsed on the DRIVER (bounded: one workbook at a
time, ``nrows``-limited header probes) and only then handed to Spark as
named, typed columns — position-dependent semantics never enter the
distributed plan (SURVEY §7.4.1). The openpyxl-backed file reader is
import-gated; all parsing logic is testable on plain cell grids.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd

from pos_pipeline_core_etl_spark.functions.names import to_snake, uniquify

HEADER_PROBE_ROWS = 40

# Spanish → canonical rename map for the payments sheet (HEADER_MAP,
# payments_cleaner.py:134-144). Duplicated source headers are listed
# once; positional resolution assigns the occurrence-specific names.
PAYMENTS_HEADER_MAP = {
    "forma de pago": "payment_method",
    "fecha de operacion": "operating_date",
    "orden": "order_index",
    "total": "ticket_total",
    "total mas propina": "ticket_total_plus_tip",
}

# positional names for repeated headers: first "Propina" is the day
# total, second is the per-ticket tip (payments_cleaner.py:156-191)
PAYMENTS_POSITIONAL = {"propina": ("total_day_tips", "ticket_tip")}

# Sales sheet: the Subtotal/IVA/IEPS/Total headers repeat in FOUR blocks
# — ticket-level, item-level, courtesy/cancellation, annulment — and
# only position distinguishes them (sales_cleaner.py:247-353).
_SALES_BLOCKS = ("ticket", "item", "cortesia_cancel", "anulacion")
SALES_POSITIONAL = {
    measure: tuple(f"{measure}_{blk}" for blk in _SALES_BLOCKS)
    for measure in ("subtotal", "iva", "ieps", "total")
}
SALES_HEADER_MAP = {
    "fecha": "operating_date",
    "orden": "order_id",
    "grupo": "group",
    "clave": "item_key",
    "cantidad": "quantity",
}
EXPECTED_SALES_BLOCKS = len(_SALES_BLOCKS)


def count_header_blocks(headers: list[str], measure: str = "subtotal") -> int:
    """How many times a block measure repeats — the reference warns when
    it isn't exactly four (sales_cleaner.py:334-340)."""
    return sum(1 for h in headers if to_snake(str(h)) == measure)


def find_sheet_case_insensitive(sheet_names: Sequence[str], target: str) -> str:
    """Exact-then-substring sheet lookup, case-insensitive."""
    low = target.lower()
    for name in sheet_names:
        if name.lower() == low:
            return name
    for name in sheet_names:
        if low in name.lower():
            return name
    raise KeyError(f"no sheet matching {target!r} in {list(sheet_names)}")


def detect_header_row(raw: pd.DataFrame, sentinels: Sequence[str], scan: int = HEADER_PROBE_ROWS) -> int:
    """First row (within ``scan``) containing any sentinel token."""
    lows = [s.lower() for s in sentinels]
    for i in range(min(scan, len(raw))):
        cells = [str(v).strip().lower() for v in raw.iloc[i].tolist()]
        if any(s in cells for s in lows):
            return i
    raise ValueError(f"no header row with sentinels {sentinels!r} in first {scan} rows")


def parse_sucursal_from_top(raw: pd.DataFrame) -> str | None:
    """Branch name from the sheet's metadata corner (sales_cleaner.py:127-146).

    POS reports carry branch metadata near the top (typically around C3):
    probe the first 6×6 cells for a ``Sucursal: <name>`` pattern. This is
    the primary resolution; the value-mode fallback
    (``plans/relational.py::value_mode``) applies when absent.
    """
    import re

    from pos_pipeline_core_etl_spark.functions.cleaning import _INVISIBLES

    head = raw.iloc[:6, :6]
    cells = []
    for _, row in head.iterrows():
        for v in row.tolist():
            s = "" if v is None or (isinstance(v, float) and v != v) else str(v)
            s = re.sub(_INVISIBLES, " ", s)
            cells.append(re.sub(r"\s+", " ", s).strip())
    flat = " | ".join(cells)
    m = re.search(r"Sucursal\s*:\s*([A-Za-z0-9\-\._\s]+)", flat, re.IGNORECASE)
    return m.group(1).strip() if m else None


def detect_header_row_scored(raw: pd.DataFrame, known_tokens: Sequence[str], scan: int = HEADER_PROBE_ROWS) -> int:
    """Best-scoring row against a known-token set (transfers variant)."""
    lows = {t.lower() for t in known_tokens}
    best, best_score = 0, -1
    for i in range(min(scan, len(raw))):
        cells = {str(v).strip().lower() for v in raw.iloc[i].tolist()}
        score = len(cells & lows)
        if score > best_score:
            best, best_score = i, score
    if best_score <= 0:
        raise ValueError("no plausible header row found")
    return best


def normalize_headers(
    headers: Sequence[str],
    rename_map: dict[str, str] | None = None,
    positional: dict[str, tuple[str, ...]] | None = None,
) -> list[str]:
    """Rename + positionally split duplicates + snake_case + uniquify."""
    rename_map = rename_map or {}
    positional = positional or {}
    seen_pos: dict[str, int] = {}
    out: list[str] = []
    for h in headers:
        key = to_snake(str(h)).replace("_", " ")
        if key in positional:
            idx = seen_pos.get(key, 0)
            names = positional[key]
            out.append(names[idx] if idx < len(names) else f"{names[-1]}_{idx + 1}")
            seen_pos[key] = idx + 1
        elif key in rename_map:
            out.append(rename_map[key])
        else:
            out.append(to_snake(str(h)))
    return uniquify(out)


def parse_sheet(
    raw: pd.DataFrame,
    sentinels: Sequence[str],
    rename_map: dict[str, str] | None = None,
    positional: dict[str, tuple[str, ...]] | None = None,
) -> pd.DataFrame:
    """Raw cell grid → named table: header detect, rename, body slice,
    drop all-empty rows/columns and unnamed columns."""
    hdr = detect_header_row(raw, sentinels)
    headers = normalize_headers(
        [str(v) for v in raw.iloc[hdr].tolist()], rename_map, positional
    )
    body = raw.iloc[hdr + 1 :].reset_index(drop=True)
    body.columns = headers
    keep = [c for c in body.columns if c and not c.startswith("unnamed")]
    body = body[keep]
    body = body.dropna(how="all")
    return body


def read_workbook(path: str, sheet: str, sentinels: Sequence[str], **kwargs) -> pd.DataFrame:
    """openpyxl-backed workbook read (import-gated)."""
    try:
        import openpyxl  # noqa: F401
    except ImportError as e:  # pragma: no cover - dep absent in container
        raise ImportError(
            "Excel ingestion requires openpyxl, which is not installed in "
            "this environment; parse pre-extracted cell grids with "
            "parse_sheet() instead"
        ) from e
    xls = pd.ExcelFile(path)  # pragma: no cover
    name = find_sheet_case_insensitive(xls.sheet_names, sheet)  # pragma: no cover
    raw = xls.parse(name, header=None, dtype=object)  # pragma: no cover
    return parse_sheet(raw, sentinels, **kwargs)  # pragma: no cover
