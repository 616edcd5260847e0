"""Driver-side HTTP ingestion utilities (SURVEY §2.1).

Re-expresses the reference's POS-export client shape
(``/root/reference/src/pos_core/etl/raw/extraction.py``):
- ``make_session`` (:313-356): retrying session — 429/5xx retry with
  exponential backoff and a default timeout on every request.
- ``get_csrf_from_html`` / ``require_csrf_token`` (:205-306): token
  extraction (regex-based here — no BeautifulSoup in this container).
- ``chunked_download_plan`` (:885-1039 shape): request range ∩ branch
  validity windows − already-downloaded intervals → ≤180-day chunks.

All of this is DRIVER-side orchestration by design: ingestion talks to
one remote POS endpoint; Spark's role starts at the bronze files. No
network calls happen in tests — the plan/parse pieces are pure.
"""

from __future__ import annotations

import datetime as dt
import re
from collections.abc import Iterable

from pos_pipeline_core_etl_spark.operators.intervals import (
    Interval,
    iter_chunks,
    subtract_intervals,
)

DEFAULT_TIMEOUT = 60
DEFAULT_RETRIES = 3
BACKOFF_FACTOR = 0.8
RETRY_STATUSES = (429, 500, 502, 503, 504)

_CSRF_RES = (
    re.compile(
        r'<input[^>]+name=["\']?csrf[_-]?token["\']?[^>]*value=["\']([^"\']+)["\']',
        re.IGNORECASE,
    ),
    re.compile(
        r'<meta[^>]+name=["\']csrf[_-]?token["\'][^>]*content=["\']([^"\']+)["\']',
        re.IGNORECASE,
    ),
)


def make_session(timeout: int = DEFAULT_TIMEOUT, retries: int = DEFAULT_RETRIES):
    """requests.Session with urllib3 Retry (429/5xx, backoff 0.8) and a
    default timeout applied to every request."""
    import requests
    from requests.adapters import HTTPAdapter
    from urllib3.util.retry import Retry

    session = requests.Session()
    retry = Retry(
        total=retries,
        backoff_factor=BACKOFF_FACTOR,
        status_forcelist=list(RETRY_STATUSES),
        allowed_methods=None,  # retry POSTs too (exports are POSTs)
    )
    adapter = HTTPAdapter(max_retries=retry)
    session.mount("http://", adapter)
    session.mount("https://", adapter)

    original = session.request

    def request_with_timeout(method, url, **kwargs):
        kwargs.setdefault("timeout", timeout)
        return original(method, url, **kwargs)

    session.request = request_with_timeout  # type: ignore[method-assign]
    return session


def get_csrf_from_html(html: str) -> str | None:
    for pattern in _CSRF_RES:
        m = pattern.search(html)
        if m:
            return m.group(1)
    return None


def require_csrf_token(html: str) -> str:
    token = get_csrf_from_html(html)
    if not token:
        raise ValueError("no CSRF token found in login page")
    return token


def content_disposition_filename(header: str | None) -> str | None:
    """Parse ``attachment; filename="x.xlsx"`` (order_times/raw.py analog)."""
    if not header:
        return None
    m = re.search(r'filename\*?=(?:UTF-8\'\')?["\']?([^";]+)["\']?', header)
    return m.group(1).strip() if m else None


def decode_export_payload(payload, filename_header: str | None = None) -> tuple[str, bytes]:
    """Export response → (filename, file bytes).

    Accepts the two shapes the POS API returns (extraction.py:702-713):
    a JSON object with ``fileBase64`` (+ optional ``fileName``), or a
    direct attachment body with a Content-Disposition header.
    """
    import base64

    from pos_pipeline_core_etl_spark.exceptions import ExtractionError

    if isinstance(payload, dict):
        if "fileBase64" not in payload:
            raise ExtractionError(
                f"export JSON missing 'fileBase64'; keys: {sorted(payload)}"
            )
        name = payload.get("fileName") or "export.xlsx"
        try:
            return name, base64.b64decode(payload["fileBase64"], validate=True)
        except Exception as e:
            raise ExtractionError(f"invalid base64 export payload: {e}") from e
    if isinstance(payload, (bytes, bytearray)):
        name = content_disposition_filename(filename_header) or "export.xlsx"
        return name, bytes(payload)
    raise ExtractionError(f"unsupported export payload type {type(payload).__name__}")


def chunked_download_plan(
    request: Interval,
    validity_windows: Iterable[Interval],
    already_downloaded: Iterable[Interval],
    chunk_size_days: int = 180,
) -> list[Interval]:
    """Which (start, end) chunks to fetch: request ∩ each validity
    window, minus covered intervals, split into ≤chunk_size_days."""
    req_start, req_end = request
    covered = list(already_downloaded)
    plan: list[Interval] = []
    for w_start, w_end in validity_windows:
        start = max(req_start, w_start)
        end = min(req_end, w_end)
        if start > end:
            continue
        for gap in subtract_intervals((start, end), covered):
            plan.extend(iter_chunks(gap[0], gap[1], max_days=chunk_size_days))
    return plan
