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
from dataclasses import dataclass

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


def decode_export_payload(
    payload, filename_header: str | None = None, default_name: str = "export.xlsx"
) -> tuple[str, bytes]:
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
        name = payload.get("fileName") or default_name
        try:
            return name, base64.b64decode(payload["fileBase64"], validate=True)
        except Exception as e:
            raise ExtractionError(f"invalid base64 export payload: {e}") from e
    if isinstance(payload, (bytes, bytearray)):
        name = content_disposition_filename(filename_header) or default_name
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


# ---------------------------------------------------------------------------
# live export orchestration (reference extraction.py:419-877), re-expressed
# against a duck-typed session (``.get``/``.post``/``.cookies``) so every leg
# is exercisable with a stubbed transport — no network in tests.

REPORT_PAGE_PATH = "/Reports/ConsolidatedSalesMasterReport"
INVENTORY_TRANSFERS_PAGE = "/Inventory/Transfers"
INVENTORY_TRANSFERS_EXPORT = "/Inventory/ExportTransfersIssued"

REPORT_ENDPOINTS = {
    "Detail": "ExportSalesDetailReport",
    "Consolidated": "Export",
    "Payments": "ExportSalesReport",
}

# the "Aplicar" warm-up set (extraction.py:92-115): the export endpoint
# serves data pre-loaded by these report AJAX calls
APLICAR_ENDPOINTS = (
    "GetConsolidatedSales",
    "CancelSalesDetail",
    "CourtesiesDetail",
    "SalesByHours",
    "SalesByGroup",
    "SalesByGroupType",
    "SalesByArea",
    "SalesBySaucer",
    "SalesByUser",
    "SalesByTypeOfOrder",
    "DiscountsDetail",
    "PersonsByHour",
    "PersonsByDay",
    "PersonsByDayName",
    "SalesByPaymentType",
    "SalesByModifiers",
    "SalesByTerminal",
    "MegaPointsReport",
    "TipByUser",
    "Promotions",
    "ChargePaymentMethod",
    "SaleNullificationDetail",
)

_FORM_RE = re.compile(r"<form\b[^>]*>(.*?)</form>", re.IGNORECASE | re.DOTALL)
_FORM_ACTION_RE = re.compile(r"<form\b[^>]*?action=[\"']([^\"']*)[\"']", re.IGNORECASE)
_INPUT_RE = re.compile(r"<input\b[^>]*>", re.IGNORECASE)
_ATTR_RE = {
    a: re.compile(rf"\b{a}=[\"']([^\"']*)[\"']", re.IGNORECASE)
    for a in ("name", "value", "type")
}


def origin_for(base_url: str) -> str:
    """scheme://netloc of a URL (extraction.py:404-417)."""
    from urllib.parse import urlparse

    p = urlparse(base_url)
    return f"{p.scheme}://{p.netloc}"


def ensure_ok(resp, msg: str) -> None:
    from pos_pipeline_core_etl_spark.exceptions import ExtractionError

    if not (200 <= resp.status_code < 300):
        raise ExtractionError(f"{msg}: HTTP {resp.status_code}")


def parse_login_form(html: str, page_url: str, base_url: str) -> tuple[str, dict[str, str]]:
    """First <form> in the page → (absolute action URL, field dict).

    Regex re-expression of the reference's BeautifulSoup walk
    (extraction.py:455-470): every named <input> contributes its value
    (empty when absent); a missing/relative action resolves against the
    page URL / origin.
    """
    from pos_pipeline_core_etl_spark.exceptions import ExtractionError

    form_m = _FORM_RE.search(html)
    if not form_m:
        raise ExtractionError("login form not found")
    action_m = _FORM_ACTION_RE.search(html[form_m.start():form_m.end()])
    action = action_m.group(1) if action_m and action_m.group(1) else page_url
    action_url = action if action.startswith("http") else f"{origin_for(base_url)}{action}"
    fields: dict[str, str] = {}
    for tag in _INPUT_RE.findall(form_m.group(1)):
        name_m = _ATTR_RE["name"].search(tag)
        if not name_m or not name_m.group(1):
            continue
        value_m = _ATTR_RE["value"].search(tag)
        fields[name_m.group(1)] = value_m.group(1) if value_m else ""
    return action_url, fields


def choose_user_field(fields: dict[str, str]) -> str | None:
    """Preferred username field name (extraction.py:359-375)."""
    for cand in ("UserName", "Email", "Login", "Username"):
        if cand in fields:
            return cand
    return None


def choose_password_field(fields: dict[str, str], html: str) -> str | None:
    """Password field from the dict, else the input[type=password] name
    (extraction.py:377-401)."""
    for cand in ("Password", "Pass", "Pwd"):
        if cand in fields:
            return cand
    for tag in _INPUT_RE.findall(html):
        type_m = _ATTR_RE["type"].search(tag)
        if type_m and type_m.group(1).lower() == "password":
            name_m = _ATTR_RE["name"].search(tag)
            if name_m and name_m.group(1):
                return name_m.group(1)
    return None


def login_if_needed(session, base_url: str, user: str | None = None, pwd: str | None = None) -> None:
    """Authenticate when the report page redirects to the login form
    (extraction.py:419-500): seed the tenant root, probe the protected
    page, parse + fill + submit the form, re-check access."""
    import os

    from pos_pipeline_core_etl_spark.exceptions import ExtractionError

    user = user if user is not None else os.environ.get("WS_USER")
    pwd = pwd if pwd is not None else os.environ.get("WS_PASS")

    session.get(f"{base_url}/")  # seed cookies some auth flows expect
    r = session.get(f"{base_url}{REPORT_PAGE_PATH}", allow_redirects=True)
    if not ("/Account/LogOn" in r.url or r.status_code == 401):
        return  # already authenticated
    if not user or not pwd:
        raise ExtractionError("login required but user/password not provided")

    action_url, fields = parse_login_form(r.text, r.url, base_url)
    user_field = choose_user_field(fields) or "UserName"
    pw_field = choose_password_field(fields, r.text) or "Password"
    if user_field not in fields or pw_field not in fields:
        raise ExtractionError(
            f"could not identify user/password fields; found: {sorted(fields)}"
        )
    fields[user_field] = user
    fields[pw_field] = pwd
    if "ReturnUrl" in fields and not fields["ReturnUrl"]:
        fields["ReturnUrl"] = REPORT_PAGE_PATH

    headers = {"Referer": r.url, "Origin": origin_for(base_url)}
    r2 = session.post(action_url, data=fields, headers=headers, allow_redirects=True)
    if r2.status_code not in (200, 302):
        raise ExtractionError(f"login POST failed: HTTP {r2.status_code}")
    test = session.get(f"{base_url}{REPORT_PAGE_PATH}")
    if test.status_code != 200 or "/Account/LogOn" in test.url:
        raise ExtractionError("login failed: still redirected to login")


def set_subsidiary_cookie(session, base_url: str, subsidiary_id: str) -> None:
    """SubsidiaryId cookie — the POS reads the target branch from it
    (extraction.py:505-522)."""
    from urllib.parse import urlparse

    dom = urlparse(base_url).hostname
    if dom:
        session.cookies.set("SubsidiaryId", str(subsidiary_id), domain=dom, path="/")


def _ajax_headers(base_url: str, referer: str, token: str) -> dict[str, str]:
    return {
        "Origin": origin_for(base_url),
        "Referer": referer,
        "X-Requested-With": "XMLHttpRequest",
        "Content-Type": "application/x-www-form-urlencoded; charset=UTF-8",
        "Accept": "*/*",
        "RequestVerificationToken": token,
    }


def _date_params(subsidiary_id: str, start: dt.date, end: dt.date) -> dict[str, str]:
    return {
        "subsidiaryId": str(subsidiary_id),
        "startDate": start.strftime("%Y-%m-%d"),
        "endDate": end.strftime("%Y-%m-%d"),
    }


def aplicar_warmup(
    session,
    base_url: str,
    report_page_url: str,
    token: str,
    subsidiary_id: str,
    start: dt.date,
    end: dt.date,
) -> None:
    """The "Aplicar" pre-load sequence (extraction.py:525-593): one probe
    POST then the full endpoint batch; 401/400/403 abort, other non-2xx
    are tolerated (matching the reference's warn-and-continue)."""
    from pos_pipeline_core_etl_spark.exceptions import ExtractionError

    if not token or not token.strip():
        raise ExtractionError("CSRF token required for aplicar_warmup")
    headers = _ajax_headers(base_url, report_page_url, token)
    params = _date_params(subsidiary_id, start, end)
    body = dict(params, __RequestVerificationToken=token)

    def post_endpoint(name: str) -> None:
        r = session.post(
            f"{base_url}/Reports/{name}", params=params, data=body, headers=headers
        )
        if r.status_code == 401:
            raise ExtractionError("401 not authenticated during warm-up")
        if r.status_code in (400, 403):
            raise ExtractionError(f"{r.status_code} CSRF/policy block on {name}")

    post_endpoint(APLICAR_ENDPOINTS[0])  # quick self-test, then the batch
    for ep in APLICAR_ENDPOINTS:
        post_endpoint(ep)


@dataclass(frozen=True)
class ReportDescriptor:
    """Config-driven export descriptor (extraction.py:596-620)."""

    export_path: str
    report_page_path: str = REPORT_PAGE_PATH
    needs_warmup: bool = True
    report_name: str = ""


ORDER_TIMES_DESCRIPTOR = ReportDescriptor(
    export_path="ExportOrderTimes", report_name="OrderTimes"
)


def _decode_export_response(r, default_name: str):
    from pos_pipeline_core_etl_spark.exceptions import ExtractionError

    ct = (r.headers.get("Content-Type") or "").lower()
    if "application/json" in ct:
        return decode_export_payload(r.json(), default_name=default_name)
    cd = r.headers.get("Content-Disposition") or ""
    if "application/vnd" in ct or "application/octet-stream" in ct or "attachment" in cd.lower():
        return decode_export_payload(r.content, cd, default_name=default_name)
    raise ExtractionError(
        f"export returned unexpected content-type {ct!r}; body starts: {(r.text or '')[:300]}"
    )


def export_report(
    session,
    base_url: str,
    descriptor: ReportDescriptor,
    subsidiary_id: str,
    start: dt.date,
    end: dt.date,
) -> tuple[str, bytes]:
    """Full export loop (extraction.py:624-721): subsidiary cookie →
    CSRF from the report page → conditional warm-up → export POST →
    payload decode (JSON base64 or attachment)."""
    from pos_pipeline_core_etl_spark.exceptions import ExtractionError

    set_subsidiary_cookie(session, base_url, subsidiary_id)
    report_page = f"{base_url}{descriptor.report_page_path}"
    r = session.get(report_page)
    ensure_ok(r, "failed to open report page")
    token = require_csrf_token(r.text)

    if descriptor.needs_warmup:
        aplicar_warmup(session, base_url, report_page, token, subsidiary_id, start, end)

    params = _date_params(subsidiary_id, start, end)
    body = dict(params, __RequestVerificationToken=token)
    r = session.post(
        f"{base_url}/Reports/{descriptor.export_path}",
        params=params,
        data=body,
        headers=_ajax_headers(base_url, report_page, token),
        allow_redirects=True,
    )
    if r.status_code == 401:
        raise ExtractionError("401 unauthorized on export — auth expired or CSRF missing")
    ensure_ok(r, f"export failed for {descriptor.report_name} {subsidiary_id} {start}..{end}")
    return _decode_export_response(r, f"{descriptor.report_name}_{start}_{end}.xlsx")


def export_sales_report(
    session, base_url: str, report: str, subsidiary_id: str, start: dt.date, end: dt.date
) -> tuple[str, bytes]:
    """Named sales export (extraction.py:724-771): Detail / Consolidated
    / Payments → descriptor → :func:`export_report`."""
    from pos_pipeline_core_etl_spark.exceptions import ExtractionError

    report = report.capitalize()
    endpoint = REPORT_ENDPOINTS.get(report)
    if not endpoint:
        raise ExtractionError(
            f"unknown sales report {report!r}; choose from: {', '.join(REPORT_ENDPOINTS)}"
        )
    descriptor = ReportDescriptor(export_path=endpoint, report_name=report)
    return export_report(session, base_url, descriptor, subsidiary_id, start, end)


def export_transfers_issued(
    session, base_url: str, subsidiary_id: str, start: dt.date, end: dt.date
) -> tuple[str, bytes]:
    """Inventory ▸ Transfers ▸ Issued export (extraction.py:790-877):
    CSRF from the transfers page, subsidiary cookie, form POST with the
    transfers-specific fields, payload decode."""
    from pos_pipeline_core_etl_spark.exceptions import ExtractionError

    page_url = f"{base_url}{INVENTORY_TRANSFERS_PAGE}"
    r = session.get(page_url)
    ensure_ok(r, "failed to open Inventory Transfers page")
    token = require_csrf_token(r.text)
    set_subsidiary_cookie(session, base_url, subsidiary_id)

    form = dict(
        _date_params(subsidiary_id, start, end),
        transferReference="",
        status="0",
        __RequestVerificationToken=token,
    )
    r = session.post(
        f"{base_url}{INVENTORY_TRANSFERS_EXPORT}",
        data=form,
        headers=_ajax_headers(base_url, page_url, token),
        allow_redirects=True,
    )
    if r.status_code == 401:
        raise ExtractionError("ExportTransfersIssued returned 401 (unauthorized)")
    ensure_ok(r, "ExportTransfersIssued failed")
    return _decode_export_response(r, f"TransfersIssued_{start}_{end}.xlsx")
