"""Driver-side ingestion parsing: Excel grids, headers, HTTP client plan."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest

from pos_pipeline_core_etl_spark.functions.names import (
    normalize_for_match,
    slugify,
    to_snake,
    uniquify,
)
from pos_pipeline_core_etl_spark.sources.excel import (
    PAYMENTS_HEADER_MAP,
    PAYMENTS_POSITIONAL,
    detect_header_row,
    detect_header_row_scored,
    find_sheet_case_insensitive,
    normalize_headers,
    parse_sheet,
)
from pos_pipeline_core_etl_spark.sources.http_client import (
    chunked_download_plan,
    content_disposition_filename,
    get_csrf_from_html,
    make_session,
    require_csrf_token,
)

D = dt.date


class TestNames:
    def test_to_snake(self):
        assert to_snake("Fecha de Operación") == "fecha_de_operacion"
        assert to_snake("Total + Propina") == "total_propina"

    def test_uniquify(self):
        assert uniquify(["a", "b", "a", "a"]) == ["a", "b", "a_2", "a_3"]

    def test_slugify(self):
        assert slugify("Sucursal Ñoño #3") == "sucursal-nono-3"

    def test_normalize_for_match(self):
        assert normalize_for_match("  Número   de  PDV ") == "numero de pdv"


class TestExcelParsing:
    def test_find_sheet(self):
        names = ["Hoja1", "Detalle por Forma de Pago", "Resumen"]
        assert find_sheet_case_insensitive(names, "detalle por forma de pago") == names[1]
        assert find_sheet_case_insensitive(names, "forma de pago") == names[1]
        with pytest.raises(KeyError):
            find_sheet_case_insensitive(names, "nope")

    def _raw_grid(self):
        return pd.DataFrame(
            [
                ["Reporte", None, None, None, None, None],
                ["Sucursal: Kavia", None, None, None, None, None],
                [
                    "Forma de pago",
                    "Fecha de Operación",
                    "Orden",
                    "Propina",
                    "Propina",
                    "Total",
                ],
                ["Efectivo", "2024-01-01", "1", "50.0", "5.0", "100.0"],
                ["Tarjeta Crédito", "2024-01-01", "2", "50.0", "7.5", "200.0"],
                [None, None, None, None, None, None],
            ]
        )

    def test_detect_header_row(self):
        assert detect_header_row(self._raw_grid(), ["Forma de pago"]) == 2
        with pytest.raises(ValueError):
            detect_header_row(self._raw_grid(), ["Día"])

    def test_parse_sucursal_from_top(self):
        """Reference sales_cleaner.py:127-146: 'Sucursal: <name>' probe
        over the top-left 6x6 grid, preferred over the mode fallback."""
        from pos_pipeline_core_etl_spark.sources.excel import parse_sucursal_from_top

        assert parse_sucursal_from_top(self._raw_grid()) == "Kavia"
        # metadata at C3-ish position (row 2, col 2) still found
        grid = pd.DataFrame([[None] * 6] * 6)
        grid.iloc[2, 2] = "Sucursal: CEDIS"  # NBSP noise stripped
        assert parse_sucursal_from_top(grid) == "CEDIS"
        # outside the 6x6 corner -> not found
        grid2 = pd.DataFrame([[None] * 8] * 8)
        grid2.iloc[7, 0] = "Sucursal: Lejos"
        assert parse_sucursal_from_top(grid2) is None
        assert parse_sucursal_from_top(self._raw_grid().iloc[2:]) is None

    def test_detect_header_row_scored(self):
        assert (
            detect_header_row_scored(self._raw_grid(), ["orden", "total", "propina"])
            == 2
        )

    def test_positional_propina_split(self):
        headers = normalize_headers(
            ["Forma de pago", "Fecha de Operación", "Orden", "Propina", "Propina", "Total"],
            PAYMENTS_HEADER_MAP,
            PAYMENTS_POSITIONAL,
        )
        assert headers == [
            "payment_method",
            "operating_date",
            "order_index",
            "total_day_tips",
            "ticket_tip",
            "ticket_total",
        ]

    def test_parse_sheet_end_to_end(self):
        body = parse_sheet(
            self._raw_grid(),
            ["Forma de pago"],
            PAYMENTS_HEADER_MAP,
            PAYMENTS_POSITIONAL,
        )
        assert list(body.columns) == [
            "payment_method",
            "operating_date",
            "order_index",
            "total_day_tips",
            "ticket_tip",
            "ticket_total",
        ]
        assert len(body) == 2  # footer all-null row dropped
        assert body.iloc[0]["payment_method"] == "Efectivo"


class TestHttpClient:
    def test_csrf_extraction(self):
        html = '<form><input type="hidden" name="csrf_token" value="abc123"></form>'
        assert get_csrf_from_html(html) == "abc123"
        meta = '<meta name="csrf-token" content="xyz">'
        assert get_csrf_from_html(meta) == "xyz"
        assert get_csrf_from_html("<html></html>") is None
        with pytest.raises(ValueError):
            require_csrf_token("<html></html>")

    def test_content_disposition(self):
        assert (
            content_disposition_filename('attachment; filename="Payments_2024.xlsx"')
            == "Payments_2024.xlsx"
        )
        assert content_disposition_filename(None) is None

    def test_session_is_configured(self):
        s = make_session(timeout=5, retries=2)
        adapter = s.get_adapter("https://example.com")
        assert adapter.max_retries.total == 2
        assert 429 in adapter.max_retries.status_forcelist

    def test_chunked_download_plan(self):
        plan = chunked_download_plan(
            request=(D(2024, 1, 1), D(2024, 12, 31)),
            validity_windows=[(D(2023, 6, 1), D(2024, 6, 30))],
            already_downloaded=[(D(2024, 2, 1), D(2024, 2, 29))],
            chunk_size_days=60,
        )
        # window clamps to Jan-Jun; Feb already covered → Jan + Mar-Jun
        assert plan[0] == (D(2024, 1, 1), D(2024, 1, 31))
        assert plan[1][0] == D(2024, 3, 1)
        assert plan[-1][1] == D(2024, 6, 30)
        assert all((e - s).days < 60 for s, e in plan)


class TestExportPayload:
    def test_base64_json(self):
        import base64

        from pos_pipeline_core_etl_spark.sources.http_client import decode_export_payload

        name, data = decode_export_payload(
            {"fileBase64": base64.b64encode(b"xlsx-bytes").decode(), "fileName": "r.xlsx"}
        )
        assert (name, data) == ("r.xlsx", b"xlsx-bytes")

    def test_direct_attachment(self):
        from pos_pipeline_core_etl_spark.sources.http_client import decode_export_payload

        name, data = decode_export_payload(
            b"raw", filename_header='attachment; filename="f.xlsx"'
        )
        assert (name, data) == ("f.xlsx", b"raw")

    def test_missing_key_raises(self):
        import pytest

        from pos_pipeline_core_etl_spark.exceptions import ExtractionError
        from pos_pipeline_core_etl_spark.sources.http_client import decode_export_payload

        with pytest.raises(ExtractionError, match="fileBase64"):
            decode_export_payload({"other": 1})
        with pytest.raises(ExtractionError, match="base64"):
            decode_export_payload({"fileBase64": "!!not-base64!!"})


class TestDataPaths:
    def test_layout_and_ensure(self, tmp_path):
        from pos_pipeline_core_etl_spark.paths import DataPaths

        p = DataPaths.from_root(str(tmp_path))
        p.ensure_dirs()
        import os

        assert os.path.isdir(p.raw("payments"))
        assert os.path.isdir(p.clean("sales"))
        assert os.path.isdir(p.mart("transfers"))
        assert os.path.isdir(p.meta())
        import pytest

        with pytest.raises(ValueError):
            p.raw("bogus")


class TestExcelToSilver:
    def test_parsed_grid_flows_to_typed_silver(self, spark):
        """Bronze grid → parse_sheet → createDataFrame → clean_payments:
        the full bronze→silver path with positional headers, mixed
        formats, and the eliminations join."""
        import pandas as pd

        from pos_pipeline_core_etl_spark.operators.cleaners import clean_payments
        from pos_pipeline_core_etl_spark.sources.excel import (
            PAYMENTS_HEADER_MAP,
            PAYMENTS_POSITIONAL,
            parse_sheet,
        )

        grid = pd.DataFrame(
            [
                ["Reporte", None, None, None, None, None],
                ["Forma de pago", "Fecha de Operación", "Orden", "Propina", "Propina", "Total"],
                ["Efectivo", "2024-01-01", "1", "12.5", "5.0", "$1,100.50"],
                ["Tarjeta Crédito", "02/01/2024", "2", "12.5", "7.5", "(200.00)"],
                [None, None, None, None, None, None],
            ]
        )
        body = parse_sheet(grid, ["Forma de pago"], PAYMENTS_HEADER_MAP, PAYMENTS_POSITIONAL)
        raw = spark.createDataFrame(body.astype(str))
        elim = spark.createDataFrame([("2024-01-01", "1")], "operating_date string, order_index string")
        silver = clean_payments(raw, elim, sucursal_hint="Kavia")
        rows = {r["order_index"]: r for r in silver.collect()}
        import datetime as dt

        assert rows[1]["operating_date"] == dt.date(2024, 1, 1)
        assert rows[2]["operating_date"] == dt.date(2024, 1, 2)  # dd/MM
        assert rows[1]["ticket_total"] == 1100.50
        assert rows[2]["ticket_total"] == -200.0  # parens negative
        assert rows[1]["elimination_present"] is True
        assert rows[2]["elimination_present"] is False


class TestSalesFourBlockHeaders:
    def test_four_block_positional_split(self):
        from pos_pipeline_core_etl_spark.sources.excel import (
            EXPECTED_SALES_BLOCKS,
            SALES_HEADER_MAP,
            SALES_POSITIONAL,
            count_header_blocks,
            normalize_headers,
        )

        headers = ["Fecha", "Orden", "Grupo"]
        for _ in range(4):
            headers += ["Subtotal", "IVA", "IEPS", "Total"]
        out = normalize_headers(headers, SALES_HEADER_MAP, SALES_POSITIONAL)
        assert out[:3] == ["operating_date", "order_id", "group"]
        assert out[3:7] == ["subtotal_ticket", "iva_ticket", "ieps_ticket", "total_ticket"]
        assert out[7:11] == ["subtotal_item", "iva_item", "ieps_item", "total_item"]
        assert out[11:15] == [
            "subtotal_cortesia_cancel",
            "iva_cortesia_cancel",
            "ieps_cortesia_cancel",
            "total_cortesia_cancel",
        ]
        assert out[15:] == [
            "subtotal_anulacion",
            "iva_anulacion",
            "ieps_anulacion",
            "total_anulacion",
        ]
        assert count_header_blocks(headers) == EXPECTED_SALES_BLOCKS

    def test_extra_block_gets_numbered_suffix(self):
        from pos_pipeline_core_etl_spark.sources.excel import (
            SALES_POSITIONAL,
            normalize_headers,
        )

        out = normalize_headers(["Subtotal"] * 5, None, SALES_POSITIONAL)
        assert out[4] == "subtotal_anulacion_5"  # beyond 4 blocks → numbered


# ---------------------------------------------------------------------------
# live export orchestration against a stubbed transport (extraction legs)


class _Resp:
    def __init__(self, status=200, text="", url="", headers=None, json_body=None, content=b""):
        self.status_code = status
        self.text = text
        self.url = url
        self.headers = headers or {}
        self._json = json_body
        self.content = content

    def json(self):
        return self._json


class _Cookies:
    def __init__(self):
        self.set_calls = []

    def set(self, name, value, **kw):
        self.set_calls.append((name, value, kw))


class _StubSession:
    """Duck-typed requests.Session: routes (method, url-prefix) -> responses."""

    def __init__(self, routes):
        self.routes = routes
        self.calls = []
        self.cookies = _Cookies()

    def _dispatch(self, method, url, **kw):
        self.calls.append((method, url, kw))
        for (m, prefix), resp in self.routes.items():
            if m == method and url.startswith(prefix):
                return resp(url, kw) if callable(resp) else resp
        raise AssertionError(f"unrouted {method} {url}")

    def get(self, url, **kw):
        return self._dispatch("GET", url, **kw)

    def post(self, url, **kw):
        return self._dispatch("POST", url, **kw)


BASE = "https://pos.example.com"

LOGIN_HTML = """
<html><body>
<form action="/Account/LogOn" method="post">
  <input name="UserName" value="" />
  <input type="password" name="Password" value="" />
  <input type="hidden" name="ReturnUrl" value="" />
  <input type="hidden" name="__RequestVerificationToken" value="tok123" />
</form>
</body></html>
"""

REPORT_HTML = '<input name="csrf_token" value="csrf-abc" />'


class TestLoginIfNeeded:
    def test_no_login_needed(self):
        from pos_pipeline_core_etl_spark.sources.http_client import (
            REPORT_PAGE_PATH,
            login_if_needed,
        )

        s = _StubSession({
            ("GET", BASE + "/"): _Resp(200, url=BASE + "/"),
            ("GET", BASE + REPORT_PAGE_PATH): _Resp(200, url=BASE + REPORT_PAGE_PATH),
        })
        login_if_needed(s, BASE, "u", "p")  # no exception, no POST
        assert not [c for c in s.calls if c[0] == "POST"]

    def test_full_login_flow(self):
        from pos_pipeline_core_etl_spark.sources.http_client import (
            REPORT_PAGE_PATH,
            login_if_needed,
        )

        state = {"authed": False}

        def report_page(url, kw):
            if state["authed"]:
                return _Resp(200, url=url)
            return _Resp(200, text=LOGIN_HTML, url=BASE + "/Account/LogOn?ReturnUrl=x")

        def do_login(url, kw):
            data = kw["data"]
            assert data["UserName"] == "user1"
            assert data["Password"] == "pw1"
            assert data["ReturnUrl"] == REPORT_PAGE_PATH  # empty field filled
            assert data["__RequestVerificationToken"] == "tok123"
            assert kw["headers"]["Origin"] == BASE
            state["authed"] = True
            return _Resp(302, url=BASE + REPORT_PAGE_PATH)

        s = _StubSession({
            ("GET", BASE + "/Reports"): report_page,
            ("GET", BASE + "/"): _Resp(200, url=BASE + "/"),
            ("POST", BASE + "/Account/LogOn"): do_login,
        })
        login_if_needed(s, BASE, "user1", "pw1")
        assert state["authed"]

    def test_missing_credentials_raises(self, monkeypatch):
        from pos_pipeline_core_etl_spark.exceptions import ExtractionError
        from pos_pipeline_core_etl_spark.sources.http_client import login_if_needed

        monkeypatch.delenv("WS_USER", raising=False)
        monkeypatch.delenv("WS_PASS", raising=False)
        s = _StubSession({
            ("GET", BASE + "/Reports"): _Resp(200, text=LOGIN_HTML, url=BASE + "/Account/LogOn"),
            ("GET", BASE + "/"): _Resp(200, url=BASE + "/"),
        })
        with pytest.raises(ExtractionError, match="login required"):
            login_if_needed(s, BASE)

    def test_failed_login_raises(self):
        from pos_pipeline_core_etl_spark.exceptions import ExtractionError
        from pos_pipeline_core_etl_spark.sources.http_client import login_if_needed

        s = _StubSession({
            ("GET", BASE + "/Reports"): _Resp(200, text=LOGIN_HTML, url=BASE + "/Account/LogOn"),
            ("GET", BASE + "/"): _Resp(200, url=BASE + "/"),
            ("POST", BASE + "/Account/LogOn"): _Resp(302, url=BASE + "/Account/LogOn"),
        })
        with pytest.raises(ExtractionError, match="still redirected"):
            login_if_needed(s, BASE, "u", "p")


class TestAplicarWarmup:
    def _session(self, fail_ep=None, fail_status=403):
        from pos_pipeline_core_etl_spark.sources.http_client import APLICAR_ENDPOINTS

        posted = []

        def reports(url, kw):
            ep = url.rsplit("/", 1)[1]
            posted.append(ep)
            if fail_ep and ep == fail_ep:
                return _Resp(fail_status)
            assert kw["headers"]["RequestVerificationToken"] == "tok"
            assert kw["data"]["__RequestVerificationToken"] == "tok"
            assert kw["params"]["startDate"] == "2024-01-01"
            return _Resp(200)

        return _StubSession({("POST", BASE + "/Reports/"): reports}), posted

    def test_probe_plus_batch(self):
        import datetime as dt

        from pos_pipeline_core_etl_spark.sources.http_client import (
            APLICAR_ENDPOINTS,
            aplicar_warmup,
        )

        s, posted = self._session()
        aplicar_warmup(s, BASE, BASE + "/Reports/X", "tok", "6161",
                       dt.date(2024, 1, 1), dt.date(2024, 1, 31))
        # probe (first endpoint) + the full batch
        assert posted == [APLICAR_ENDPOINTS[0], *APLICAR_ENDPOINTS]
        assert len(APLICAR_ENDPOINTS) == 22  # reference extraction.py:92-115

    def test_csrf_block_raises(self):
        import datetime as dt

        from pos_pipeline_core_etl_spark.exceptions import ExtractionError
        from pos_pipeline_core_etl_spark.sources.http_client import aplicar_warmup

        s, _ = self._session(fail_ep="SalesByHours", fail_status=403)
        with pytest.raises(ExtractionError, match="403"):
            aplicar_warmup(s, BASE, BASE + "/r", "tok", "6161",
                           dt.date(2024, 1, 1), dt.date(2024, 1, 31))

    def test_empty_token_raises(self):
        import datetime as dt

        from pos_pipeline_core_etl_spark.exceptions import ExtractionError
        from pos_pipeline_core_etl_spark.sources.http_client import aplicar_warmup

        s, _ = self._session()
        with pytest.raises(ExtractionError, match="CSRF token"):
            aplicar_warmup(s, BASE, BASE + "/r", "  ", "6161",
                           dt.date(2024, 1, 1), dt.date(2024, 1, 31))


class TestExportReport:
    def _routes(self, export_resp):
        from pos_pipeline_core_etl_spark.sources.http_client import REPORT_PAGE_PATH

        return {
            ("GET", BASE + REPORT_PAGE_PATH): _Resp(
                200, text=REPORT_HTML, url=BASE + REPORT_PAGE_PATH
            ),
            ("POST", BASE + "/Reports/"): export_resp,
        }

    def test_json_base64_payload(self):
        import base64
        import datetime as dt

        from pos_pipeline_core_etl_spark.sources.http_client import (
            export_sales_report,
        )

        warmed = []

        def reports(url, kw):
            ep = url.rsplit("?", 1)[0].rsplit("/", 1)[1]
            if ep == "ExportSalesReport":
                return _Resp(
                    200,
                    headers={"Content-Type": "application/json"},
                    json_body={
                        "fileName": "pagos.xlsx",
                        "fileBase64": base64.b64encode(b"XLSX-BYTES").decode(),
                    },
                )
            warmed.append(ep)
            return _Resp(200)

        s = _StubSession(self._routes(reports))
        name, content = export_sales_report(
            s, BASE, "payments", "6161", dt.date(2024, 1, 1), dt.date(2024, 1, 31)
        )
        assert (name, content) == ("pagos.xlsx", b"XLSX-BYTES")
        assert len(warmed) == 23  # warm-up ran: probe + 22 endpoints
        assert ("SubsidiaryId", "6161") == s.cookies.set_calls[0][:2]

    def test_attachment_payload_no_warmup(self):
        import datetime as dt

        from pos_pipeline_core_etl_spark.sources.http_client import (
            ReportDescriptor,
            export_report,
        )

        def reports(url, kw):
            assert "ExportOrderTimes" in url
            return _Resp(
                200,
                headers={
                    "Content-Type": "application/vnd.openxmlformats",
                    "Content-Disposition": 'attachment; filename="ot.xlsx"',
                },
                content=b"RAW",
            )

        s = _StubSession(self._routes(reports))
        d = ReportDescriptor(export_path="ExportOrderTimes", needs_warmup=False,
                             report_name="OrderTimes")
        name, content = export_report(s, BASE, d, "6161",
                                      dt.date(2024, 1, 1), dt.date(2024, 1, 31))
        assert (name, content) == ("ot.xlsx", b"RAW")
        # only csrf GET + export POST (no warm-up posts)
        assert len([c for c in s.calls if c[0] == "POST"]) == 1

    def test_unknown_report_raises(self):
        import datetime as dt

        from pos_pipeline_core_etl_spark.exceptions import ExtractionError
        from pos_pipeline_core_etl_spark.sources.http_client import export_sales_report

        with pytest.raises(ExtractionError, match="unknown sales report"):
            export_sales_report(_StubSession({}), BASE, "nope", "1",
                                dt.date(2024, 1, 1), dt.date(2024, 1, 2))

    def test_html_response_raises(self):
        import datetime as dt

        from pos_pipeline_core_etl_spark.exceptions import ExtractionError
        from pos_pipeline_core_etl_spark.sources.http_client import (
            ReportDescriptor,
            export_report,
        )

        s = _StubSession(self._routes(
            _Resp(200, headers={"Content-Type": "text/html"}, text="<html>err")
        ))
        d = ReportDescriptor(export_path="X", needs_warmup=False)
        with pytest.raises(ExtractionError, match="unexpected content-type"):
            export_report(s, BASE, d, "1", dt.date(2024, 1, 1), dt.date(2024, 1, 2))


class TestExportTransfersIssued:
    def test_full_flow(self):
        import base64
        import datetime as dt

        from pos_pipeline_core_etl_spark.sources.http_client import (
            INVENTORY_TRANSFERS_EXPORT,
            INVENTORY_TRANSFERS_PAGE,
            export_transfers_issued,
        )

        def do_export(url, kw):
            form = kw["data"]
            assert form["transferReference"] == ""
            assert form["status"] == "0"
            assert form["__RequestVerificationToken"] == "csrf-abc"
            return _Resp(
                200,
                headers={"Content-Type": "application/json"},
                json_body={"fileBase64": base64.b64encode(b"TRF").decode()},
            )

        s = _StubSession({
            ("GET", BASE + INVENTORY_TRANSFERS_PAGE): _Resp(
                200, text=REPORT_HTML, url=BASE + INVENTORY_TRANSFERS_PAGE
            ),
            ("POST", BASE + INVENTORY_TRANSFERS_EXPORT): do_export,
        })
        name, content = export_transfers_issued(
            s, BASE, "6161", dt.date(2024, 1, 1), dt.date(2024, 1, 31)
        )
        assert content == b"TRF"
        assert name == "TransfersIssued_2024-01-01_2024-01-31.xlsx"
        assert ("SubsidiaryId", "6161") == s.cookies.set_calls[0][:2]

    def test_401_raises(self):
        import datetime as dt

        from pos_pipeline_core_etl_spark.exceptions import ExtractionError
        from pos_pipeline_core_etl_spark.sources.http_client import (
            INVENTORY_TRANSFERS_EXPORT,
            INVENTORY_TRANSFERS_PAGE,
            export_transfers_issued,
        )

        s = _StubSession({
            ("GET", BASE + INVENTORY_TRANSFERS_PAGE): _Resp(
                200, text=REPORT_HTML, url=BASE + INVENTORY_TRANSFERS_PAGE
            ),
            ("POST", BASE + INVENTORY_TRANSFERS_EXPORT): _Resp(401),
        })
        with pytest.raises(ExtractionError, match="401"):
            export_transfers_issued(s, BASE, "1", dt.date(2024, 1, 1), dt.date(2024, 1, 2))
