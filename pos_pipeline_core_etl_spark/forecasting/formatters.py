"""Presentation formatters (SURVEY §2.13 — console/Telegram layer).

Reference parity: Spanish date formatting
(``forecasting/date_formatters.py:10-27,174-198``), duration formatting
(``etl/utils.py:71-91``), and the per-branch forecast listing with
totals + deposit section (``forecasting/formatters/console.py:13-127``,
``telegram.py:13-146``). Pure driver-side string building over
already-collected (tiny) results — never part of the distributed plan.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterable

SPANISH_DAYS = (
    "lunes", "martes", "miércoles", "jueves", "viernes", "sábado", "domingo",
)
SPANISH_MONTHS = (
    "enero", "febrero", "marzo", "abril", "mayo", "junio",
    "julio", "agosto", "septiembre", "octubre", "noviembre", "diciembre",
)


def format_date_spanish(day: dt.date) -> str:
    """``lunes 1 de enero de 2024``."""
    return (
        f"{SPANISH_DAYS[day.weekday()]} {day.day} de "
        f"{SPANISH_MONTHS[day.month - 1]} de {day.year}"
    )


def format_date_short(day: dt.date) -> str:
    """``lun 01-ene``."""
    return f"{SPANISH_DAYS[day.weekday()][:3]} {day.day:02d}-{SPANISH_MONTHS[day.month - 1][:3]}"


def format_duration(seconds: float) -> str:
    """``90.5`` → ``"1m 30.5s"`` (etl/utils.py:71-91)."""
    if seconds < 60:
        return f"{seconds:.1f}s"
    minutes, rem = divmod(seconds, 60)
    if minutes < 60:
        return f"{int(minutes)}m {rem:.1f}s"
    hours, minutes = divmod(int(minutes), 60)
    return f"{hours}h {minutes}m {rem:.1f}s"


def format_money(value: float) -> str:
    return f"${value:,.2f}"


def format_forecast_console(
    forecast_rows: Iterable[dict],
    deposit_rows: Iterable[dict] = (),
    metric: str = "ingreso_total",
) -> str:
    """Per-branch daily listing + totals + deposit section.

    ``forecast_rows``: dicts with sucursal/fecha/metric/valor (the long
    forecast output, collected); ``deposit_rows``: fecha_deposito/
    efectivo/tarjetas/total.
    """
    by_branch: dict[str, list[dict]] = {}
    for r in forecast_rows:
        if r["metric"] == metric:
            by_branch.setdefault(r["sucursal"], []).append(r)

    lines: list[str] = []
    grand = 0.0
    for branch in sorted(by_branch):
        rows = sorted(by_branch[branch], key=lambda r: r["fecha"])
        lines.append(f"== {branch} ==")
        subtotal = 0.0
        for r in rows:
            lines.append(
                f"  {format_date_short(r['fecha'])}  {format_money(r['valor'])}"
            )
            subtotal += r["valor"]
        lines.append(f"  TOTAL {format_money(subtotal)}")
        grand += subtotal
    lines.append(f"TOTAL GENERAL {format_money(grand)}")

    deposits = list(deposit_rows)
    if deposits:
        lines.append("")
        lines.append("== Depósitos ==")
        for r in sorted(deposits, key=lambda r: r["fecha_deposito"]):
            lines.append(
                f"  {format_date_short(r['fecha_deposito'])}  "
                f"efectivo {format_money(r['efectivo'])}  "
                f"tarjetas {format_money(r['tarjetas'])}  "
                f"total {format_money(r['total'])}"
            )
    return "\n".join(lines)


METRIC_DISPLAY = {
    "ingreso_efectivo": "Efectivo",
    "ingreso_credito": "Crédito",
    "ingreso_debito": "Débito",
    "ingreso_total": "Total",
}


def format_forecast_html(
    forecast_rows: Iterable[dict],
    deposit_rows: Iterable[dict] = (),
    horizon_days: int = 7,
) -> str:
    """Messenger-friendly HTML variant (reference
    ``forecasting/formatters/telegram.py:13-146``): header + per-branch
    ``<b>`` sections per metric, then company-wide daily totals and the
    deposit section. Pure string building — no network send.

    Raises ``ValueError`` on an empty forecast (reference behavior).
    """
    rows = list(forecast_rows)
    if not rows:
        raise ValueError("No forecasts to format: forecast is empty")

    lines = [f"📊 <b>Forecast de Pagos - Próximos {horizon_days} Días</b>\n"]
    branches = sorted({r["sucursal"] for r in rows})
    metrics = sorted({r["metric"] for r in rows})
    daily_totals: dict[str, dict] = {m: {} for m in metrics}

    for branch in branches:
        lines.append(f"<b>{branch}</b>")
        branch_rows = [r for r in rows if r["sucursal"] == branch]
        for metric in metrics:
            series = sorted(
                (r for r in branch_rows if r["metric"] == metric),
                key=lambda r: r["fecha"],
            )
            if not series:
                continue
            display = METRIC_DISPLAY.get(metric, metric)
            subtotal = 0.0
            for r in series:
                subtotal += r["valor"]
                daily_totals[metric][r["fecha"]] = (
                    daily_totals[metric].get(r["fecha"], 0.0) + r["valor"]
                )
            lines.append(f"  {display}: {format_money(subtotal)}")
        lines.append("")

    lines.append("<b>Totales por día</b>")
    for metric in metrics:
        if not daily_totals[metric]:
            continue
        display = METRIC_DISPLAY.get(metric, metric)
        lines.append(f"<b>{display}</b>")
        for day in sorted(daily_totals[metric]):
            lines.append(
                f"  {format_date_short(day)}: {format_money(daily_totals[metric][day])}"
            )

    deposits = sorted(deposit_rows, key=lambda r: r["fecha_deposito"])
    if deposits:
        lines.append("")
        lines.append("💰 <b>Depósitos</b>")
        for r in deposits:
            lines.append(
                f"  {format_date_short(r['fecha_deposito'])}: "
                f"{format_money(r['total'])}"
            )
    return "\n".join(lines)
