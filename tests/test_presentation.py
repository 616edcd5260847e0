"""Branch config, formatters, writers — the presentation/config edges."""

from __future__ import annotations

import datetime as dt
import os

import pytest

from pos_pipeline_core_etl_spark.forecasting.formatters import (
    format_date_short,
    format_date_spanish,
    format_duration,
    format_forecast_console,
)
from pos_pipeline_core_etl_spark.sources.branch_config import (
    BranchRegistry,
    CodeWindow,
    load_branch_config,
)
from pos_pipeline_core_etl_spark.sources.writers import export_csv_bom, write_partitioned

D = dt.date


class TestBranchConfig:
    CONFIG = {
        "Kavia": {"code": "K1", "valid_from": "2023-01-01", "valid_to": "2023-12-31"},
        "Kavia_OLD": {"code": "K0", "valid_from": "2022-01-01", "valid_to": "2022-12-31"},
        "Nativa": {"code": "N1", "valid_from": "2022-06-01", "valid_to": None},
        "CEDIS": {"code": "C1", "valid_from": "2022-01-01", "valid_to": None},
    }

    def test_suffixed_names_group_and_cedis_excluded(self):
        windows = load_branch_config(self.CONFIG)
        assert set(windows) == {"Kavia", "Nativa"}
        assert len(windows["Kavia"]) == 2  # _OLD grouped in

    def test_point_in_time_resolution(self):
        reg = BranchRegistry(load_branch_config(self.CONFIG))
        assert reg.get_code_for_date("Kavia", D(2022, 6, 1)) == "K0"
        assert reg.get_code_for_date("Kavia", D(2023, 6, 1)) == "K1"
        assert reg.get_code_for_date("Kavia", D(2024, 6, 1)) is None
        assert reg.get_code_for_date("Nativa", D(2025, 1, 1)) == "N1"  # open-ended

    def test_overlap_rejected(self):
        bad = {
            "X": [
                {"code": "A", "valid_from": "2023-01-01", "valid_to": "2023-06-30"},
                {"code": "B", "valid_from": "2023-06-30", "valid_to": None},
            ]
        }
        with pytest.raises(ValueError, match="overlapping"):
            load_branch_config(bad)

    def test_to_dataframe(self, spark):
        reg = BranchRegistry(load_branch_config(self.CONFIG))
        df = reg.to_dataframe(spark)
        assert df.count() == 3
        assert set(df.columns) == {"sucursal", "code", "valid_from", "valid_to"}


class TestFormatters:
    def test_spanish_dates(self):
        assert format_date_spanish(D(2024, 1, 1)) == "lunes 1 de enero de 2024"
        assert format_date_short(D(2024, 12, 25)) == "mié 25-dic"

    def test_duration(self):
        assert format_duration(5.25) == "5.2s"
        assert format_duration(90.5) == "1m 30.5s"
        assert format_duration(3721.0) == "1h 2m 1.0s"

    def test_console_listing(self):
        fc = [
            {"sucursal": "A", "fecha": D(2024, 1, 1), "metric": "ingreso_total", "valor": 100.0},
            {"sucursal": "A", "fecha": D(2024, 1, 2), "metric": "ingreso_total", "valor": 200.0},
            {"sucursal": "A", "fecha": D(2024, 1, 1), "metric": "otro", "valor": 999.0},
        ]
        dep = [{"fecha_deposito": D(2024, 1, 3), "efectivo": 300.0, "tarjetas": 50.0, "total": 350.0}]
        out = format_forecast_console(fc, dep)
        assert "== A ==" in out
        assert "TOTAL $300.00" in out
        assert "TOTAL GENERAL $300.00" in out
        assert "Depósitos" in out
        assert "$999.00" not in out  # other metric filtered

    def test_html_listing(self):
        import pytest

        from pos_pipeline_core_etl_spark.forecasting.formatters import (
            format_forecast_html,
        )

        fc = [
            {"sucursal": "A", "fecha": D(2024, 1, 1), "metric": "ingreso_total", "valor": 100.0},
            {"sucursal": "A", "fecha": D(2024, 1, 2), "metric": "ingreso_total", "valor": 200.0},
            {"sucursal": "B", "fecha": D(2024, 1, 1), "metric": "ingreso_total", "valor": 50.0},
        ]
        dep = [{"fecha_deposito": D(2024, 1, 3), "efectivo": 300.0, "tarjetas": 50.0, "total": 350.0}]
        out = format_forecast_html(fc, dep)
        assert "<b>A</b>" in out and "<b>B</b>" in out
        assert "Total: $300.00" in out  # branch A subtotal, display name
        assert "$150.00" in out  # daily total across branches for Jan 1
        assert "Depósitos" in out and "$350.00" in out
        with pytest.raises(ValueError):
            format_forecast_html([])


class TestWriters:
    def test_partitioned_parquet_roundtrip(self, spark, tmp_path):
        df = spark.createDataFrame(
            [("A", D(2024, 1, 1), 1.0), ("B", D(2024, 1, 2), 2.0)],
            "sucursal string, operating_date date, v double",
        )
        out = str(tmp_path / "p")
        write_partitioned(df, out)
        back = spark.read.parquet(out)
        assert back.count() == 2
        # partition dirs exist → pruning-friendly layout
        assert any(d.startswith("operating_date=") for d in os.listdir(out))

    def test_csv_bom(self, spark, tmp_path):
        df = spark.createDataFrame([("á", 1.5)], "name string, v double")
        path = export_csv_bom(df, str(tmp_path / "out.csv"))
        raw = open(path, "rb").read()
        assert raw.startswith(b"\xef\xbb\xbf")  # Excel BOM
        assert "á".encode() in raw
