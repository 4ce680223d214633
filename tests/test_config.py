"""Config parity: the reference's config.ini layout loads unchanged."""

from __future__ import annotations

from tp_integ_data_pipeline_spark.config import EngineConfig

INI = """
[endpoint]
tiempo = https://api.open-meteo.com/v1/forecast?
geocoding = https://geocoding-api.open-meteo.com/v1/search?

[parametros]
parametros = current=temperature_2m,pressure_msl&timezone=auto
intervalo = 900

[postgres_tpint]
host = db.example.com
port = 5433
database = orion
user = meteor
password = secret
"""


def test_from_ini_roundtrip(tmp_path):
    p = tmp_path / "config.ini"
    p.write_text(INI)
    cfg = EngineConfig.from_ini(str(p))
    assert "pressure_msl" in cfg.weather_params
    assert cfg.poll_interval_seconds == 900
    assert cfg.jdbc_url == "jdbc:postgresql://db.example.com:5433/orion"
    assert cfg.jdbc_options["user"] == "meteor"


def test_defaults():
    cfg = EngineConfig()
    assert cfg.warehouse_schema == "orion"
    assert cfg.poll_interval_seconds == 900
