"""Config parity: the reference's config.ini layout loads unchanged."""

from __future__ import annotations

from tp_integ_data_pipeline_spark.config import EngineConfig

# Verbatim reference layout — section/key names exactly as README.md:29-45
# documents and main.py:196-198,226,343-345 reads them.
REFERENCE_INI = """
[endpoint]
tiempo = https://api.open-meteo.com/v1/forecast?
localidad = https://geocoding-api.open-meteo.com/v1/search?

[parametros]
tiempo_actual = current=temperature_2m,pressure_msl&timezone=auto

[postgres_tpint]
alias = ORION
host = db.example.com
port = 5433
db = tp_integ
user = meteor
pwd = secret
schema = orion_dw
"""

# Engine-era fallback spelling still accepted.
ENGINE_INI = """
[endpoint]
tiempo = https://api.open-meteo.com/v1/forecast?
geocoding = https://geocoding-api.open-meteo.com/v1/search?

[parametros]
parametros = current=temperature_2m&timezone=auto
intervalo = 300

[postgres_tpint]
host = localhost
port = 5432
database = orion
user = meteor
password = secret
"""


def test_reference_ini_verbatim(tmp_path):
    p = tmp_path / "config.ini"
    p.write_text(REFERENCE_INI)
    cfg = EngineConfig.from_ini(str(p))
    assert "geocoding-api" in cfg.geocoding_base  # [endpoint] localidad
    assert "pressure_msl" in cfg.weather_params  # [parametros] tiempo_actual
    assert cfg.jdbc_url == "jdbc:postgresql://db.example.com:5433/tp_integ"  # db key
    assert cfg.jdbc_options["user"] == "meteor"
    assert cfg.jdbc_options["password"] == "secret"  # pwd -> password
    assert "alias" not in cfg.jdbc_options and "schema" not in cfg.jdbc_options
    assert cfg.warehouse_schema == "orion_dw"  # schema key honored
    assert cfg.poll_interval_seconds == 900  # default kept (no intervalo key)


def test_engine_ini_fallbacks(tmp_path):
    p = tmp_path / "config.ini"
    p.write_text(ENGINE_INI)
    cfg = EngineConfig.from_ini(str(p))
    assert "geocoding-api" in cfg.geocoding_base
    assert cfg.poll_interval_seconds == 300
    assert cfg.jdbc_url == "jdbc:postgresql://localhost:5432/orion"
    assert cfg.jdbc_options["password"] == "secret"


def test_defaults():
    cfg = EngineConfig()
    assert cfg.warehouse_schema == "orion"
    assert cfg.poll_interval_seconds == 900
