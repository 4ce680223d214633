"""Job configuration (SURVEY.md §1.1 config/catalog row).

The reference reads `config.ini` with sections `[endpoint]`,
`[parametros]`, `[postgres_tpint]` (main.py:164-166, 338-345;
README.md:29-45). The engine's equivalent is a typed config object,
loadable from the same .ini layout (stdlib configparser) so a
reference user's config file keeps working.
"""

from __future__ import annotations

import configparser
from dataclasses import dataclass, field


@dataclass
class EngineConfig:
    # [endpoint] — API bases (main.py:196-199, 227-228)
    weather_base: str = "https://api.open-meteo.com/v1/forecast?"
    geocoding_base: str = "https://geocoding-api.open-meteo.com/v1/search?"
    # [parametros] — query params appended to the weather endpoint
    weather_params: str = "current=temperature_2m&timezone=auto"
    poll_interval_seconds: int = 900  # Autom cadence (extrac_almac.py:54)
    # [postgres_tpint] — warehouse connection (JDBC form)
    jdbc_url: str | None = None
    jdbc_options: dict[str, str] = field(default_factory=dict)
    # engine-side locations
    lake_root: str = "meteor_data"  # reference lake dir (.gitignore:1-4)
    warehouse_root: str = "warehouse"
    warehouse_schema: str = "orion"  # README.md:79

    @classmethod
    def from_ini(cls, path: str) -> "EngineConfig":
        """Load a verbatim reference config.ini (README.md:29-45):

            [endpoint]       tiempo / localidad
            [parametros]     tiempo_actual
            [postgres_tpint] alias host port db user pwd schema

        The reference key names are primary (main.py:196-198, 226,
        343-345); engine-era names (geocoding / parametros / intervalo /
        database) are accepted as fallbacks. ``pwd`` maps to the JDBC
        ``password`` option and ``schema`` to the warehouse schema, so
        a reference user's file drives the JDBC sink unchanged.
        """
        parser = configparser.ConfigParser()
        with open(path) as fh:
            parser.read_file(fh)
        cfg = cls()

        def _get(section: str, *keys: str, default: str | None = None) -> str | None:
            for k in keys:
                if parser.has_option(section, k):
                    return parser.get(section, k)
            return default

        if parser.has_section("endpoint"):
            cfg.weather_base = _get("endpoint", "tiempo", default=cfg.weather_base)
            cfg.geocoding_base = _get(
                "endpoint", "localidad", "geocoding", default=cfg.geocoding_base
            )
        if parser.has_section("parametros"):
            cfg.weather_params = _get(
                "parametros", "tiempo_actual", "parametros", default=cfg.weather_params
            )
            interval = _get("parametros", "intervalo")
            if interval is not None:
                cfg.poll_interval_seconds = int(interval)
        if parser.has_section("postgres_tpint"):
            host = _get("postgres_tpint", "host", default="localhost")
            port = _get("postgres_tpint", "port", default="5432")
            db = _get("postgres_tpint", "db", "database", default="postgres")
            cfg.jdbc_url = f"jdbc:postgresql://{host}:{port}/{db}"
            schema = _get("postgres_tpint", "schema")
            if schema is not None:
                cfg.warehouse_schema = schema
            rename = {"pwd": "password"}
            skip = {"host", "port", "db", "database", "alias", "schema"}
            cfg.jdbc_options = {
                rename.get(k, k): v
                for k, v in parser.items("postgres_tpint")
                if k not in skip
            }
        return cfg
