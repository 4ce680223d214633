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
        parser = configparser.ConfigParser()
        with open(path) as fh:
            parser.read_file(fh)
        cfg = cls()
        if parser.has_section("endpoint"):
            cfg.weather_base = parser.get("endpoint", "tiempo", fallback=cfg.weather_base)
            cfg.geocoding_base = parser.get("endpoint", "geocoding", fallback=cfg.geocoding_base)
        if parser.has_section("parametros"):
            cfg.weather_params = parser.get("parametros", "parametros", fallback=cfg.weather_params)
            cfg.poll_interval_seconds = parser.getint(
                "parametros", "intervalo", fallback=cfg.poll_interval_seconds
            )
        if parser.has_section("postgres_tpint"):
            host = parser.get("postgres_tpint", "host", fallback="localhost")
            port = parser.get("postgres_tpint", "port", fallback="5432")
            db = parser.get("postgres_tpint", "database", fallback="postgres")
            cfg.jdbc_url = f"jdbc:postgresql://{host}:{port}/{db}"
            cfg.jdbc_options = {
                k: v
                for k, v in parser.items("postgres_tpint")
                if k not in ("host", "port", "database")
            }
        return cfg
