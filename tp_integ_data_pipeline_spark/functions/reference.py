"""Scalar functions with the reference's exact observable semantics.

Each builder returns a Column expression (JVM-side, codegen'd — no
Python UDFs), re-expressing SURVEY.md §2.6 F1–F13. Reference citations
point into /root/reference (read-only):

- F1  to_timestamp_iso   — main.py:211, transf.py:46
- F2  partition_date     — main.py:213 (lake partition key, MM-dd-yy)
- F3  shift_gmt3         — transf.py:46-47 (fixed −3h, not tz-aware)
- F4  date_ddmmyyyy      — transf.py:50
- F5  time_hhmm          — transf.py:51
- F6  hpa_to_mmhg        — transf.py:85-86
- F7  int_to_bool        — transf.py:89-91 (exactly `x == 1`)
- F8  wind_cardinal      — transf.py:55-78; NON-STANDARD mapping kept
      verbatim (it is the observable contract; see truth table below)
- F9  format_postcodes   — transf.py:119-123 (list → "a, b" text)
- F10 none_to_null       — transf.py:124,127-129 ('None' string → null)
- F12 current_date()     — transf.py:132 (built-in; no wrapper needed)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def to_timestamp_iso(col: Column | str) -> Column:
    """F1: ISO-8601 string → timestamp (pd.to_datetime equivalent)."""
    return F.to_timestamp(_c(col))


def partition_date(col: Column | str) -> Column:
    """F2: timestamp → lake partition key string `MM-dd-yy`."""
    return F.date_format(_c(col), "MM-dd-yy")


def shift_gmt3(col: Column | str) -> Column:
    """F3: fixed UTC→GMT-3 shift (`time - Timedelta(hours=3)`).

    Deliberately a fixed offset, not an IANA zone: the reference
    ignores DST (Argentina has none), so the fixed shift is exact
    parity.
    """
    return _c(col) - F.expr("INTERVAL 3 HOURS")


def date_ddmmyyyy(col: Column | str) -> Column:
    """F4: timestamp → `dd/MM/yyyy` presentation string."""
    return F.date_format(_c(col), "dd/MM/yyyy")


def time_hhmm(col: Column | str) -> Column:
    """F5: timestamp → `HH:mm` presentation string."""
    return F.date_format(_c(col), "HH:mm")


def hpa_to_mmhg(col: Column | str) -> Column:
    """F6: pressure unit conversion hPa → mmHg."""
    return _c(col) * F.lit(0.750064)


def int_to_bool(col: Column | str) -> Column:
    """F7: 0/1 int → bool. The reference lambda's conditional is a
    no-op; verified semantics are exactly `x == 1`."""
    return _c(col) == F.lit(1)


#: F8 truth table (verified by executing the reference function):
#:   0 or 360        → "N"
#:   (0, 90)         → "NO"
#:   90              → "W"
#:   (90, 180)       → "SE"
#:   180             → "S"
#:   (180, 270)      → "SO"
#:   270             → "E"
#:   everything else → "NE"   (incl. (270,360), >360, negatives)
def wind_cardinal(col: Column | str) -> Column:
    """F8: wind degrees → cardinal label, reference mapping verbatim."""
    c = _c(col)
    return (
        F.when((c == 0) | (c == 360), "N")
        .when((c > 0) & (c < 90), "NO")
        .when(c == 90, "W")
        .when((c > 90) & (c < 180), "SE")
        .when(c == 180, "S")
        .when((c > 180) & (c < 270), "SO")
        .when(c == 270, "E")
        .otherwise("NE")
    )


def wind_cardinal_sql(expr: str) -> str:
    """ANSI-SQL rendering of the F8 CASE chain (for oracle parity)."""
    return (
        f"CASE WHEN {expr} = 0 OR {expr} = 360 THEN 'N' "
        f"WHEN {expr} > 0 AND {expr} < 90 THEN 'NO' "
        f"WHEN {expr} = 90 THEN 'W' "
        f"WHEN {expr} > 90 AND {expr} < 180 THEN 'SE' "
        f"WHEN {expr} = 180 THEN 'S' "
        f"WHEN {expr} > 180 AND {expr} < 270 THEN 'SO' "
        f"WHEN {expr} = 270 THEN 'E' "
        f"ELSE 'NE' END"
    )


def format_postcodes(col: Column | str) -> Column:
    """F9: array<string> → `"a, b"` text (bracket/quote-stripped).

    The reference stringifies the Python list then strips `[]'"`
    characters; on a true ArrayType column `array_join` reproduces the
    output text without the stringification quirks.
    """
    return F.array_join(_c(col), ", ")


def none_to_null(col: Column | str) -> Column:
    """F10: literal 'None' strings (JSON absent-field artifacts) → null."""
    c = _c(col)
    return F.when(c == "None", F.lit(None)).otherwise(c)
