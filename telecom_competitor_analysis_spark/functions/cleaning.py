"""F1–F13: scalar normalization functions (SURVEY.md §2.3).

Each reference function is a row-at-a-time Python scalar applied in a loop
(reference dags/transform.py:61-63); here each is a pure builder returning
a native ``Column`` expression — JVM-side, whole-stage-codegen'd, usable in
any plan. No Python UDFs in the hot path (a pandas_udf mirror of
``convert_speed`` lives in tests to cover the UDF escape hatch).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Sentinel meaning "unlimited" (reference dags/utils.py:31-32) and the
# default when a regex finds no group (reference
# dags/viking_class_scraper.py:207-208).
UNLIMITED = -1.0


def convert_speed(col: Column) -> Column:
    """F1 — unit-aware speed parse (reference dags/transform.py:8-29).

    '1gbps' → 1000, '100mbps' → 100 (case-insensitive, unit anywhere in the
    string); bare numerics pass through; None / no-match → null. Output Mbps
    as double.
    """
    s = F.lower(F.trim(col.cast("string")))
    num = F.regexp_extract(s, r"(\d+)\s*(mbps|gbps)", 1)
    unit = F.regexp_extract(s, r"(\d+)\s*(mbps|gbps)", 2)
    parsed = F.when(unit == "gbps", num.cast("double") * 1000.0).when(
        unit == "mbps", num.cast("double")
    )
    # passthrough for already-numeric strings/numbers (reference
    # dags/transform.py:19-20 returns value unchanged when not a str)
    bare = F.when(s.rlike(r"^\d+(\.\d+)?$"), s.cast("double"))
    return F.coalesce(parsed, bare)


def unlimited_to_float(col: Column) -> Column:
    """F2 — sentinel map (reference dags/utils.py:31-32).

    'unlimited' (any case) → -1.0; otherwise cast to double — try_cast,
    because under ANSI mode (Spark 4 default) a plain cast THROWS on
    malformed input; null-on-garbage is the cleaning-layer contract here.
    (The reference's ``float(s)`` would raise and fail the whole task —
    callers wanting that behavior validate separately via sources.ingest.)
    """
    s = F.trim(col.cast("string"))
    return F.when(F.lower(s) == "unlimited", F.lit(UNLIMITED)).otherwise(
        s.try_cast("double")
    )


def regex_extract_default(
    col: Column, pattern: str, group: int = 1, default: float = UNLIMITED
) -> Column:
    """F3 — regex group extract with sentinel default (reference
    dags/viking_class_scraper.py:204-208: minutes ``(\\d+) minutes``, sms
    ``(\\d+) texts``; missing → -1)."""
    got = F.regexp_extract(col.cast("string"), pattern, group)
    return F.coalesce(
        F.nullif(got, F.lit("")).cast("double"), F.lit(float(default))
    )


def first_number(col: Column) -> Column:
    """F4 — first integer in the string (reference
    dags/viking_scraper.py:287-288 discount ``re.search(r'\\d+')``;
    dags/scarlet_scraper.py:128 price ``re.findall(r'€(\\d+)')[0]``).
    No match → null."""
    got = F.regexp_extract(col.cast("string"), r"(\d+)", 1)
    return F.nullif(got, F.lit("")).try_cast("long")  # overflow → null (ANSI-safe)


def digits_only(col: Column) -> Column:
    """F5 — strip every non-digit then cast (reference
    dags/scarlet_scraper.py:238-244 ``''.join(filter(str.isdigit, s))``).
    Empty result → null."""
    stripped = F.regexp_replace(col.cast("string"), r"[^0-9]", "")
    return F.nullif(stripped, F.lit("")).try_cast("long")  # overflow → null (ANSI-safe)


def ascii_strip(col: Column) -> Column:
    """F6 — ASCII normalization (reference dags/viking_scraper.py:164-165
    ``.encode('ascii','ignore').decode('ascii')``)."""
    return F.regexp_replace(col.cast("string"), r"[^\x00-\x7F]", "")


def string_clean(
    col: Column, replacements: dict[str, str] | None = None
) -> Column:
    """F7 — trim/lower/replace cleanup chain (reference
    dags/viking_scraper.py:119-121; dags/scarlet_scraper.py:50-56:
    ``.strip().lower().replace('GB','')`` etc.). ``replacements`` are
    applied literally, in insertion order, after lower+trim."""
    out = F.lower(F.trim(col.cast("string")))
    for old, new in (replacements or {}).items():
        out = F.replace(out, F.lit(old.lower()), F.lit(new))
    return out


def concat_key(*cols: Column | str, sep: str = "_") -> Column:
    """F9 — string key synthesis (reference dags/viking_scraper.py:63,130
    f-strings like ``mobile_prepaid_{focus}_{data}_gb``)."""
    return F.concat_ws(sep, *[F.col(c) if isinstance(c, str) else c for c in cols])


def status_derive(error_col: Column) -> Column:
    """F13 — status derivation (reference dags/utils.py:56:
    ``'success' if error=='no error' else 'failed'``)."""
    return F.when(error_col == "no error", F.lit("success")).otherwise(
        F.lit("failed")
    )
