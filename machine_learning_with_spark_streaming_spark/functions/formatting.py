"""F9: human-readable number formatting as engine-side expressions.

The reference formats report numbers driver-side in pandas
(``fmt_num``/``fmt_int``/``fmt_val``, pipeline/qualitycheck.py:48-63;
``fmt_int``/``fmt_val``/``fmt_pct``, pipeline/datavalidation.py:79-111).
Here the same rules are when-chains over ``format_string`` /
``format_number`` — JVM expressions that run distributed and are
oracle-checkable, instead of a driver-side presentation pass.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _strip_trailing_zeros(s: Column) -> Column:
    # '0.123000' -> '0.123'; '0.000000' -> '0'
    return F.regexp_replace(s, r"\.?0+$", "")


def human_format(col: Column | str) -> Column:
    """K/M/B human format (``fmt_num``, qualitycheck.py:48-63): two
    decimals with a unit suffix above 1e3/1e6/1e9; plain grouped integer
    for 1..999.5; six significant decimals (trailing zeros stripped)
    below 1; empty string for null."""
    c = (F.col(col) if isinstance(col, str) else col).cast("double")
    a = F.abs(c)
    sign = F.when(c < 0, F.lit("-")).otherwise(F.lit(""))
    return (
        F.when(c.isNull(), F.lit(""))
        .when(a >= 1e9, F.concat(sign, F.format_string("%.2f", a / 1e9), F.lit(" B")))
        .when(a >= 1e6, F.concat(sign, F.format_string("%.2f", a / 1e6), F.lit(" M")))
        .when(a >= 1e3, F.concat(sign, F.format_string("%.2f", a / 1e3), F.lit(" K")))
        .when(a >= 1, F.format_number(c, 0))
        .otherwise(_strip_trailing_zeros(F.format_string("%.6f", c)))
    )


def fmt_int(col: Column | str) -> Column:
    """Grouped integer (``fmt_int``, datavalidation.py:79-84); '-' for
    null (the reference's error sentinel)."""
    c = (F.col(col) if isinstance(col, str) else col).cast("double")
    return F.when(c.isNull(), F.lit("-")).otherwise(F.format_number(c, 0))


def fmt_val(col: Column | str) -> Column:
    """EA-units format (``fmt_val``, datavalidation.py:86-97): grouped
    0-decimal above 1, six stripped decimals below; '-' for null."""
    c = (F.col(col) if isinstance(col, str) else col).cast("double")
    return (
        F.when(c.isNull(), F.lit("-"))
        .when(F.abs(c) >= 1, F.format_number(c, 0))
        .otherwise(_strip_trailing_zeros(F.format_string("%.6f", c)))
    )


def fmt_pct(col: Column | str) -> Column:
    """Percent with two decimals (``fmt_pct``, datavalidation.py:99-111);
    '-' for null (the reference also uses it for NaN/inf baselines)."""
    c = (F.col(col) if isinstance(col, str) else col).cast("double")
    return F.when(c.isNull(), F.lit("-")).otherwise(
        F.concat(F.format_string("%.2f", c * 100), F.lit("%"))
    )


# --------------------------------------------------------- oracle mirrors

def human_format_sql(x: str) -> str:
    """DuckDB SQL mirroring :func:`human_format` (for oracle strings)."""
    sgn = f"(CASE WHEN {x} < 0 THEN '-' ELSE '' END)"
    return (
        f"CASE WHEN {x} IS NULL THEN '' "
        f"WHEN abs({x}) >= 1e9 THEN {sgn} || printf('%.2f', abs({x})/1e9) || ' B' "
        f"WHEN abs({x}) >= 1e6 THEN {sgn} || printf('%.2f', abs({x})/1e6) || ' M' "
        f"WHEN abs({x}) >= 1e3 THEN {sgn} || printf('%.2f', abs({x})/1e3) || ' K' "
        f"WHEN abs({x}) >= 1 THEN format('{{:,}}', CAST(printf('%.0f', {x}) AS BIGINT)) "
        f"ELSE regexp_replace(printf('%.6f', {x}), '\\.?0+$', '') END"
    )


def fmt_int_sql(x: str) -> str:
    return (
        f"CASE WHEN {x} IS NULL THEN '-' "
        f"ELSE format('{{:,}}', CAST(printf('%.0f', CAST({x} AS DOUBLE)) AS BIGINT)) END"
    )


def fmt_val_sql(x: str) -> str:
    return (
        f"CASE WHEN {x} IS NULL THEN '-' "
        f"WHEN abs({x}) >= 1 THEN format('{{:,}}', CAST(printf('%.0f', {x}) AS BIGINT)) "
        f"ELSE regexp_replace(printf('%.6f', {x}), '\\.?0+$', '') END"
    )


def fmt_pct_sql(x: str) -> str:
    return (
        f"CASE WHEN {x} IS NULL THEN '-' "
        f"ELSE printf('%.2f', {x} * 100) || '%' END"
    )
