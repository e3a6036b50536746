"""Composite-key builders (F2).

``buildKey`` (reference ``packages/myDFClass.py:128-159``) concatenates
``BU | Material`` with type-dependent normalization (float-like keys lose
leading zeros, get an ``SKU-`` prefix). The STR/FLOAT population split
(myDFClass.py:139-143) collapses to one ``when/otherwise`` expression.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from machine_learning_with_spark_streaming_spark.functions.cleaning import lstrip_zeros, strip_upper


def build_key(*cols: Column | str, sep: str = "|") -> Column:
    """Delimited composite key (``concat_ws`` — null-safe like the
    reference's string +)."""
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    return F.concat_ws(sep, *[c.cast("string") for c in cs])


def material_key(material: Column | str, prefix: str = "SKU-") -> Column:
    """Normalize a material id: numeric-like -> strip leading zeros and
    prefix; else upper/trim (myDFClass.py:128-143 without the row split)."""
    c = F.col(material) if isinstance(material, str) else material
    s = F.trim(c.cast("string"))
    is_numeric = s.try_cast("double").isNotNull()
    return F.when(is_numeric, F.concat(F.lit(prefix), lstrip_zeros(s))).otherwise(
        strip_upper(s)
    )
