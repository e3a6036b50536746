"""Oracle-comparison primitives shared by the pytest suite and the
pre-flight harness (tools/verify_all.py).

One implementation of the driver-gate normalization — float rounding to
6 decimals, NaN/Inf sentinels, column-name reordering, order-insensitive
row sort — so the two local replicas of the certification gate can never
drift apart.
"""

from __future__ import annotations

import math


def norm_cell(v):
    """Normalize one result cell the way the driver's value hash does."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):
            return "Inf" if v > 0 else "-Inf"
        return round(v, 6)
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    return v


def rowset(cols, rows):
    """Column-name-sorted, order-insensitive canonical form of a result."""
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(norm_cell(r[i]) for i in idx) for r in rows),
        key=lambda t: tuple((x is None, str(x)) for x in t),
    )


# DuckDB output types whose fetchall() materialization (Python int /
# Decimal — exact) differs from the driver's Arrow/pandas materialization
# (float64 — lossy, renders 236 as 236.0).  An oracle emitting one of
# these can be value-equal to Spark under fetchall yet hash-red on the
# driver — the v14_histogram_drift bug class that survived two rounds of
# green local sweeps (VERDICT r4 item 2).
_FORBIDDEN_ORACLE_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL")


def oracle_type_violations(con, sql):
    """Return ``[(column, duckdb_type), ...]`` for oracle output columns
    whose DuckDB type materializes differently on the driver path.

    Uses ``DESCRIBE <sql>`` so nothing is scanned.  The classic trigger
    is an uncast ``sum(BIGINT)`` (→ HUGEINT) — especially in a UNION ALL
    branch, where it silently promotes the whole column.
    """
    desc = con.execute(f"DESCRIBE {sql}").fetchall()
    bad = []
    for row in desc:
        col, typ = row[0], str(row[1]).upper()
        if any(f in typ for f in _FORBIDDEN_ORACLE_TYPES):
            bad.append((col, typ))
    return bad
