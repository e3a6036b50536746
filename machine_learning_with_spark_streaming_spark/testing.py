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
