"""Cross-engine float parity helpers.

``round(x, 4)`` is NOT engine-deterministic: Spark rounds through BigDecimal
HALF_UP on the double's exact decimal expansion while DuckDB rounds through a
different path, so a value landing near a .00005 boundary can round apart
(observed: lineitem row 618, 1730.94675 → 1730.9467 vs 1730.9468).

``floor(x * 10000 + 0.5) / 10000`` instead uses only IEEE-754 double ops,
which both engines must evaluate bit-identically — same inputs ⇒ same rounded
output, always. Every oracle-checked float column goes through these two
helpers (Spark side / SQL side).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def r4(c: Column | str) -> Column:
    """Deterministic 4dp rounding, Spark side."""
    c = F.col(c) if isinstance(c, str) else c
    return F.floor(c * 10000 + 0.5) / 10000


def R4(expr: str) -> str:
    """Deterministic 4dp rounding, oracle-SQL side (same formula)."""
    return f"floor(({expr}) * 10000 + 0.5) / 10000"
