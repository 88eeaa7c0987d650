"""Engine-stable decimal rounding.

`round(x, 2)` is NOT portable across engines on this data: money-style
columns have ≤4 decimal digits, so aggregate sums land EXACTLY on
half-cent ties (…595), where Spark (decimal HALF_UP) and DuckDB (binary
double rounding) disagree — e.g. 307843.595 → 307843.6 vs 307843.59.

Canonical rounding used by every query AND its oracle instead:

    rnd(x, d) = floor(x·10^d + 0.5 + 1e-4) / 10^d

- floor over doubles is exact and identical everywhere;
- the 1e-4 epsilon (in the scaled-integer domain) absorbs the ±1e-6-ish
  fp noise from engine-specific summation order, so exact decimal ties
  round UP consistently;
- non-tie values of ≤4-decimal data sit ≥0.01 (scaled) from the
  boundary, far beyond epsilon, so ordinary rounding is unchanged.

Both sides must use the same formula — `rnd` for DataFrames, `rnd_sql`
for the DuckDB oracle text.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EPS = 1e-4


def rnd(col: Column | str, d: int) -> Column:
    col = F.col(col) if isinstance(col, str) else col
    scale = float(10**d)
    return F.floor(col * F.lit(scale) + F.lit(0.5 + EPS)) / F.lit(scale)


def rnd_sql(expr: str, d: int) -> str:
    scale = float(10**d)
    return f"floor(({expr}) * {scale} + {0.5 + EPS}) / {scale}"
