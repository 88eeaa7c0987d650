"""Generic temporal operators: as-of join, time-range join, gap
sessionization.

These are the reusable library forms of the registry queries
(queries/relational.py B8-B10) — the registered queries delegate here,
so the driver's DuckDB oracle gate verifies these exact code paths on
the events/orders tables every round.

Scale shapes (the reason these exist as operators, not joins the user
hand-rolls):

- `asof_join`: tag + union both sides, ONE window per key with
  `last(ignorenulls)` — one shuffle total, no per-row range probe, no
  row explosion (a naive join-then-max is quadratic per key).
- `range_join`: equi-key hash join with the time window as a residual
  condition — never a cartesian; AQE splits skewed keys.
- `sessionize`: lag + cumulative-sum over one per-key window; the
  groupBy a caller typically follows with reuses the partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    values: list[str],
    right_order: list[str] | None = None,
) -> DataFrame:
    """Backward as-of join: each left row picks, per `values` column,
    the most recent non-null right value with right.`on` ≤ left.`on`
    within the same `by` keys (ties at equal `on` include the right
    row). `right_order` breaks ties among right rows at the same
    instant (last one wins); make it a right-side unique key for
    deterministic output.

    Returns the left rows with one `asof_<v>` column per value."""
    carry = list(dict.fromkeys(values + (right_order or [])))
    clash = set(carry) & set(left.columns)
    if clash:
        raise ValueError(f"asof_join: right columns {sorted(clash)} clash with left")
    rtypes = dict(right.dtypes)
    ltypes = dict(left.dtypes)

    lt = left.withColumn("__asof_src", F.lit(1))
    for c in carry:
        lt = lt.withColumn(c, F.lit(None).cast(rtypes[c]))
    rt = right.select(*by, on, *carry).withColumn("__asof_src", F.lit(0))
    for c in left.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None).cast(ltypes[c]))

    # right rows (src=0) sort before left rows at the same instant →
    # backward-inclusive; right_order makes the winner among
    # simultaneous right rows deterministic (last one fills)
    w = (
        W.partitionBy(*by)
        .orderBy(F.col(on), F.col("__asof_src"), *[F.col(c) for c in (right_order or [])])
        .rowsBetween(W.unboundedPreceding, 0)
    )
    filled = lt.unionByName(rt.select(*lt.columns))
    for v in values:
        filled = filled.withColumn(f"asof_{v}", F.last(v, ignorenulls=True).over(w))
    return filled.filter(F.col("__asof_src") == 1).drop("__asof_src", *carry)


def range_join(
    left: DataFrame,
    right: DataFrame,
    by: list[tuple[str, str]],
    on: tuple[str, str],
    lower: Column,
    upper: Column,
    how: str = "left",
) -> DataFrame:
    """Equi-key + time-range join: rows pair when every `by` key
    matches AND left_ts + lower ≤ right_ts < left_ts + upper (e.g.
    lower=INTERVAL -1 HOUR, upper=INTERVAL 0 SECOND for "the preceding
    hour"). The equi keys keep it a hash join with the range as a
    residual — never a cartesian."""
    lts, rts = on
    cond = None
    for lc, rc in by:
        c = left[lc] == right[rc]
        cond = c if cond is None else (cond & c)
    window = (right[rts] >= left[lts] + lower) & (right[rts] < left[lts] + upper)
    cond = window if cond is None else (cond & window)
    return left.join(right, cond, how)


def sessionize(
    df: DataFrame,
    ts_col: str,
    by: list[str],
    gap_us: int,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Gap-based sessionization: adds `session_seq` (1-based per `by`
    key) that increments whenever the time since the previous row
    exceeds `gap_us` microseconds, plus `__us` (the row's epoch-µs).

    Timestamps are compared at µs precision on every engine (the
    nanosecond-parquet hash-stability lesson); `tiebreak` orders
    simultaneous rows deterministically."""
    ts = F.col(ts_col)
    us = (
        F.unix_micros(ts)
        if dict(df.dtypes)[ts_col].startswith("timestamp")
        else ts.cast("long")
    )
    out = df.withColumn("__us", us)
    w = W.partitionBy(*by).orderBy("__us", *[F.col(c) for c in (tiebreak or [])])
    gap = F.col("__us") - F.lag("__us").over(w)
    return out.withColumn(
        "session_seq",
        F.sum(
            F.when(gap.isNull() | (gap > gap_us), F.lit(1)).otherwise(F.lit(0))
        ).over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
