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


# ---------------------------------------------- rolling z-score anomalies

ZSCORE_WINDOW_S = 3600
ZSCORE_MIN_BASELINE = 5
ZSCORE_THRESHOLD = 3.0


def rolling_zscore_anomaly(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    by: tuple[str, ...] = ("event_type",),
    window_s: int = ZSCORE_WINDOW_S,
    min_baseline: int = ZSCORE_MIN_BASELINE,
    threshold: float = ZSCORE_THRESHOLD,
    id_col: str = "event_id",
    bucket_s: int | None = None,
) -> DataFrame:
    """Event-time anomaly detection: flag rows whose value deviates ≥
    `threshold` standard deviations from the PRECEDING `window_s`-second
    baseline of their group — the streaming-metrics outlier pattern
    (rolling z-score), as one RANGE-frame window pass.

    The frame is [−window_s, −1] seconds: strictly earlier events only,
    so the anomaly candidate never contaminates its own baseline and
    simultaneous events are excluded identically on every engine. Rows
    with fewer than `min_baseline` prior events or a degenerate (zero
    variance) baseline are not scored. Baseline moments accumulate in
    exact decimal (the dsum/dsumsq route) so frame-internal order can
    never flip a rounded z digit.

    Scale — the r7 overlapped-bucket rewrite: a window partitioned ONLY
    by the group key caps parallelism at |distinct groups| (the lake's
    5 event_types → 5 tasks on ANY cluster — a hard 100 TB ceiling).
    With `bucket_s` set (default 16·window_s via the registered entry),
    rows sub-partition into (group, time-bucket) and every row in the
    last `window_s` seconds of a bucket is ALSO copied into the next
    bucket as a baseline-only context row (`__ctx`=1, never scored, cut
    before output). Every scored row's full lookback is then in-bucket,
    so the result is EXACTLY the single-window answer — proven by the
    unchanged DuckDB oracle, which still states the global per-group
    window — while parallelism becomes |groups|·|buckets| and the
    duplication overhead is window_s/bucket_s (≤ 1/16). bucket_s=None
    keeps the single-window plan (callers with many groups)."""
    from danae_spark.functions.rounding import DSCALE, DSUMSQ_MAX_ABS, rnd

    epoch = F.floor(F.col(ts_col).cast("double")).cast("long")
    d = df.withColumn("__sec", epoch)
    if bucket_s:
        if bucket_s <= window_s:
            raise ValueError(f"bucket_s ({bucket_s}) must exceed window_s ({window_s})")
        bkt = F.floor(F.col("__sec") / F.lit(bucket_s)).cast("long")
        native = d.withColumn("__bkt", bkt).withColumn("__ctx", F.lit(0))
        ctx = (
            d.filter(F.col("__sec") - bkt * F.lit(bucket_s) >= bucket_s - window_s)
            .withColumn("__bkt", bkt + 1)
            .withColumn("__ctx", F.lit(1))
        )
        d = native.unionByName(ctx)
        w = (
            W.partitionBy(*by, "__bkt")
            .orderBy("__sec")
            .rangeBetween(-window_s, -1)
        )
    else:
        d = d.withColumn("__ctx", F.lit(0))
        w = (
            W.partitionBy(*by)
            .orderBy("__sec")
            .rangeBetween(-window_s, -1)
        )
    v = F.col(value_col).cast("double")
    # the dstd regime switch: values at/above the decimal domain would
    # silently VANISH from the decimal sum-of-squares while still being
    # counted (wrong variance). The regime is decided ONCE, driver-side,
    # from a global 1-row max (column-pruned scan): a per-window switch
    # would compute BOTH sum branches plus a frame-max for every window
    # — measured 13.1 s materialized at sf0.1 vs ~4 s with the single
    # decided branch. Any out-of-domain value flips the whole frame to
    # plain double sums (order-fuzzy in the last ulp, correct in value);
    # the oracle mirrors the same global decision via a scalar subquery.
    amax_row = d.agg(F.max(F.abs(v)).alias("m")).collect()[0]
    big = amax_row.m is not None and amax_row.m >= DSUMSQ_MAX_ABS
    n = F.count(v).over(w)
    if big:
        s1 = F.sum(v).over(w)
        s2 = F.sum(v * v).over(w)
    else:
        c6 = v.cast(f"decimal(28,{DSCALE})")
        sq6 = F.when(
            F.abs(v) < F.lit(DSUMSQ_MAX_ABS), v.cast(f"decimal(18,{DSCALE})")
        )
        s1 = F.sum(c6).over(w).cast("double")
        s2 = F.sum(sq6 * sq6).over(w).cast("double")
    mean = s1 / n
    var = s2 / n - mean * mean
    z = (v - mean) / F.sqrt(var)
    # round BEFORE thresholding — the oracle filters the rounded zscore,
    # so filtering the raw z here would drop/keep different rows when
    # |z| lands within rounding distance of the threshold (review
    # finding, reproduced with a crafted z = threshold − 3e-5)
    return (
        d.withColumn("n_baseline", n)
        .withColumn(
            "zscore", F.when((n >= min_baseline) & (var > 0), rnd(z, 4))
        )
        .filter((F.col("__ctx") == 0) & (F.abs(F.col("zscore")) >= threshold))
        .select(
            id_col,
            *by,
            F.col("__sec").alias("epoch_s"),
            v.alias("value"),
            F.col("n_baseline").cast("long").alias("n_baseline"),
            "zscore",
        )
        .orderBy(id_col)
    )


def rolling_zscore_oracle(
    window_s: int = ZSCORE_WINDOW_S,
    min_baseline: int = ZSCORE_MIN_BASELINE,
    threshold: float = ZSCORE_THRESHOLD,
) -> str:
    from danae_spark.functions.rounding import DSCALE, DSUMSQ_MAX_ABS, rnd_sql

    c6 = f"CAST(value AS DECIMAL(28,{DSCALE}))"
    sq6 = (
        f"CASE WHEN abs(value) < {DSUMSQ_MAX_ABS} "
        f"THEN CAST(value AS DECIMAL(28,{DSCALE})) END"
    )
    frame = (
        f"OVER (PARTITION BY event_type ORDER BY epoch_s "
        f"RANGE BETWEEN {window_s} PRECEDING AND 1 PRECEDING)"
    )
    big = f"((SELECT max(abs(value)) FROM e) >= {DSUMSQ_MAX_ABS})"
    z = "((value - s1 / n) / sqrt(s2 / n - (s1 / n) * (s1 / n)))"
    return f"""
    WITH e AS (
      SELECT event_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
             CAST(value AS DOUBLE) AS value
      FROM events
    ),
    base AS (
      SELECT event_id, event_type, epoch_s, value,
             count(value) {frame} AS n,
             CASE WHEN {big} THEN sum(value) {frame}
                  ELSE CAST(sum({c6}) {frame} AS DOUBLE) END AS s1,
             CASE WHEN {big} THEN sum(value * value) {frame}
                  ELSE CAST(sum({sq6} * {sq6}) {frame} AS DOUBLE) END AS s2
      FROM e
    ),
    scored AS (
      SELECT event_id, event_type, epoch_s, value,
             CAST(n AS BIGINT) AS n_baseline,
             CASE WHEN n >= {min_baseline} AND (s2 / n - (s1 / n) * (s1 / n)) > 0
                  THEN {rnd_sql(z, 4)} END AS zscore
      FROM base
    )
    SELECT event_id, event_type, epoch_s, value, n_baseline, zscore
    FROM scored WHERE abs(zscore) >= {threshold}
    ORDER BY event_id
    """
