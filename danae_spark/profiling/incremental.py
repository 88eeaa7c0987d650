"""Incremental (mergeable) profiling.

At 100 TB you never re-profile the whole lake when a partition lands:
each partition contributes a PARTIAL state of algebraic aggregates
(n, n_null, sum, sum_sq, higher-moment sums, min, max, a DataSketches
HLL sketch for distinct counts, and a bottom-k-by-hash quantile sample
— all commutative monoids), states merge associatively, and final
stats (mean, sample std, skewness/kurtosis, approx distinct, quantile
signatures) derive from the merged state. This mirrors how Spark's own
partial aggregation works, lifted to a persistable table so refreshes
are O(new data).

Sums accumulate in EXACT DECIMAL (rounding.dsum semantics): decimal
addition is associative and exact, so any slicing/merge order yields the
same state and finalize() reproduces the one-shot profiler BIT-FOR-BIT
— incremental refreshes can never drift from a full re-profile.

The reference re-runs its whole pandas-profiling pass per dataset on
every change (`ingest/profiling/profiler.py` polling loop); this module
is the incremental replacement.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from danae_spark.functions.rounding import rnd
from danae_spark.profiling.types import NUMERIC, columns_of_class

STATE_COLS = (
    "n", "n_null", "s", "s2",
    "q2f", "q2c", "q3f", "q3c", "q4f", "q4c",
    "amax", "min_v", "max_v", "hll",
)

# decimal(18,6) square domain (see rounding.DSUMSQ_MAX_ABS): out-of-range
# values are excluded from s2 per-row (the bare cast THROWS under ANSI);
# finalize uses `amax` to detect the case and refuse a wrong stddev
_S2_MAX_ABS = 1e12
# moment sums mirror rounding.dmoment_sum's two regimes: "fine"
# decimal(38,12) for |v| < MOMENT_SPLIT (small-magnitude accuracy) and
# "coarse" decimal(38, 12-3p) for bigger values, selected by amax at
# finalize time. Values beyond _Q_MAX_ABS are excluded per-row (the cast
# would throw under ANSI) and finalize_extended refuses skewness /
# kurtosis for such columns (NULL, never wrong or thrown).
_Q_MAX_ABS = 1e6


def _moment_pair(col, p: int, c: str, name: str):
    """Fine + coarse mergeable moment sums for one power (see
    rounding.dmoment_sum — same engine-stable string-route conversion,
    so finalize_extended reproduces the one-shot extended profile
    exactly)."""
    from danae_spark.functions.rounding import MOMENT_SPLIT, moment_dec

    prod = col
    for _ in range(p - 1):
        prod = prod * col
    fine = F.sum(
        F.when(F.abs(col) < MOMENT_SPLIT, moment_dec(prod, 12))
    ).alias(f"{c}__{name}f")
    coarse = F.sum(
        F.when(F.abs(col) < _Q_MAX_ABS, moment_dec(prod, 12 - 3 * p))
    ).alias(f"{c}__{name}c")
    return [fine, coarse]


def partial_state(df: DataFrame, table: str) -> DataFrame:
    """Mergeable per-column state for one slice of a table.

    s/s2 are the exact-decimal sums the base profiler uses; q2..q4 are
    moment-style sums (power formed in double, decimal(38,12)-cast, exact
    sum — rounding.dmoment_sum semantics) feeding skewness/kurtosis in
    finalize_extended. All are commutative monoids under +/min/max."""
    cols = columns_of_class(df.schema, NUMERIC)
    aggs = []
    for c in cols:
        col = F.col(c).cast("double")
        c6 = F.when(F.abs(col) < _S2_MAX_ABS, col.cast("decimal(18,6)"))
        aggs += [
            F.count(col).alias(f"{c}__n"),
            F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"{c}__n_null"),
            F.sum(col.cast("decimal(28,6)")).alias(f"{c}__s"),
            F.sum(c6 * c6).alias(f"{c}__s2"),
            *[
                agg
                for pw, name in ((2, "q2"), (3, "q3"), (4, "q4"))
                for agg in _moment_pair(col, pw, c, name)
            ],
            F.max(F.abs(col)).alias(f"{c}__amax"),
            F.min(col).alias(f"{c}__min_v"),
            F.max(col).alias(f"{c}__max_v"),
            # DataSketches HLL: register state is max-based, so unions
            # merge losslessly (estimates drift ≤1 from the union's
            # HLL_4→HLL_8 re-encoding) — distinct counts stay mergeable
            # across slices and streams.
            # The sketch takes int/string/binary only: feed the double's
            # canonical string (injective, deterministic per value)
            F.hll_sketch_agg(col.cast("string")).alias(f"{c}__hll"),
        ]
    one = df.agg(*aggs)
    groups = ", ".join(
        "'{c}', {fields}".format(
            c=c, fields=", ".join(f"`{c}__{s}`" for s in STATE_COLS)
        )
        for c in cols
    )
    return one.select(
        F.expr(f"stack({len(cols)}, {groups}) AS (column_name, {', '.join(STATE_COLS)})")
    ).select(F.lit(table).alias("table_name"), "*")


def merge_states(states: list[DataFrame]) -> DataFrame:
    """Associative merge of partial states (union + re-aggregate)."""
    unioned = reduce(lambda a, b: a.unionByName(b), states)
    return unioned.groupBy("table_name", "column_name").agg(
        F.sum("n").alias("n"),
        F.sum("n_null").alias("n_null"),
        F.sum("s").alias("s"),
        F.sum("s2").alias("s2"),
        F.sum("q2f").alias("q2f"),
        F.sum("q2c").alias("q2c"),
        F.sum("q3f").alias("q3f"),
        F.sum("q3c").alias("q3c"),
        F.sum("q4f").alias("q4f"),
        F.sum("q4c").alias("q4c"),
        F.max("amax").alias("amax"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
        F.hll_union_agg("hll").alias("hll"),
    )


def finalize(state: DataFrame) -> DataFrame:
    """Derive display stats from merged state (identical IEEE double ops
    to profiler._profile_melted, so outputs match it exactly).

    std_v is NULLed when max|v| is outside the decimal-square domain —
    the state can't hold those squares exactly, and NULL beats wrong."""
    n = F.col("n")
    s, s2 = F.col("s").cast("double"), F.col("s2").cast("double")
    var = (s2 - s * s / n) / (n - 1)
    std = F.when(
        F.col("amax") < _S2_MAX_ABS,
        rnd(F.sqrt(F.greatest(var, F.lit(0.0))), 4),
    )
    return state.select(
        "table_name",
        "column_name",
        "n",
        "n_null",
        F.hll_sketch_estimate("hll").alias("n_distinct_approx"),
        "min_v",
        "max_v",
        rnd(s / n, 4).alias("avg_v"),
        std.alias("std_v"),
    ).orderBy("table_name", "column_name")


def quantile_sample_state(
    df: DataFrame, table: str, key_cols: list[str], k: int = 1024
) -> DataFrame:
    """Mergeable quantile state: the k rows with the SMALLEST md5 hash
    of (row key, column name), per numeric column.

    A bottom-k-by-hash sample is a uniform sample that is exactly
    mergeable (bottom-k of a union == bottom-k of the parts' bottom-ks)
    and deterministic (no RNG, no partition-order dependence) — so
    incremental quantile/signature refreshes are reproducible and
    slice-order independent, unlike reservoir sampling. Quantiles from
    the sample carry ~1/√k rank error (k=1024 → ~1.5 pp at the median).

    Two-level selection keeps it scalable: a per-input-partition
    bottom-k first (parallel window over (column, partition id)), then
    the global bottom-k over the ≤ k×P survivors — the full data is
    never shuffled into one reducer per column.

    `key_cols` must identify rows (a primary key); rows sharing a key
    hash identically, which biases the sample."""
    from pyspark.sql import Window as W

    cols = columns_of_class(df.schema, NUMERIC)
    key = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in key_cols])
    groups = ", ".join(
        f"'{c}', md5(concat(__key, '\x1f', '{c}')), CAST(`{c}` AS DOUBLE)"
        for c in cols
    )
    melted = (
        df.withColumn("__key", key)
        .select(
            F.expr(f"stack({len(cols)}, {groups}) AS (column_name, h, v)"),
            F.spark_partition_id().alias("__pid"),
        )
        .filter(F.col("v").isNotNull())
    )
    w_local = W.partitionBy("column_name", "__pid").orderBy("h", "v")
    local = (
        melted.withColumn("__rn", F.row_number().over(w_local))
        .filter(F.col("__rn") <= k)
        .drop("__rn", "__pid")
    )
    w_global = W.partitionBy("column_name").orderBy("h", "v")
    return (
        local.withColumn("__rn", F.row_number().over(w_global))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
        .select(F.lit(table).alias("table_name"), "column_name", "h", "v")
    )


def merge_quantile_samples(states: list[DataFrame], k: int = 1024) -> DataFrame:
    """Associative merge: union, keep the k smallest hashes per column."""
    from pyspark.sql import Window as W

    unioned = reduce(lambda a, b: a.unionByName(b), states)
    w = W.partitionBy("table_name", "column_name").orderBy("h", "v")
    return (
        unioned.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def term_count_state(
    df: DataFrame,
    table: str,
    cols: list[str] | None = None,
    min_count: int = 1,
) -> DataFrame:
    """Mergeable term-count state for categorical columns (the
    incremental input to the reference's fetch_top_k / top-k terms).

    Tokenization is identical to profiling/tfidf.tokenize, so merged
    states finalize to EXACTLY the one-shot categorical_topk. State
    size is the slice's distinct-term count per column — fine for
    enum-like columns; for unbounded vocabularies pass `min_count > 1`
    to drop per-slice rare terms (lossy counting: a merged count
    under-reads by at most (min_count−1) × #slices, and only terms
    below that bound can be missed)."""
    from danae_spark.profiling.tfidf import tokenize

    if cols is None:
        from danae_spark.profiling.types import CATEGORICAL

        cols = columns_of_class(df.schema, CATEGORICAL)
    parts = []
    for c in cols:
        toks = tokenize(df.select(F.col(c).cast("string").alias("val")), "val")
        parts.append(
            toks.select(
                F.lit(table).alias("table_name"),
                F.lit(c).alias("column_name"),
                "term",
            )
        )
    unioned = reduce(lambda a, b: a.unionByName(b), parts)
    counts = unioned.groupBy("table_name", "column_name", "term").agg(
        F.count("*").alias("cnt")
    )
    if min_count > 1:
        counts = counts.filter(F.col("cnt") >= min_count)
    return counts


def merge_term_counts(states: list[DataFrame]) -> DataFrame:
    """Associative merge: counts are a sum monoid per (column, term)."""
    unioned = reduce(lambda a, b: a.unionByName(b), states)
    return unioned.groupBy("table_name", "column_name", "term").agg(
        F.sum("cnt").alias("cnt")
    )


def finalize_topk_terms(state: DataFrame, k: int = 10) -> DataFrame:
    """Top-k terms per column from merged term counts — same ranking
    (freq desc, term asc) and columns as tfidf.categorical_topk."""
    from pyspark.sql import Window as W

    w = W.partitionBy("table_name", "column_name").orderBy(
        F.desc("freq"), F.asc("term")
    )
    return (
        state.withColumnRenamed("cnt", "freq")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("table_name", "column_name", "rank")
    )


def finalize_quantile_signature(state: DataFrame, rounding: int | None = 4) -> DataFrame:
    """7-point quantile signature (profiler.SIGNATURE_PS) estimated from
    the merged sample — the incrementally-maintained twin of
    profiler.quantile_signatures, feeding the content search index
    without re-profiling unchanged data."""
    from danae_spark.profiling.profiler import SIGNATURE_NAMES, SIGNATURE_PS

    q = F.percentile(F.col("v"), F.lit(list(SIGNATURE_PS)))
    out = (
        state.groupBy("table_name", "column_name")
        .agg(q.alias("q"))
        .select(
            "table_name",
            "column_name",
            *[
                (rnd(F.col("q")[i], rounding) if rounding is not None else F.col("q")[i]).alias(n)
                for i, n in enumerate(SIGNATURE_NAMES)
            ],
        )
    )
    return out.orderBy("table_name", "column_name")


def finalize_extended(state: DataFrame) -> DataFrame:
    """Extended stats from the SAME merged state — the incremental twin
    of profiler.numeric_profile_extended (identical moment formulas on
    identical exact sums, so outputs match the one-shot pass exactly
    for in-domain columns)."""
    n = F.col("n")
    nn = F.col("n_null")
    nd = n.cast("double")
    from danae_spark.functions.rounding import MOMENT_SPLIT

    s1 = F.col("s").cast("double")
    fine = F.col("amax") < MOMENT_SPLIT
    q2, q3, q4 = (
        F.when(fine, F.col(f"{c}f").cast("double")).otherwise(
            F.col(f"{c}c").cast("double")
        )
        for c in ("q2", "q3", "q4")
    )
    mean = s1 / nd
    m2 = q2 / nd - mean * mean
    m3 = q3 / nd - F.lit(3.0) * mean * (q2 / nd) + F.lit(2.0) * mean * mean * mean
    m4 = (
        q4 / nd
        - F.lit(4.0) * mean * (q3 / nd)
        + F.lit(6.0) * mean * mean * (q2 / nd)
        - F.lit(3.0) * mean * mean * mean * mean
    )
    skew = (m3 / (F.sqrt(m2) * m2)) * F.sqrt(nd * (nd - F.lit(1.0))) / (nd - F.lit(2.0))
    kurt = (
        ((nd + F.lit(1.0)) * (m4 / (m2 * m2) - F.lit(3.0)) + F.lit(6.0))
        * (nd - F.lit(1.0))
        / ((nd - F.lit(2.0)) * (nd - F.lit(3.0)))
    )
    s2 = F.col("s2").cast("double")
    var = (s2 - s1 * s1 / n) / (n - 1)
    std = F.when(
        (F.col("amax") < _S2_MAX_ABS) & (n > 1),
        F.sqrt(F.greatest(var, F.lit(0.0))),
    )
    mean_x = s1 / n
    return state.select(
        "table_name",
        "column_name",
        "n",
        "n_null",
        F.hll_sketch_estimate("hll").alias("n_distinct_approx"),
        rnd(nn.cast("double") * F.lit(100.0) / (n + nn), 4).alias("missing_pct"),
        rnd(mean_x, 4).alias("avg_v"),
        rnd(std, 4).alias("std_v"),
        F.when(mean_x != 0, rnd(std / mean_x, 4)).alias("cv"),
        F.when(
            (n > 2) & (m2 > 0) & (F.col("amax") < _Q_MAX_ABS), rnd(skew, 4)
        ).alias("skewness"),
        F.when(
            (n > 3) & (m2 > 0) & (F.col("amax") < _Q_MAX_ABS), rnd(kurt, 4)
        ).alias("kurtosis"),
    ).orderBy("table_name", "column_name")


# ----------------------------- drift detection between profile states


def profile_drift(
    state_a: DataFrame,
    state_b: DataFrame,
    sigma_threshold: float = 3.0,
    std_ratio_band: tuple = (0.5, 2.0),
    null_delta_max: float = 0.1,
) -> DataFrame:
    """Schema/distribution drift between two profile STATES (baseline →
    current) — the monitoring read of the incremental machinery: land
    per-day mergeable states (partial_state / the streaming sink), then
    diff any two checkpoints without rescanning data.

    Per shared column: row-count ratio, null-rate delta, mean shift in
    baseline-stddev units, stddev ratio, approx-distinct ratio, and
    range expansion; `drifted` flags columns whose shift crosses the
    thresholds. Columns appearing on only one side surface with
    `presence` = 'added'/'removed' (schema drift IS drift). The inputs
    are schema-sized state frames, so the whole diff is a tiny
    broadcast-scale join — no data scan."""
    a = finalize(state_a).select(
        "table_name", "column_name",
        F.col("n").alias("n_a"), F.col("n_null").alias("null_a"),
        F.col("n_distinct_approx").alias("nda_a"),
        F.col("min_v").alias("min_a"), F.col("max_v").alias("max_a"),
        F.col("avg_v").alias("avg_a"), F.col("std_v").alias("std_a"),
    )
    b = finalize(state_b).select(
        "table_name", "column_name",
        F.col("n").alias("n_b"), F.col("n_null").alias("null_b"),
        F.col("n_distinct_approx").alias("nda_b"),
        F.col("min_v").alias("min_b"), F.col("max_v").alias("max_b"),
        F.col("avg_v").alias("avg_b"), F.col("std_v").alias("std_b"),
    )
    j = a.join(b, ["table_name", "column_name"], "full_outer")
    presence = (
        F.when(F.col("n_a").isNull(), F.lit("added"))
        .when(F.col("n_b").isNull(), F.lit("removed"))
        .otherwise(F.lit("both"))
    )
    # finalize's n counts NON-null values, so the null RATE denominator
    # is total rows (n + n_null); every division is zero-guarded — a
    # fully-null current slice (n_b = 0) must surface as drift, never as
    # an ANSI DIVIDE_BY_ZERO or a coalesced-to-fine verdict (r6 review)
    rows_a = F.col("n_a") + F.col("null_a")
    rows_b = F.col("n_b") + F.col("null_b")
    null_rate_a = F.when(rows_a > 0, F.col("null_a") / rows_a)
    null_rate_b = F.when(rows_b > 0, F.col("null_b") / rows_b)
    n_ratio = F.when(F.col("n_a") > 0, F.col("n_b") / F.col("n_a"))
    distinct_ratio = F.when(
        F.col("nda_a") > 0, F.col("nda_b") / F.col("nda_a")
    )
    mean_shift = F.when(
        F.col("std_a").isNotNull() & (F.col("std_a") > 0),
        (F.col("avg_b") - F.col("avg_a")) / F.col("std_a"),
    )
    std_ratio = F.when(
        F.col("std_a").isNotNull() & (F.col("std_a") > 0), F.col("std_b") / F.col("std_a")
    )
    lo, hi = std_ratio_band
    went_empty = (presence == "both") & (F.col("n_a") > 0) & (F.col("n_b") == 0)
    drifted = (
        (presence != "both")
        | went_empty
        | (F.abs(F.coalesce(mean_shift, F.lit(0.0))) > sigma_threshold)
        | F.coalesce((std_ratio < lo) | (std_ratio > hi), F.lit(False))
        | (F.abs(F.coalesce(null_rate_b - null_rate_a, F.lit(0.0))) > null_delta_max)
    )
    return j.select(
        "table_name",
        "column_name",
        presence.alias("presence"),
        n_ratio.alias("n_ratio"),
        (null_rate_b - null_rate_a).alias("null_rate_delta"),
        mean_shift.alias("mean_shift_sigma"),
        std_ratio.alias("std_ratio"),
        distinct_ratio.alias("distinct_ratio"),
        ((F.col("min_b") < F.col("min_a")) | (F.col("max_b") > F.col("max_a")))
        .cast("int")
        .alias("range_expanded"),
        drifted.cast("int").alias("drifted"),
    ).orderBy("table_name", "column_name")


# ----------------------- bounded heavy hitters (Misra-Gries, mergeable)

HH_K = 64
_HH_ERR_TERM = "\x00__mg_err__"  # sentinel row carrying the error bound


def _mg_compress(counts: DataFrame, k: int) -> DataFrame:
    """Compress per-column term counts to ≤ k counters (Misra-Gries):
    subtract the (k+1)-th largest count from every term, drop the
    non-positive ones, and ADD the subtraction to the column's error
    row. Counts become lower bounds; true count ≤ cnt + err."""
    from pyspark.sql import Window as W

    data = counts.filter(F.col("term") != _HH_ERR_TERM)
    err = counts.filter(F.col("term") == _HH_ERR_TERM)
    wcol = W.partitionBy("table_name", "column_name")
    rn = F.row_number().over(wcol.orderBy(F.desc("cnt"), F.asc("term")))
    ranked = data.withColumn(
        "__ckp1",
        F.coalesce(
            F.max(F.when(rn == k + 1, F.col("cnt"))).over(wcol), F.lit(0)
        ),
    )
    kept = ranked.filter(F.col("cnt") > F.col("__ckp1")).select(
        "table_name", "column_name", "term",
        (F.col("cnt") - F.col("__ckp1")).alias("cnt"),
    )
    # per-column subtraction joins the existing error row (sum monoid)
    new_err = (
        ranked.groupBy("table_name", "column_name")
        .agg(F.max("__ckp1").alias("cnt"))
        .select(
            "table_name", "column_name", F.lit(_HH_ERR_TERM).alias("term"), "cnt"
        )
    )
    merged_err = (
        err.select("table_name", "column_name", "term", "cnt")
        .unionByName(new_err)
        .groupBy("table_name", "column_name", "term")
        .agg(F.sum("cnt").alias("cnt"))
    )
    return kept.unionByName(merged_err)


def heavy_hitter_state(
    df: DataFrame,
    table: str,
    cols: list[str] | None = None,
    k: int = HH_K,
) -> DataFrame:
    """BOUNDED mergeable frequent-term summary per categorical column:
    a Misra-Gries k-counter sketch — at most k+1 state rows per column
    no matter how large the vocabulary (the unbounded-vocab answer the
    lossy `term_count_state(min_count=...)` variant only approximates).

    Guarantees (Agarwal et al., PODS 2012 — MG summaries are
    mergeable): every stored count is a LOWER bound; the true count
    exceeds it by at most the column's error row; any term with true
    frequency > Σ subtractions (≤ N/(k+1)) is guaranteed present.
    Merging slices = summing counters per term + re-compressing
    (`merge_heavy_hitters`), so streaming maintenance lands one
    bounded state per micro-batch exactly like the moments/HLL/sample
    states."""
    return _mg_compress(term_count_state(df, table, cols=cols), k)


def merge_heavy_hitters(states: list[DataFrame], k: int = HH_K) -> DataFrame:
    """Associative merge: counter sums per term (error rows merge the
    same way), then one re-compression back to ≤ k counters."""
    unioned = reduce(lambda a, b: a.unionByName(b), states)
    summed = unioned.groupBy("table_name", "column_name", "term").agg(
        F.sum("cnt").alias("cnt")
    )
    return _mg_compress(summed, k)


def finalize_heavy_hitters(state: DataFrame, k: int = 10) -> DataFrame:
    """Top-k candidate heavy hitters per column with count BOUNDS:
    (term, freq_low, freq_high) — freq_high = freq_low + the column's
    accumulated error."""
    from pyspark.sql import Window as W

    err = (
        state.filter(F.col("term") == _HH_ERR_TERM)
        .select("table_name", "column_name", F.col("cnt").alias("err"))
    )
    data = state.filter(F.col("term") != _HH_ERR_TERM)
    w = W.partitionBy("table_name", "column_name").orderBy(
        F.desc("cnt"), F.asc("term")
    )
    return (
        data.join(err, ["table_name", "column_name"], "left")
        .na.fill({"err": 0})
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "table_name", "column_name", "term",
            F.col("cnt").alias("freq_low"),
            (F.col("cnt") + F.col("err")).alias("freq_high"),
            "rank",
        )
        .orderBy("table_name", "column_name", "rank")
    )
