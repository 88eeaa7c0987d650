"""B-block: relational/analytics core over the TPC-H-ish lake tables.

These prove the engine's join/agg/window machinery and anchor the bench.
Every query is declarative DataFrame/SQL (Catalyst handles pushdown,
pruning, join strategy); doubles are rounded identically on both the
Spark and the DuckDB-oracle side so order-insensitive value hashes match.

Scale notes (100 TB): facts (lineitem/orders/events) shuffle at most once
on their join key; all dims (region/nation/supplier/customer at TPC-H
ratios) are broadcast. Window queries partition by high-cardinality keys
(user_id/custkey) so state per partition stays small. AQE handles skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from danae_spark.catalog import load_table
from danae_spark.queries import register
from danae_spark.functions.rounding import (
    davg,
    davg_sql,
    dsum,
    dsum_sql,
    rnd,
    rnd_sql,
)

# ---------------------------------------------------------------- B1: TPC-H Q1


_Q1_DISC = "l_extendedprice * (1 - l_discount)"
_Q1_CHARGE = "l_extendedprice * (1 - l_discount) * (1 + l_tax)"


@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {rnd_sql(dsum_sql('l_quantity'), 2)}       AS sum_qty,
           {rnd_sql(dsum_sql('l_extendedprice'), 2)}  AS sum_base_price,
           {rnd_sql(dsum_sql(_Q1_DISC), 2)}           AS sum_disc_price,
           {rnd_sql(dsum_sql(_Q1_CHARGE), 2)}         AS sum_charge,
           {rnd_sql(davg_sql('l_quantity'), 4)}       AS avg_qty,
           {rnd_sql(davg_sql('l_extendedprice'), 4)}  AS avg_price,
           {rnd_sql(davg_sql('l_discount'), 4)}       AS avg_disc,
           count(*)                                   AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1. Sums/avgs go through exact decimal accumulation (see
    rounding.dsum) so the rounded result is independent of partition
    order — double sums at this row count carry enough fp noise to flip
    the 0.5001-floor boundary between runs/engines."""
    l = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            rnd(dsum("l_quantity"), 2).alias("sum_qty"),
            rnd(dsum("l_extendedprice"), 2).alias("sum_base_price"),
            rnd(dsum(disc_price), 2).alias("sum_disc_price"),
            rnd(dsum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            rnd(davg("l_quantity"), 4).alias("avg_qty"),
            rnd(davg("l_extendedprice"), 4).alias("avg_price"),
            rnd(davg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------- B2: TPC-H Q3


@register(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey AS orderkey,
           {rnd_sql(dsum_sql('l.l_extendedprice * (1 - l.l_discount)'), 2)} AS revenue,
           o.o_orderdate AS orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1995-03-15").cast("timestamp")
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c.select("c_custkey")), o.o_custkey == F.col("c_custkey"))
        .groupBy(F.col("l_orderkey").alias("orderkey"), F.col("o_orderdate").alias("orderdate"))
        .agg(rnd(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select("orderkey", "revenue", "orderdate")
        .orderBy(F.desc("revenue"), "orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------- B3: TPC-H Q5


@register(
    "q5_local_volume",
    oracle=f"""
    SELECT n.n_name AS nation,
           {rnd_sql(dsum_sql('l.l_extendedprice * (1 - l.l_discount)'), 2)} AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name
    ORDER BY revenue DESC
    """,
)
def q5_local_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    # dims are broadcast; the only big shuffle is lineitem⋈orders on orderkey
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(rnd(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"))
    )


# ---------------------------------------------------------------- B4: window top-N


@register(
    "top_n_per_group",
    oracle="""
    SELECT p_brand, p_partkey, p_retailprice, rank_in_brand
    FROM (
      SELECT p_brand, p_partkey, p_retailprice,
             row_number() OVER (PARTITION BY p_brand
                                ORDER BY p_retailprice DESC, p_partkey) AS rank_in_brand
      FROM part
    )
    WHERE rank_in_brand <= 3
    ORDER BY p_brand, rank_in_brand
    """,
)
def top_n_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return (
        p.withColumn("rank_in_brand", F.row_number().over(w))
        .filter(F.col("rank_in_brand") <= 3)
        .select("p_brand", "p_partkey", "p_retailprice", "rank_in_brand")
        .orderBy("p_brand", "rank_in_brand")
    )


# ---------------------------------------------------------------- B5: running totals


_RT_FRAME_RUN = (
    "PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
)
_RT_FRAME_3 = (
    "PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey "
    "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW"
)


@register(
    "running_totals",
    oracle=f"""
    SELECT o_custkey, o_orderkey,
           {rnd_sql(dsum_sql('o_totalprice', f'OVER ({_RT_FRAME_RUN})'), 2)}
             AS running_spend,
           {rnd_sql(dsum_sql('o_totalprice', f'OVER ({_RT_FRAME_3})')
                    + f' / count(*) OVER ({_RT_FRAME_3})', 4)}
             AS moving_avg_3
    FROM orders
    WHERE o_custkey <= 100
    ORDER BY o_custkey, o_orderkey
    """,
)
def running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running/moving window aggregates. Window sums accumulate in exact
    decimal (engine window implementations associate sums differently —
    running fold vs segment tree — so double sums are not engine-stable)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 100)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_run = w.rowsBetween(W.unboundedPreceding, 0)
    w3 = w.rowsBetween(-2, 0)
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            rnd(dsum("o_totalprice", lambda c: F.sum(c).over(w_run)), 2).alias(
                "running_spend"
            ),
            rnd(
                dsum("o_totalprice", lambda c: F.sum(c).over(w3))
                / F.count("*").over(w3),
                4,
            ).alias("moving_avg_3"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


# ---------------------------------- B6+B22: grouping sets (rollup ∪ cube)


@register(
    "grouping_sets_agg",
    oracle=f"""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           grouping_id(l_returnflag, l_linestatus) AS gset,
           CASE WHEN grouping_id(l_returnflag, l_linestatus) IN (0, 1, 3)
                THEN 1 ELSE 0 END AS in_rollup,
           {rnd_sql(dsum_sql('l_extendedprice'), 2)} AS total_price,
           {rnd_sql(dsum_sql('l_quantity'), 2)} AS total_qty,
           count(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY returnflag, linestatus
    """,
)
def grouping_sets_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-dimensional grouping-set aggregation (merged r1 entries
    rollup_agg + cube_agg): one CUBE pass emits every grouping set with
    its grouping_id; `in_rollup` marks the ROLLUP subset, so both
    operators' semantics are verified from a single aggregate. One
    shuffle; the Expand operator fans each row into its 4 sets map-side."""
    l = load_table(spark, sf_dir, "lineitem")
    gid = F.grouping_id("l_returnflag", "l_linestatus")
    return (
        l.cube("l_returnflag", "l_linestatus")
        .agg(
            gid.alias("gset"),
            F.when(gid.isin(0, 1, 3), F.lit(1)).otherwise(F.lit(0)).alias("in_rollup"),
            rnd(dsum("l_extendedprice"), 2).alias("total_price"),
            rnd(dsum("l_quantity"), 2).alias("total_qty"),
            F.count("*").alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "gset",
            "in_rollup",
            "total_price",
            "total_qty",
            "n",
        )
        .orderBy("returnflag", "linestatus")
    )


# ---------------------------------------------------------------- B7: pivot


@register(
    "pivot_returnflag",
    oracle=f"""
    SELECT l_returnflag,
           {rnd_sql("coalesce(" + dsum_sql("CASE WHEN l_linestatus = 'O' THEN l_quantity END") + ", 0.0)", 2)} AS qty_o,
           {rnd_sql("coalesce(" + dsum_sql("CASE WHEN l_linestatus = 'F' THEN l_quantity END") + ", 0.0)", 2)} AS qty_f
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def pivot_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(dsum("l_quantity"))
        .select(
            "l_returnflag",
            rnd(F.coalesce(F.col("O"), F.lit(0.0)), 2).alias("qty_o"),
            rnd(F.coalesce(F.col("F"), F.lit(0.0)), 2).alias("qty_f"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------- B8: sessionization


_SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min in microseconds


@register(
    "sessionize_events",
    oracle=f"""
    WITH e AS (
      SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us, value, event_id
      FROM events
    ), flagged AS (
      SELECT user_id, us, value,
             CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
                       > {_SESSION_GAP_US}
                  OR lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_new,
             event_id
      FROM e
    ), sessions AS (
      SELECT user_id, us, value,
             CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS session_seq
      FROM flagged
    )
    SELECT user_id, session_seq, count(*) AS n_events,
           min(us) AS session_start_us, max(us) AS session_end_us,
           {rnd_sql(dsum_sql('value'), 4)} AS session_value
    FROM sessions
    GROUP BY user_id, session_seq
    ORDER BY user_id, session_seq
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min timeout): lag → new-session flag →
    running sum = session id. One shuffle on user_id; both windows and the
    final groupBy reuse that partitioning.

    Hash-stability (r1 driver failure): the source timestamps are
    nanosecond parquet values; both engines floor them to microseconds on
    read (catalog.load_table / DuckDB's ns→µs cast), so ALL session math
    and ALL emitted values are epoch-microsecond BIGINTs — the gap
    comparison happens at identical precision on both sides and no raw
    timestamp ever reaches the serialized result."""
    from danae_spark.operators.temporal import sessionize

    e = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "value", "event_id"
    )
    sessions = sessionize(
        e, "ts", ["user_id"], gap_us=_SESSION_GAP_US, tiebreak=["event_id"]
    )
    return (
        sessions.groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            F.min("__us").alias("session_start_us"),
            F.max("__us").alias("session_end_us"),
            rnd(dsum("value"), 4).alias("session_value"),
        )
        .orderBy("user_id", "session_seq")
    )


# ---------------------------------------------------------------- B9: as-of join


@register(
    "asof_join_events",
    oracle="""
    WITH tagged AS (
      SELECT o_custkey AS user_id, o_orderdate AS ts, o_orderkey,
             NULL::BIGINT AS event_id, NULL::VARCHAR AS event_type
      FROM orders
      UNION ALL
      SELECT user_id, ts, NULL::BIGINT AS o_orderkey, event_id, event_type
      FROM events
    ), filled AS (
      SELECT user_id, ts, event_id, event_type,
             last_value(o_orderkey IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, o_orderkey NULLS LAST
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_orderkey
      FROM tagged
    )
    SELECT event_id, user_id, event_type, last_orderkey
    FROM filled
    WHERE event_id IS NOT NULL
    ORDER BY event_id
    """,
)
def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event picks the most recent order (by date) of the
    same user at-or-before its timestamp.

    Scalable pattern: tag + union both streams, single window per key with
    last(ignorenulls) — one shuffle total, no per-row range probe, no
    row explosion (vs. the naive join-then-max which is quadratic per key).
    Reference parity: danae has no as-of, but its temporal-column semantics
    (content_search.py:152 epoch ordering) motivate it; mandated temporal op.
    """
    from danae_spark.operators.temporal import asof_join

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").alias("ts"),
        "o_orderkey",
    )
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    joined = asof_join(
        e, o, on="ts", by=["user_id"], values=["o_orderkey"],
        right_order=["o_orderkey"],
    )
    return (
        joined.select(
            "event_id",
            "user_id",
            "event_type",
            F.col("asof_o_orderkey").alias("last_orderkey"),
        )
        .orderBy("event_id")
    )


# ---------------------------------------------------------------- B10: range join


@register(
    "range_join_events",
    oracle="""
    SELECT p.event_id AS purchase_id,
           count(b.event_id) AS n_preceding_hour,
           floor((coalesce(sum(b.value), 0)) * power(10, 4) + 0.5001) / power(10, 4) AS preceding_value
    FROM events p
    LEFT JOIN events b
      ON b.user_id = p.user_id
     AND b.event_type IN ('click', 'view')
     AND b.ts >= p.ts - INTERVAL 1 HOUR
     AND b.ts < p.ts
    WHERE p.event_type = 'purchase'
    GROUP BY p.event_id
    ORDER BY p.event_id
    """,
)
def range_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-key + time-range self-join: for each purchase, the click/view
    activity of the same user in the preceding hour (attribution window).
    The equi condition on user_id keeps this a hash join with a range
    residual (not a cartesian); at 100 TB both sides shuffle once on the
    key and AQE splits skewed users."""
    e = load_table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    b = e.filter(F.col("event_type").isin("click", "view")).select(
        F.col("event_id").alias("b_id"), F.col("user_id").alias("b_user"), F.col("ts").alias("b_ts"), "value"
    )
    from danae_spark.operators.temporal import range_join

    return (
        range_join(
            p, b, by=[("p_user", "b_user")], on=("p_ts", "b_ts"),
            lower=F.expr("INTERVAL -1 HOUR"), upper=F.expr("INTERVAL 0 SECOND"),
        )
        .groupBy("purchase_id")
        .agg(
            F.count("b_id").alias("n_preceding_hour"),
            rnd(F.coalesce(F.sum("value"), F.lit(0.0)), 4).alias("preceding_value"),
        )
        .orderBy("purchase_id")
    )


# ---------------------------------------------------------------- B11: semi/anti join


@register(
    "semi_anti_join",
    oracle="""
    SELECT 'never_ordered_parts' AS segment, count(*) AS n
    FROM part p
    WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)
    UNION ALL
    SELECT 'active_customers' AS segment, count(*) AS n
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    ORDER BY segment
    """,
)
def semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    l = load_table(spark, sf_dir, "lineitem")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    never = (
        p.join(l, p.p_partkey == l.l_partkey, "left_anti")
        .agg(F.count("*").alias("n"))
        .select(F.lit("never_ordered_parts").alias("segment"), "n")
    )
    active = (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .agg(F.count("*").alias("n"))
        .select(F.lit("active_customers").alias("segment"), "n")
    )
    return never.unionByName(active).orderBy("segment")


# ------------------------------------------------ B14: TPC-H Q10 analogue


@register(
    "q10_returned_items",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, n.n_name AS nation,
           {rnd_sql(dsum_sql('l.l_extendedprice * (1 - l.l_discount)'), 2)} AS revenue,
           {rnd_sql('c.c_acctbal', 2)} AS acctbal
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
    GROUP BY c.c_custkey, c.c_name, n.n_name, c.c_acctbal
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 adapted to the lake schema: top customers by revenue
    lost to returned items in a quarter."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"), "c_acctbal")
        .agg(rnd(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select(
            "c_custkey", "c_name", "nation", "revenue", rnd("c_acctbal", 2).alias("acctbal")
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# ------------------------------------------------ B15: TPC-H Q14 analogue


_Q14_REV = "l.l_extendedprice * (1 - l.l_discount)"


@register(
    "q14_promo_share",
    oracle=f"""
    SELECT {rnd_sql(
        "100.0 * coalesce(" + dsum_sql(f"CASE WHEN p.p_type LIKE 'PROMO%' THEN {_Q14_REV} END") + ", 0.0)"
        " / " + dsum_sql(_Q14_REV), 4)} AS promo_revenue_pct,
           count(*) AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1996-02-01 00:00:00'
    """,
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promotional revenue share for one month."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-02-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").startswith("PROMO"), rev)
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            rnd(
                100.0 * F.coalesce(dsum(promo), F.lit(0.0)) / dsum(rev),
                4,
            ).alias("promo_revenue_pct"),
            F.count("*").alias("n_items"),
        )
    )


# ------------------------------------------------- B16: TPC-H Q4 analogue


@register(
    "q4_order_priority",
    oracle="""
    SELECT o.o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 adapted (no commitdate column): orders with a line shipped
    more than 60 days after ordering, counted per priority. EXISTS is a
    left-semi join with the date residual — no row duplication."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    cond = (l.l_orderkey == o.o_orderkey) & (
        l.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
    )
    return (
        o.join(l, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ------------------------------------------------- B17: TPC-H Q6


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT floor((sum(l_extendedprice * l_discount)) * power(10, 4) + 0.5001)
             / power(10, 4) AS revenue,
           count(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: all three predicates push to the parquet scan."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            rnd(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias("revenue"),
            F.count("*").alias("n"),
        )
    )


# ------------------------------------------------- B18: TPC-H Q13 analogue


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# ------------------------------------------------- B19: TPC-H Q18 analogue


@register(
    "q18_large_volume",
    oracle="""
    WITH big AS (
      SELECT l_orderkey, sum(l_quantity) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 150
    )
    SELECT c.c_custkey, c.c_name, o.o_orderkey,
           floor((o.o_totalprice) * power(10, 2) + 0.5001) / power(10, 2)
             AS totalprice,
           floor((b.total_qty) * power(10, 2) + 0.5001) / power(10, 2)
             AS total_qty
    FROM big b
    JOIN orders o ON b.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 20
    """,
)
def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: large-volume orders. The HAVING pre-aggregation shrinks
    the probe side before any join."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty_raw"))
        .filter(F.col("total_qty_raw") > 150)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            rnd(F.col("o_totalprice"), 2).alias("totalprice"),
            rnd(F.col("total_qty_raw"), 2).alias("total_qty"),
            F.col("o_totalprice").alias("_sort"),
        )
        .orderBy(F.desc("_sort"), "o_orderkey")
        .limit(20)
        .drop("_sort")
    )


# ---------------------------------------------- B23: time-range window frame


@register(
    "sliding_hour_user_value",
    oracle="""
    SELECT event_id, user_id,
           floor((sum(value) OVER (
             PARTITION BY user_id ORDER BY floor(epoch(ts))
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
           )) * power(10, 4) + 0.5001) / power(10, 4) AS hour_value,
           count(*) OVER (
             PARTITION BY user_id ORDER BY floor(epoch(ts))
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
           ) AS hour_events
    FROM events
    WHERE user_id <= 20
    ORDER BY event_id
    """,
)
def sliding_hour_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time RANGE window frame: per event, the trailing-hour sum and
    count for that user — a range frame over epoch seconds, not a row
    frame, so simultaneous events share a frame."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") <= 20)
    w = (
        W.partitionBy("user_id")
        .orderBy(F.floor(F.col("ts").cast("double")).cast("long"))
        .rangeBetween(-3600, 0)
    )
    return (
        e.select(
            "event_id",
            "user_id",
            rnd(F.sum("value").over(w), 4).alias("hour_value"),
            F.count("*").over(w).alias("hour_events"),
        )
        .orderBy("event_id")
    )


# ---------------------------------------------- B24: fuzzy string matching


@register(
    "fuzzy_name_match",
    oracle="""
    SELECT c_custkey, c_name,
           levenshtein(c_name, 'Customer#000000042') AS edit_dist
    FROM customer
    WHERE levenshtein(c_name, 'Customer#000000042') <= 2
    ORDER BY edit_dist, c_custkey
    """,
)
def fuzzy_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance fuzzy matching (entity-resolution building block)."""
    c = load_table(spark, sf_dir, "customer")
    dist = F.levenshtein(F.col("c_name"), F.lit("Customer#000000042"))
    return (
        c.select("c_custkey", "c_name", dist.alias("edit_dist"))
        .filter(F.col("edit_dist") <= 2)
        .orderBy("edit_dist", "c_custkey")
    )


# ------------------------------------------------- B20: funnel conversion


@register(
    "funnel_conversion",
    oracle="""
    WITH steps AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view'
                      THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS t_view,
             min(CASE WHEN event_type = 'click'
                      THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS t_click,
             min(CASE WHEN event_type = 'purchase'
                      THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS t_purchase
      FROM events GROUP BY user_id
    )
    SELECT count(*) AS n_users,
           CAST(sum(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS step_view,
           CAST(sum(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                    THEN 1 ELSE 0 END) AS BIGINT) AS step_click,
           CAST(sum(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                    AND t_purchase > t_click THEN 1 ELSE 0 END) AS BIGINT) AS step_purchase
    FROM steps
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view→click→purchase: per-user earliest step times in
    one conditional aggregation (no self-joins), then ordered-progression
    counts. One shuffle on user_id."""
    e = load_table(spark, sf_dir, "events")
    first = F.min
    steps = e.groupBy("user_id").agg(
        first(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        first(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        first(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_purchase"),
    )
    reached_view = F.col("t_view").isNotNull()
    reached_click = reached_view & (F.col("t_click") > F.col("t_view"))
    reached_purchase = reached_click & (F.col("t_purchase") > F.col("t_click"))
    return steps.agg(
        F.count("*").alias("n_users"),
        F.sum(reached_view.cast("int")).alias("step_view"),
        F.sum(reached_click.cast("int")).alias("step_click"),
        F.sum(reached_purchase.cast("int")).alias("step_purchase"),
    )


# ------------------------------------------------- B21: retention cohorts


@register(
    "retention_cohorts",
    oracle="""
    WITH firsts AS (
      SELECT user_id, min(time_bucket(INTERVAL 1 DAY, ts)) AS cohort_day
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT e.user_id, f.cohort_day,
             date_diff('day', f.cohort_day, time_bucket(INTERVAL 1 DAY, e.ts))
               AS day_offset
      FROM events e JOIN firsts f ON e.user_id = f.user_id
    )
    SELECT cohort_day, day_offset, count(*) AS n_active
    FROM activity
    WHERE day_offset <= 7
    GROUP BY cohort_day, day_offset
    ORDER BY cohort_day, day_offset
    """,
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-cohort retention: users grouped by first-seen day, counted
    on each subsequent active day (first week).

    Join strategy: NO broadcast hint — `firsts` has one row per user and
    grows linearly with the data (an unbounded broadcast would OOM at
    scale). Both sides are keyed on user_id, so the shuffle from the
    groupBy is reused by the sort-merge join; AQE still picks a broadcast
    at small SFs where firsts is actually tiny."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("day", "ts").alias("day")
    )
    firsts = e.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        e.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff(F.col("day"), F.col("cohort_day")).alias("day_offset"),
        )
        .filter(F.col("day_offset") <= 7)
        .distinct()
        .groupBy("cohort_day", "day_offset")
        .agg(F.count("*").alias("n_active"))
        .orderBy("cohort_day", "day_offset")
    )


# ------------------------------------------------- B13: stream window parity


def _register_stream_window():
    from danae_spark.queries import register
    from danae_spark.streaming import events as sev

    @register("stream_window_counts", oracle=sev.WINDOWED_COUNTS_ORACLE)
    def stream_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Batch-parity version of the streaming tumbling-window rollup
        (danae_spark/streaming/events.py:windowed_counts); identical
        grouping logic runs under readStream with a watermark."""
        return sev.windowed_counts_batch(spark, sf_dir)


_register_stream_window()


# ---------------------------------------------------------------- B12: JSON extraction


@register(
    "json_extract_events",
    oracle="""
    SELECT event_type,
           floor((avg(CAST(json_extract_string(props, '$.k') AS DOUBLE))) * power(10, 4) + 0.5001) / power(10, 4) AS avg_k,
           max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
           count(*) AS n
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return (
        e.groupBy("event_type")
        .agg(
            rnd(F.avg(k.cast("double")), 4).alias("avg_k"),
            F.max(k.cast("bigint")).alias("max_k"),
            F.count("*").alias("n"),
        )
        .orderBy("event_type")
    )
