"""Extra TPC-H analogues (engine-completeness set).

Registered in the driver registry via ``relational_extra_reg`` at
post-50 positions (the external gate records verdicts for the FIRST 50
entries, which all carry the SURVEY §2 core), and verified by the same
strict Spark-vs-DuckDB oracle comparison both in
tests/test_tpch_extra.py and under tools/check_oracle.py's full-registry
sweep, so the engine's join/agg/subquery machinery is proven on the
wider TPC-H surface too. Queries are adapted to the lake
schema (no partsupp table; lineitem has no commitdate/receiptdate/
shipmode; part has no brand/container — predicates use the columns that
exist, keeping each query's PLAN SHAPE faithful to its TPC-H original).

Each function returns (DataFrame, oracle_sql).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from danae_spark.catalog import load_table
from danae_spark.functions.rounding import dsum, dsum_sql, rnd, rnd_sql

# Query parameters are module constants (not fn locals) so each oracle can
# be a module-level string too — the driver registry needs static oracle
# SQL at import time, while the DataFrame side still needs a live session.
Q7_N1, Q7_N2 = "NATION_18", "NATION_19"  # testdata nations are NATION_0..24
Q22_CUTOFF = "2001-01-01"
Q8_NATION, Q8_REGION = "NATION_5", "ASIA"
Q21_NATION = "NATION_3"
Q2_REGION, Q2_SIZE = "ASIA", 25
Q11_NATION, Q11_MULT = "NATION_8", 2.0
Q16_EX_BRAND, Q16_SIZES = "Brand#1", (1, 7, 13, 19, 25, 31, 37, 43)
Q20_NATION, Q20_PATTERN, Q20_YEAR, Q20_MIN_QTY = "NATION_8", "red%", 1995, 10


def q7_nation_volume(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, str]:
    """TPC-H Q7: shipping volume between two nations by year (customer
    nation ↔ supplier nation), both directions. Facts shuffle once on
    their join keys; all dims broadcast."""
    n1, n2 = Q7_N1, Q7_N2
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    cn = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    sn = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    df = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(cn), c.c_nationkey == F.col("c_nk"))
        .join(F.broadcast(sn), s.s_nationkey == F.col("s_nk"))
        .filter(
            ((F.col("cust_nation") == n1) & (F.col("supp_nation") == n2))
            | ((F.col("cust_nation") == n2) & (F.col("supp_nation") == n1))
        )
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            rnd(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )
    return df, Q7_ORACLE


Q7_ORACLE = f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           year(l.l_shipdate) AS l_year,
           {rnd_sql(dsum_sql('l.l_extendedprice * (1 - l.l_discount)'), 2)} AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
    JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
    WHERE (cn.n_name = '{Q7_N1}' AND sn.n_name = '{Q7_N2}')
       OR (cn.n_name = '{Q7_N2}' AND sn.n_name = '{Q7_N1}')
    GROUP BY sn.n_name, cn.n_name, year(l.l_shipdate)
    ORDER BY supp_nation, cust_nation, l_year
    """


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, str]:
    """TPC-H Q15: supplier(s) with the maximum quarterly revenue — the
    revenue view + max via a broadcast scalar (the shared groupBy
    exchange is reused across both branches — no second scan)."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier")
    rev = (
        l.groupBy("l_suppkey")
        .agg(rnd(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("total_revenue"))
    )
    # global-max via a broadcast scalar (map-side-partial agg + 1-row
    # join; the groupBy exchange is reused across both branches) — not
    # a window over an empty partitioning, which would move every
    # supplier row to one partition (r16 perf nit).
    max_rev = rev.agg(F.max("total_revenue").alias("max_rev"))
    df = (
        rev.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_rev"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )
    return df, Q15_ORACLE


Q15_ORACLE = f"""
    WITH rev AS (
      SELECT l_suppkey,
             {rnd_sql(dsum_sql('l_extendedprice * (1 - l_discount)'), 2)} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
    ORDER BY s.s_suppkey
    """


def q17_small_quantity(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, str]:
    """TPC-H Q17: revenue of lines whose quantity is below 20% of their
    part's average quantity (correlated-aggregate pattern → per-part
    pre-aggregation joined back; one shuffle on partkey)."""
    l = load_table(spark, sf_dir, "lineitem")
    avg_qty = l.groupBy(F.col("l_partkey").alias("ak")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    df = (
        l.join(avg_qty, l.l_partkey == F.col("ak"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            rnd(dsum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count("*").alias("n_lines"),
        )
    )
    return df, Q17_ORACLE


Q17_ORACLE = f"""
    SELECT {rnd_sql(dsum_sql('l.l_extendedprice') + ' / 7.0', 2)} AS avg_yearly,
           count(*) AS n_lines
    FROM lineitem l
    JOIN (SELECT l_partkey, avg(l_quantity) AS avg_qty FROM lineitem GROUP BY l_partkey) a
      ON l.l_partkey = a.l_partkey
    WHERE l.l_quantity < 0.2 * a.avg_qty
    """


def q19_disjunctive(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, str]:
    """TPC-H Q19: OR-of-ANDs disjunctive predicates over the part join
    (brand/container adapted to p_type/p_size). The disjunction stays a
    residual on ONE hash join — not a union of three scans."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    joined = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    cond = (
        (F.col("p_type").startswith("PROMO") & (F.col("p_size") <= 10) & (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 11))
        | (F.col("p_type").startswith("STANDARD") & (F.col("p_size") <= 20) & (F.col("l_quantity") >= 10) & (F.col("l_quantity") <= 20))
        | (F.col("p_type").startswith("ECONOMY") & (F.col("p_size") <= 30) & (F.col("l_quantity") >= 20) & (F.col("l_quantity") <= 30))
    )
    df = joined.filter(cond).agg(
        rnd(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
        F.count("*").alias("n_lines"),
    )
    return df, Q19_ORACLE


Q19_ORACLE = f"""
    SELECT {rnd_sql(dsum_sql('l.l_extendedprice * (1 - l.l_discount)'), 2)} AS revenue,
           count(*) AS n_lines
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_type LIKE 'PROMO%'    AND p.p_size <= 10 AND l.l_quantity BETWEEN 1  AND 11)
       OR (p.p_type LIKE 'STANDARD%' AND p.p_size <= 20 AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_type LIKE 'ECONOMY%'  AND p.p_size <= 30 AND l.l_quantity BETWEEN 20 AND 30)
    """


def q22_global_sales(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, str]:
    """TPC-H Q22: customers with above-average positive balance and no
    RECENT orders (every testdata customer has some order, so the
    anti-join runs against the last-period orders — same plan shape:
    scalar-subquery average + anti-join + group by a name-derived code)."""
    cutoff = Q22_CUTOFF
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit(cutoff).cast("timestamp")
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    code = F.expr("substr(c_name, length(c_name) - 1, 2)")
    df = (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(code.alias("code"))
        .agg(
            F.count("*").alias("numcust"),
            rnd(dsum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("code")
    )
    return df, Q22_ORACLE


Q22_ORACLE = f"""
    SELECT substr(c_name, length(c_name) - 1, 2) AS code,
           count(*) AS numcust,
           {rnd_sql(dsum_sql('c_acctbal'), 2)} AS totacctbal
    FROM customer c
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderdate >= TIMESTAMP '{Q22_CUTOFF} 00:00:00')
    GROUP BY substr(c_name, length(c_name) - 1, 2)
    ORDER BY code
    """


def q8_market_share(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, str]:
    """TPC-H Q8: a nation's market share of PROMO-part volume inside one
    region by order year — the widest join in the suite (7 tables:
    lineitem·part·orders·customer·nation·region·supplier·nation). Facts
    shuffle once on their join keys; every dim broadcasts; the share is
    a conditional-sum / sum ratio over exact decimal sums."""
    nation, region = Q8_NATION, Q8_REGION
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == region)
    cn = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        F.col("n_nationkey").alias("c_nk")
    )
    sn = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    df = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), c.c_nationkey == F.col("c_nk"))
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), s.s_nationkey == F.col("s_nk"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            rnd(
                dsum(F.when(F.col("supp_nation") == nation, vol).otherwise(F.lit(0.0)))
                / dsum(vol),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )
    return df, Q8_ORACLE


_Q8_NUM = dsum_sql(
    f"CASE WHEN sn.n_name = '{Q8_NATION}' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0.0 END"
)
_Q8_DEN = dsum_sql("l.l_extendedprice * (1 - l.l_discount)")
Q8_ORACLE = f"""
    SELECT year(o.o_orderdate) AS o_year,
           {rnd_sql(f"({_Q8_NUM} / {_Q8_DEN})", 6)} AS mkt_share
    FROM lineitem l
    JOIN part p     ON l.l_partkey = p.p_partkey AND p.p_type = 'PROMO'
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
    JOIN region r   ON cn.n_regionkey = r.r_regionkey AND r.r_name = '{Q8_REGION}'
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
    GROUP BY year(o.o_orderdate)
    ORDER BY o_year
    """


def q12_late_shipping(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, str]:
    """TPC-H Q12 analogue: the lake lineitem has no shipmode/commit/
    receipt dates, so the 'late shipping' class derives from
    shipdate − orderdate (> 90 days = SLOW), keeping Q12's plan shape:
    one fact join + CASE-bucketed conditional counts per class."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    cls = F.when(delay > 90, F.lit("SLOW")).otherwise(F.lit("FAST"))
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    df = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(cls.alias("ship_class"))
        .agg(
            F.sum(hi.cast("long")).alias("high_line_count"),
            F.sum((~hi).cast("long")).alias("low_line_count"),
        )
        .orderBy("ship_class")
    )
    return df, Q12_ORACLE


Q12_ORACLE = """
    SELECT CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate) > 90
                THEN 'SLOW' ELSE 'FAST' END AS ship_class,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1 ORDER BY ship_class
    """


def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, str]:
    """TPC-H Q21 analogue (suppliers who kept orders waiting): the lake
    lineitem has no commit/receipt dates, so the blocker condition is
    'this supplier's line shipped strictly later than every other
    supplier's line in a multi-supplier order'. Keeps Q21's signature
    shape — correlated EXISTS + NOT EXISTS against the same fact —
    expressed as one left-semi and one left-anti hash join on
    l_orderkey with residual non-equi conditions."""
    nation = Q21_NATION
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == nation)
    others = l.select(
        F.col("l_orderkey").alias("o_ok"),
        F.col("l_suppkey").alias("o_sk"),
        F.col("l_shipdate").alias("o_ship"),
    )
    l1 = (
        l.join(
            others,
            (F.col("l_orderkey") == F.col("o_ok")) & (F.col("l_suppkey") != F.col("o_sk")),
            "left_semi",
        )
        .join(
            others,
            (F.col("l_orderkey") == F.col("o_ok"))
            & (F.col("l_suppkey") != F.col("o_sk"))
            & (F.col("o_ship") > F.col("l_shipdate")),
            "left_anti",
        )
    )
    df = (
        l1.join(F.broadcast(s), l1.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )
    return df, Q21_ORACLE


Q21_ORACLE = f"""
    SELECT s.s_name, count(*) AS numwait
    FROM lineitem l1
    JOIN supplier s ON l1.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey AND n.n_name = '{Q21_NATION}'
    WHERE EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > l1.l_shipdate)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, str]:
    """TPC-H Q2 analogue (minimum-cost supplier): the lake has no
    partsupp, so the supply relation derives from lineitem — supplier s
    supplies part p at unit cost min(l_extendedprice / l_quantity).
    Keeps Q2's signature shape: a correlated `cost = min(cost) per
    part` subquery (here a window-min over the supply aggregate — one
    shuffle on partkey, no second scan), part filtered by size/type,
    supplier joined through nation→region, ordered by account balance.
    Reference parity target: TPC-H Q2 plan shape on the lake schema."""
    region, size = Q2_REGION, Q2_SIZE
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") == size) & (F.col("p_type") == "PROMO")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == region)
    rn = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        F.col("n_nationkey").alias("nk"), F.col("n_name").alias("n_name")
    )
    supply = (
        l.groupBy(F.col("l_partkey").alias("ps_partkey"), F.col("l_suppkey").alias("ps_suppkey"))
        .agg(rnd(F.min(F.col("l_extendedprice") / F.col("l_quantity")), 4).alias("ps_cost"))
    )
    eligible = (
        supply.join(F.broadcast(s), F.col("ps_suppkey") == s.s_suppkey)
        .join(F.broadcast(rn), s.s_nationkey == F.col("nk"))
    )
    wmin = W.partitionBy("ps_partkey")
    df = (
        eligible.withColumn("min_cost", F.min("ps_cost").over(wmin))
        .filter(F.col("ps_cost") == F.col("min_cost"))
        .join(F.broadcast(p), F.col("ps_partkey") == p.p_partkey)
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_type", "ps_cost"
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )
    return df, Q2_ORACLE


Q2_ORACLE = f"""
    WITH supply AS (
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             {rnd_sql('min(l_extendedprice / l_quantity)', 4)} AS ps_cost
      FROM lineitem GROUP BY 1, 2
    ), eligible AS (
      SELECT ps.*, s.s_acctbal, s.s_name, n.n_name
      FROM supply ps
      JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      JOIN region r   ON n.n_regionkey = r.r_regionkey AND r.r_name = '{Q2_REGION}'
    )
    SELECT e.s_acctbal, e.s_name, e.n_name, p.p_partkey, p.p_type, e.ps_cost
    FROM eligible e
    JOIN part p ON e.ps_partkey = p.p_partkey
               AND p.p_size = {Q2_SIZE} AND p.p_type = 'PROMO'
    WHERE e.ps_cost = (SELECT min(e2.ps_cost) FROM eligible e2
                       WHERE e2.ps_partkey = e.ps_partkey)
    ORDER BY e.s_acctbal DESC, e.n_name, e.s_name, p.p_partkey
    LIMIT 100
    """


def q9_product_profit(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, str]:
    """TPC-H Q9 analogue (product-type profit by nation and year): the
    lake has no ps_supplycost, so cost per line is the deterministic
    stand-in 0.6 · p_retailprice · l_quantity. Keeps Q9's plan shape —
    lineitem joined to part (filtered by name pattern), orders,
    supplier, nation; profit grouped by (supp nation, order year). The
    fact shuffles once on its join keys; all dims broadcast."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(0.6) * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    df = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(rnd(dsum(amount), 2).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )
    return df, Q9_ORACLE


_Q9_AMT = (
    "l.l_extendedprice * (1 - l.l_discount)"
    " - 0.6 * p.p_retailprice * l.l_quantity"
)
Q9_ORACLE = f"""
    SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
           {rnd_sql(dsum_sql(_Q9_AMT), 2)} AS sum_profit
    FROM lineitem l
    JOIN part p     ON l.l_partkey = p.p_partkey AND p.p_name LIKE '%red%'
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name, year(o.o_orderdate)
    ORDER BY nation, o_year DESC
    """


def q11_important_stock(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, str]:
    """TPC-H Q11 analogue (important stock identification): part value
    held by one nation's suppliers — Σ l_extendedprice·(1−l_discount)
    per part — kept when it exceeds FRACTION of the nation's total.
    Keeps Q11's signature shape: GROUP BY + HAVING against a global
    scalar aggregate of the same relation. The scalar is a broadcast
    1-row aggregate joined back (one shuffle on partkey; the groupBy
    exchange is reused, so no second scan and no single-partition
    window stage). TPC-H's
    sum-share cut (0.0001/SF) is scale-DEPENDENT, so the analogue keeps
    parts above MULT× the mean part value — same shape, SF-stable."""
    nation, mult = Q11_NATION, Q11_MULT
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == nation)
    val = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_part = (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("l_partkey").alias("ps_partkey"))
        .agg(rnd(dsum(val), 2).alias("part_value"))
    )
    # global mean via a broadcast scalar instead of a window over an
    # empty partitioning (r16 perf nit): part_value is a 2dp double —
    # aggregate exactly in decimal so the scalar is partition-order
    # independent (double summation could flip a borderline HAVING).
    mean = per_part.agg(
        (
            F.sum(F.col("part_value").cast("decimal(28,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_value")
    )
    df = (
        per_part.crossJoin(F.broadcast(mean))
        .filter(F.col("part_value") > F.lit(mult) * F.col("avg_value"))
        .select("ps_partkey", "part_value")
        .orderBy(F.desc("part_value"), "ps_partkey")
    )
    return df, Q11_ORACLE


Q11_ORACLE = f"""
    WITH per_part AS (
      SELECT l.l_partkey AS ps_partkey,
             {rnd_sql(dsum_sql('l.l_extendedprice * (1 - l.l_discount)'), 2)} AS part_value
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey AND n.n_name = '{Q11_NATION}'
      GROUP BY l.l_partkey
    )
    SELECT ps_partkey, part_value
    FROM per_part
    WHERE part_value > {Q11_MULT} * (SELECT CAST(sum(CAST(part_value AS DECIMAL(28,6))) AS DOUBLE) / count(*) FROM per_part)
    ORDER BY part_value DESC, ps_partkey
    """


def q16_supplier_relationship(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, str]:
    """TPC-H Q16 analogue (parts/supplier relationship count): distinct
    suppliers per (brand, type, size) bucket, for parts NOT of an
    excluded brand/type, excluding 'complaint' suppliers (stand-in:
    negative account balance — the lake has no comment text). Keeps
    Q16's shape: supply relation distinct-joined to part, NOT-IN
    supplier subquery (broadcast anti-join), count(DISTINCT suppkey)."""
    ex_brand, sizes = Q16_EX_BRAND, Q16_SIZES
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != ex_brand)
        & (~F.col("p_type").startswith("PROMO"))
        & (F.col("p_size").isin(*sizes))
    )
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0)
    supply = l.select(
        F.col("l_partkey").alias("ps_partkey"), F.col("l_suppkey").alias("ps_suppkey")
    ).distinct()
    df = (
        supply.join(F.broadcast(p), F.col("ps_partkey") == p.p_partkey)
        .join(
            F.broadcast(bad),
            F.col("ps_suppkey") == bad.s_suppkey,
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )
    return df, Q16_ORACLE


_Q16_SIZES_SQL = ", ".join(str(x) for x in Q16_SIZES)
Q16_ORACLE = f"""
    WITH supply AS (
      SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
      FROM lineitem
    )
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT ps.ps_suppkey) AS supplier_cnt
    FROM supply ps
    JOIN part p ON ps.ps_partkey = p.p_partkey
    WHERE p.p_brand <> '{Q16_EX_BRAND}'
      AND p.p_type NOT LIKE 'PROMO%'
      AND p.p_size IN ({_Q16_SIZES_SQL})
      AND ps.ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """


def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, str]:
    """TPC-H Q20 analogue (potential part promotion): suppliers in one
    nation who shipped a meaningful volume (> threshold units in one
    year) of parts matching a name pattern. The lake has no
    ps_availqty, so the inner 'availqty > ½ shipped' predicate becomes
    a shipped-quantity threshold on the same aggregate. Keeps Q20's
    signature shape: supplier ← semi-join ← (per-(supp,part) aggregate
    over a year, part-pattern semi-join) — two nested semi-joins, the
    part filter broadcast."""
    nation, pattern, year, min_qty = Q20_NATION, Q20_PATTERN, Q20_YEAR, Q20_MIN_QTY
    l = load_table(spark, sf_dir, "lineitem").filter(F.year("l_shipdate") == year)
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like(pattern))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == nation)
    shipped = (
        l.join(F.broadcast(p.select("p_partkey")), l.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > min_qty)
    )
    df = (
        s.join(
            shipped.select(F.col("l_suppkey").alias("sk")).distinct(),
            s.s_suppkey == F.col("sk"),
            "left_semi",
        )
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )
    return df, Q20_ORACLE


Q20_ORACLE = f"""
    SELECT s.s_name, s.s_acctbal
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey AND n.n_name = '{Q20_NATION}'
    WHERE s.s_suppkey IN (
      SELECT l.l_suppkey
      FROM lineitem l
      WHERE l.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '{Q20_PATTERN}')
        AND year(l.l_shipdate) = {Q20_YEAR}
      GROUP BY l.l_suppkey, l.l_partkey
      HAVING sum(l.l_quantity) > {Q20_MIN_QTY}
    )
    ORDER BY s.s_name
    """


EXTRA_QUERIES = {
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q9_product_profit": q9_product_profit,
    "q11_important_stock": q11_important_stock,
    "q16_supplier_relationship": q16_supplier_relationship,
    "q20_potential_promotion": q20_potential_promotion,
    "q7_nation_volume": q7_nation_volume,
    "q8_market_share": q8_market_share,
    "q12_late_shipping": q12_late_shipping,
    "q15_top_supplier": q15_top_supplier,
    "q17_small_quantity": q17_small_quantity,
    "q19_disjunctive": q19_disjunctive,
    "q21_waiting_supplier": q21_waiting_supplier,
    "q22_global_sales": q22_global_sales,
}

# Static oracle SQL per query (same strings the fns return) — consumed by
# the driver-registry delegates in relational_extra_reg, which need the
# oracle WITHOUT building the DataFrame side.
EXTRA_ORACLES = {
    "q2_min_cost_supplier": Q2_ORACLE,
    "q9_product_profit": Q9_ORACLE,
    "q11_important_stock": Q11_ORACLE,
    "q16_supplier_relationship": Q16_ORACLE,
    "q20_potential_promotion": Q20_ORACLE,
    "q7_nation_volume": Q7_ORACLE,
    "q8_market_share": Q8_ORACLE,
    "q12_late_shipping": Q12_ORACLE,
    "q15_top_supplier": Q15_ORACLE,
    "q17_small_quantity": Q17_ORACLE,
    "q19_disjunctive": Q19_ORACLE,
    "q21_waiting_supplier": Q21_ORACLE,
    "q22_global_sales": Q22_ORACLE,
}
