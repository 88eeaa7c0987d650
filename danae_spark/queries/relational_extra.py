"""Extra TPC-H analogues (engine-completeness set).

These are NOT in the driver registry — the external gate records only
50 entries and all 50 slots carry the SURVEY §2 core — but they are
verified by the same strict Spark-vs-DuckDB oracle comparison in
tests/test_tpch_extra.py, so the engine's join/agg/subquery machinery is
proven on the wider TPC-H surface too. Queries are adapted to the lake
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


def q7_nation_volume(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, str]:
    """TPC-H Q7: shipping volume between two nations by year (customer
    nation ↔ supplier nation), both directions. Facts shuffle once on
    their join keys; all dims broadcast."""
    n1, n2 = "NATION_18", "NATION_19"  # testdata nations are NATION_0..24
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
    oracle = f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           year(l.l_shipdate) AS l_year,
           {rnd_sql(dsum_sql('l.l_extendedprice * (1 - l.l_discount)'), 2)} AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
    JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
    WHERE (cn.n_name = '{n1}' AND sn.n_name = '{n2}')
       OR (cn.n_name = '{n2}' AND sn.n_name = '{n1}')
    GROUP BY sn.n_name, cn.n_name, year(l.l_shipdate)
    ORDER BY supp_nation, cust_nation, l_year
    """
    return df, oracle


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, str]:
    """TPC-H Q15: supplier(s) with the maximum quarterly revenue — the
    revenue view + max via a window (no second scan of the view)."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier")
    rev = (
        l.groupBy("l_suppkey")
        .agg(rnd(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("total_revenue"))
    )
    wall = W.partitionBy()
    df = (
        rev.withColumn("max_rev", F.max("total_revenue").over(wall))
        .filter(F.col("total_revenue") == F.col("max_rev"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )
    oracle = f"""
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
    return df, oracle


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
    oracle = f"""
    SELECT {rnd_sql(dsum_sql('l.l_extendedprice') + ' / 7.0', 2)} AS avg_yearly,
           count(*) AS n_lines
    FROM lineitem l
    JOIN (SELECT l_partkey, avg(l_quantity) AS avg_qty FROM lineitem GROUP BY l_partkey) a
      ON l.l_partkey = a.l_partkey
    WHERE l.l_quantity < 0.2 * a.avg_qty
    """
    return df, oracle


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
    oracle = f"""
    SELECT {rnd_sql(dsum_sql('l.l_extendedprice * (1 - l.l_discount)'), 2)} AS revenue,
           count(*) AS n_lines
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_type LIKE 'PROMO%'    AND p.p_size <= 10 AND l.l_quantity BETWEEN 1  AND 11)
       OR (p.p_type LIKE 'STANDARD%' AND p.p_size <= 20 AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_type LIKE 'ECONOMY%'  AND p.p_size <= 30 AND l.l_quantity BETWEEN 20 AND 30)
    """
    return df, oracle


def q22_global_sales(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, str]:
    """TPC-H Q22: customers with above-average positive balance and no
    RECENT orders (every testdata customer has some order, so the
    anti-join runs against the last-period orders — same plan shape:
    scalar-subquery average + anti-join + group by a name-derived code)."""
    cutoff = "2001-01-01"
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
    oracle = f"""
    SELECT substr(c_name, length(c_name) - 1, 2) AS code,
           count(*) AS numcust,
           {rnd_sql(dsum_sql('c_acctbal'), 2)} AS totacctbal
    FROM customer c
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderdate >= TIMESTAMP '{cutoff} 00:00:00')
    GROUP BY substr(c_name, length(c_name) - 1, 2)
    ORDER BY code
    """
    return df, oracle


def q8_market_share(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, str]:
    """TPC-H Q8: a nation's market share of PROMO-part volume inside one
    region by order year — the widest join in the suite (7 tables:
    lineitem·part·orders·customer·nation·region·supplier·nation). Facts
    shuffle once on their join keys; every dim broadcasts; the share is
    a conditional-sum / sum ratio over exact decimal sums."""
    nation, region = "NATION_5", "ASIA"
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
    num = dsum_sql(
        f"CASE WHEN sn.n_name = '{nation}' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0.0 END"
    )
    den = dsum_sql("l.l_extendedprice * (1 - l.l_discount)")
    oracle = f"""
    SELECT year(o.o_orderdate) AS o_year,
           {rnd_sql(f"({num} / {den})", 6)} AS mkt_share
    FROM lineitem l
    JOIN part p     ON l.l_partkey = p.p_partkey AND p.p_type = 'PROMO'
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
    JOIN region r   ON cn.n_regionkey = r.r_regionkey AND r.r_name = '{region}'
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
    GROUP BY year(o.o_orderdate)
    ORDER BY o_year
    """
    return df, oracle


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
    oracle = """
    SELECT CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate) > 90
                THEN 'SLOW' ELSE 'FAST' END AS ship_class,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1 ORDER BY ship_class
    """
    return df, oracle


def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, str]:
    """TPC-H Q21 analogue (suppliers who kept orders waiting): the lake
    lineitem has no commit/receipt dates, so the blocker condition is
    'this supplier's line shipped strictly later than every other
    supplier's line in a multi-supplier order'. Keeps Q21's signature
    shape — correlated EXISTS + NOT EXISTS against the same fact —
    expressed as one left-semi and one left-anti hash join on
    l_orderkey with residual non-equi conditions."""
    nation = "NATION_3"
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
    oracle = f"""
    SELECT s.s_name, count(*) AS numwait
    FROM lineitem l1
    JOIN supplier s ON l1.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey AND n.n_name = '{nation}'
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
    return df, oracle


EXTRA_QUERIES = {
    "q7_nation_volume": q7_nation_volume,
    "q8_market_share": q8_market_share,
    "q12_late_shipping": q12_late_shipping,
    "q15_top_supplier": q15_top_supplier,
    "q17_small_quantity": q17_small_quantity,
    "q19_disjunctive": q19_disjunctive,
    "q21_waiting_supplier": q21_waiting_supplier,
    "q22_global_sales": q22_global_sales,
}
