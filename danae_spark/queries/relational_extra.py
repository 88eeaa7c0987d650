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


EXTRA_QUERIES = {
    "q7_nation_volume": q7_nation_volume,
    "q15_top_supplier": q15_top_supplier,
    "q17_small_quantity": q17_small_quantity,
    "q19_disjunctive": q19_disjunctive,
    "q22_global_sales": q22_global_sales,
}
