"""Cross-engine parity fuzzing: the primitives every oracle relies on
(tokenization regex, canonical rounding, md5-prefix hashing) must agree
between Spark and DuckDB on adversarial inputs — not just on the
testdata distribution."""

from __future__ import annotations

import math
import random

import duckdb
import pytest

from pyspark.sql import functions as F

from danae_spark.functions.rounding import rnd


def _fuzz_strings(n=300):
    rng = random.Random(7)
    alphabet = "abc XYZ 012.,;:!?-_#@\t\né中 "
    out = ["", " ", "a", "...", "a b  c", "1a2b", "中文 text"]
    while len(out) < n:
        out.append("".join(rng.choice(alphabet) for _ in range(rng.randint(1, 40))))
    return out


def test_tokenizer_parity_fuzz(spark):
    strings = _fuzz_strings()
    sdf = spark.createDataFrame([(i, s) for i, s in enumerate(strings)], "id int, s string")
    spark_toks = {
        r["id"]: r["toks"]
        for r in sdf.select(
            "id",
            F.expr("filter(split(lower(s), '[^a-z0-9]+'), t -> t <> '')").alias("toks"),
        ).collect()
    }
    con = duckdb.connect()
    duck_toks = {}
    for i, s in enumerate(strings):
        (toks,) = con.execute(
            "SELECT list_filter(string_split_regex(lower(?), '[^a-z0-9]+'), t -> t <> '')",
            [s],
        ).fetchone()
        duck_toks[i] = toks
    assert spark_toks == duck_toks


def test_rounding_parity_fuzz(spark):
    rng = random.Random(11)
    # adversarial values: exact decimal ties at every rounding digit
    values = [307843.595, 0.5, -0.5, 2.675, 1.0005, 0.1063835, -17.025]
    values += [round(rng.uniform(-1e6, 1e6), rng.randint(0, 6)) for _ in range(200)]
    for d in (2, 4, 6):
        sdf = spark.createDataFrame([(i, v) for i, v in enumerate(values)], "id int, v double")
        s_out = {
            r["id"]: r["r"] for r in sdf.select("id", rnd(F.col("v"), d).alias("r")).collect()
        }
        con = duckdb.connect()
        scale = float(10**d)
        d_out = {}
        for i, v in enumerate(values):
            (r,) = con.execute(
                f"SELECT floor(? * {scale} + 0.5001) / {scale}", [v]
            ).fetchone()
            d_out[i] = r
        for i in s_out:
            assert s_out[i] == d_out[i] or (
                math.isnan(s_out[i]) and math.isnan(d_out[i])
            ), (i, values[i], d, s_out[i], d_out[i])


def test_dmoment_sum_parity_fuzz(spark):
    """Dual-regime moment sums (fine scale-12 / coarse scale-(12-3p),
    selected by max|v|) agree bit-for-bit between Spark and DuckDB on
    adversarial column mixes: values straddling the MOMENT_SPLIT=100
    boundary, all-fine, all-coarse, negatives, and tiny fractions."""
    from danae_spark.functions.rounding import dmoment_sum, dmoment_sum_sql

    rng = random.Random(23)
    columns = {
        "fine_only": [rng.uniform(-99.9, 99.9) for _ in range(300)],
        "coarse_only": [rng.uniform(100.5, 9e5) for _ in range(300)],
        "straddle": [rng.choice([rng.uniform(0, 99), rng.uniform(100, 1e5)]) for _ in range(300)],
        "boundary": [99.999999, 100.0, 100.000001, -100.0, -99.999999] * 10,
        "fractions": [rng.uniform(-0.11, 0.11) for _ in range(300)],
    }
    con = duckdb.connect()
    for name, vals in columns.items():
        sdf = spark.createDataFrame([(v,) for v in vals], "v double")
        con.execute("DROP TABLE IF EXISTS t")
        con.execute("CREATE TABLE t(v DOUBLE)")
        con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
        for p in (1, 2, 3, 4):
            (s_val,) = sdf.agg(dmoment_sum(F.col("v"), p)).collect()[0]
            (d_val,) = con.execute(
                f"SELECT {dmoment_sum_sql('v', p)} FROM t"
            ).fetchone()
            assert s_val == d_val, (name, p, s_val, d_val)


def test_md5_prefix_hash_parity_fuzz(spark):
    strings = [s for s in _fuzz_strings(100) if s]
    sdf = spark.createDataFrame([(i, s) for i, s in enumerate(strings)], "id int, s string")
    s_out = {
        r["id"]: r["h"]
        for r in sdf.select(
            "id",
            F.conv(F.substring(F.md5("s"), 1, 8), 16, 10).cast("long").alias("h"),
        ).collect()
    }
    con = duckdb.connect()
    for i, s in enumerate(strings):
        (h,) = con.execute("SELECT ('0x' || substr(md5(?), 1, 8))::BIGINT", [s]).fetchone()
        assert s_out[i] == h, (s, s_out[i], h)


def test_spark_direct_cast_equals_string_route(spark):
    """moment_dec/dec_to_double use Spark's DIRECT casts (r7: ~15% of
    the exact profile's materialized cost was the explicit string
    detour). That is sound ONLY because Spark's double→decimal cast
    itself routes through Double.toString + HALF_UP — the same
    semantics as the string detour. If a Spark upgrade ever changes
    Cast to round the binary value (DuckDB-style), engine parity
    breaks silently everywhere; this fuzz fails loudly instead."""
    from pyspark.sql import functions as F

    df = spark.range(0, 2_000_000).select(
        (
            F.rand(seed=42)
            * F.pow(F.lit(10.0), (F.rand(seed=43) * 30 - 15))
            * F.when(F.col("id") % 2 == 0, -1.0).otherwise(1.0)
        ).alias("v")
    )
    checks = []
    for scale in (0, 6, 12):
        direct = F.col("v").cast(f"decimal(38,{scale})")
        via_str = F.col("v").cast("string").cast(f"decimal(38,{scale})")
        checks.append(F.sum((~direct.eqNullSafe(via_str)).cast("long")))
    dec = F.col("v").cast("decimal(38,12)")
    checks.append(
        F.sum((~dec.cast("double").eqNullSafe(dec.cast("string").cast("double"))).cast("long"))
    )
    diffs = df.select(*[c.alias(f"c{i}") for i, c in enumerate(checks)]).head()
    assert all(d == 0 for d in diffs), tuple(diffs)

    # crafted half-up ties at the scale boundary
    ties = spark.createDataFrame(
        [(0.0000000000905,), (1.0000000000125,), (9.9999999999995,),
         (2.5,), (0.0015,), (122.0005,)],
        "v double",
    )
    for scale in (0, 3, 12):
        direct = F.col("v").cast(f"decimal(38,{scale})")
        via_str = F.col("v").cast("string").cast(f"decimal(38,{scale})")
        bad = ties.filter(~direct.eqNullSafe(via_str)).count()
        assert bad == 0, f"scale {scale}"
