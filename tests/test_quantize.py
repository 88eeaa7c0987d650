"""Int8 embedding quantization: reconstruction quality, code-domain
cosine fidelity vs the float baseline, and strict oracle parity
(via tools/check_oracle.py-equivalent compare in the registered entry —
swept by tests/test_oracle_types.py; value parity checked here)."""

from __future__ import annotations

import pyspark.sql.functions as F

from danae_spark.operators import ann, quantize


def test_codes_shape_and_reconstruction(spark, sf_dir):
    q8 = quantize.quantize_embeddings(spark, sf_dir)
    assert dict(q8.dtypes)["codes"] == "array<tinyint>"
    row = q8.select(
        "codes", "scale",
        F.array_max(F.transform("codes", lambda c: F.abs(c.cast("int")))).alias("amax"),
    ).first()
    assert row.amax <= 127
    # reconstruction error bounded by scale/2 per component
    recon = quantize.dequantize(F.col("codes"), F.col("scale"))
    err = (
        quantize.quantize_embeddings(spark, sf_dir)
        .join(
            spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
                "vec_id", "embedding"
            ),
            "vec_id",
        )
        .select(
            F.array_max(
                F.zip_with(
                    recon, "embedding",
                    lambda r, o: F.abs(r - o.cast("double")) / F.col("scale"),
                )
            ).alias("e")
        )
        .agg(F.max("e"))
        .first()[0]
    )
    assert err <= 0.5 + 1e-9


def test_quantized_cosine_close_to_float(spark, sf_dir):
    """Top-k on int8 codes ranks nearly identically to the float
    baseline: per-pair cosine within 0.02, top-k overlap high."""
    truth = {
        (r.query_id, r.cand_id): r.cosine
        for r in ann.ann_cosine_topk(spark, sf_dir, k=5).collect()
    }
    quant = {
        (r.query_id, r.cand_id): r.qcosine
        for r in quantize.quantized_ann_topk(spark, sf_dir, k=5).collect()
    }
    overlap = len(set(truth) & set(quant)) / len(truth)
    assert overlap >= 0.7, overlap
    for key in set(truth) & set(quant):
        assert abs(truth[key] - quant[key]) < 0.02


def test_quantized_ann_matches_duckdb_oracle(spark, sf_dir):
    import duckdb

    from danae_spark.catalog import TABLES, table_path

    df = quantize.quantized_ann_topk(spark, sf_dir)
    s_rows = sorted(
        (r.query_id, r.cand_id, repr(r.qcosine), r.rank) for r in df.collect()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{table_path(sf_dir, t)}'")
    d_rows = sorted(
        (a, b, repr(c), d)
        for a, b, c, d in con.execute(quantize.quantized_ann_oracle()).fetchall()
    )
    assert s_rows == d_rows
